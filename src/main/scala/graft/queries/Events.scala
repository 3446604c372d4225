package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` stream table — the batch
  * equivalents of the streaming operators (tumbling windows, sessionization
  * by inactivity gap). The same aggregations run as Structured Streaming in
  * [[graft.streaming.EventStream]]; here they are batch + oracle-checked.
  *
  * Timestamps are emitted as formatted UTC strings so the oracle compare is
  * representation-stable (µs-truncated on both sides — see Tables).
  */
object Events {

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,4)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows per event type
    "q23_event_windows" -> ((s, dir) => {
      Tables(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }),

    // sessionization: 30-minute inactivity gap via lag()
    "q24_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gap = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
      Tables(s, dir, "events")
        .withColumn("new_session",
          when(gap.isNull || gap > lit(1800L * 1000000L), 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum("new_session").as("n_sessions"), count(lit(1)).as("n_events"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q23_event_windows" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q24_sessionize" ->
      """WITH g AS (SELECT user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - epoch_us(lag(CAST(ts AS TIMESTAMP), 1) OVER (
        |        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)) AS gap
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin)
}
