package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import graft.streaming.EventStream.Event
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming retention cohorts (the q98 dual): the aggregated increment
  * log equals the batch cohort matrix on the same events fed in
  * event-time order across a batch boundary, and each (user, offset)
  * credits exactly once even when redelivered weeks repeat.
  */
class RetentionStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val WeekMs = 7L * 24 * 3600 * 1000

  private def ts(week: Long, dayOffset: Long = 0): Timestamp =
    new Timestamp(week * WeekMs + dayOffset * 24 * 3600 * 1000)

  // user 1 active weeks 0,1,2 (twice in week 1); user 2 joins week 1,
  // returns week 2; user 3 appears once in week 0 and churns
  private val fixture = Seq(
    Event(0, ts(0), 1, "view", 1.0),
    Event(1, ts(0, 2), 3, "view", 1.0),
    Event(2, ts(1), 1, "click", 1.0),
    Event(3, ts(1, 1), 1, "view", 1.0),
    Event(4, ts(1, 2), 2, "view", 1.0),
    Event(5, ts(2), 1, "purchase", 1.0),
    Event(6, ts(2, 3), 2, "click", 1.0))

  test("aggregated stream increments equal batch q98 across a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.retentionCohorts(mem.toDS())
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("append").start()
    try {
      // boundary mid-week-1: user 1's cohort state carries over
      val (b1, b2) = fixture.sortBy(e => (e.ts.getTime, e.event_id))
        .partition(_.ts.getTime <= ts(1).getTime)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("retention_stream")
      .as[EventStream.CohortOut].collect()
    // each (user, offset) increments exactly once (user 1 week 1 twice)
    assert(rows.groupBy(r => (r.user_id, r.week_offset))
      .forall(_._2.length == 1))
    val streamMatrix = rows
      .groupBy(r => (r.cohort_week, r.week_offset)).view
      .mapValues(_.length.toLong).toMap

    val d = Files.createTempDirectory("graft-retentionstream").toString
    import org.apache.spark.sql.functions.lit
    fixture.toDS().toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$d/events.parquet")
    val batch = SparkEntry.queries("q98_retention_cohorts")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    spark.catalog.clearCache() // q98 persists its (user, week) relation
    assert(batch.values.sum === 6L) // 3+2+1 distinct (user, week) pairs
    assert(streamMatrix === batch,
      s"stream $streamMatrix vs batch $batch")
  }
}
