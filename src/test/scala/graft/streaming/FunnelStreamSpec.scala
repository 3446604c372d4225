package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import graft.streaming.EventStream.Event
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming funnel (the q78 dual): fed in event-time order, a
  * user's max emitted depth equals the batch q78 funnel_depth on the
  * same events; transitions emit exactly once and monotonically; a
  * pre-view click is not progress in either engine.
  */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // users exercising every depth: 1 converts, 2 clicks-before-view,
  // 3 purchases-before-click then clicks, 4 never views
  private val fixture = Seq(
    Event(0, ts(1), 1, "view", 1.0),
    Event(1, ts(2), 1, "click", 1.0),
    Event(2, ts(3), 1, "purchase", 1.0),
    Event(3, ts(1), 2, "click", 1.0),
    Event(4, ts(2), 2, "view", 1.0),
    Event(5, ts(1), 3, "view", 1.0),
    Event(6, ts(2), 3, "purchase", 1.0),
    Event(7, ts(3), 3, "click", 1.0),
    Event(8, ts(1), 4, "error", 1.0))

  test("streamed funnel depths equal batch q78; transitions are monotone singletons") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.funnel(mem.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // two ts-ordered micro-batches: the state carries mid-funnel users
      // (user 1 views+clicks in batch 1, purchases in batch 2)
      val (b1, b2) = fixture.sortBy(e => (e.ts.getTime, e.event_id))
        .partition(_.ts.getTime <= ts(2).getTime)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("funnel_stream")
      .as[EventStream.FunnelOut].collect()
    // each (user, depth) transition emits exactly once
    assert(rows.groupBy(r => (r.user_id, r.funnel_depth))
      .forall(_._2.length == 1))
    val maxDepth = rows.groupBy(_.user_id).view
      .mapValues(_.map(_.funnel_depth).max).toMap
    // depths are contiguous from 1: a user at depth d emitted 1..d
    rows.groupBy(_.user_id).foreach { case (u, rs) =>
      assert(rs.map(_.funnel_depth).sorted.toSeq === (1L to maxDepth(u)))
    }

    // batch oracle on the same events
    val d = Files.createTempDirectory("graft-funnelstream").toString
    import org.apache.spark.sql.functions.lit
    fixture.toDS().toDF()
      .withColumn("props", lit("{}"))
      .write.parquet(s"$d/events.parquet")
    val batch = SparkEntry.queries("q78_funnel")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_depth")).toMap
    assert(batch === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
    batch.foreach { case (u, depth) =>
      assert(maxDepth.getOrElse(u, 0L) === depth,
        s"user $u: stream ${maxDepth.getOrElse(u, 0L)} vs batch $depth")
    }
  }

  test("depth-4 stage list: streamed depths equal batch q83 across a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // GraphFunnelSpec's q83 fixture, as an event stream
    val fx = Seq(
      Event(0, ts(1), 1, "signup", 1.0), Event(1, ts(2), 1, "view", 1.0),
      Event(2, ts(3), 1, "click", 1.0), Event(3, ts(4), 1, "purchase", 1.0),
      Event(4, ts(1), 2, "view", 1.0), Event(5, ts(2), 2, "signup", 1.0),
      Event(6, ts(3), 2, "click", 1.0),
      Event(7, ts(1), 3, "signup", 1.0), Event(8, ts(2), 3, "view", 1.0),
      Event(9, ts(3), 3, "purchase", 1.0), Event(10, ts(4), 3, "click", 1.0),
      Event(11, ts(1), 4, "view", 1.0), Event(12, ts(2), 4, "click", 1.0))
    val mem = MemoryStream[Event]
    val q = EventStream.funnelStages(mem.toDS(),
        Seq("signup", "view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel4_stream")
      .outputMode("append").start()
    try {
      // user 1 is mid-funnel at the boundary: state carries two stages
      val (b1, b2) = fx.sortBy(e => (e.ts.getTime, e.event_id))
        .partition(_.ts.getTime <= ts(2).getTime)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val maxDepth = spark.table("funnel4_stream")
      .as[EventStream.FunnelOut].collect()
      .groupBy(_.user_id).view.mapValues(_.map(_.funnel_depth).max).toMap
    val d = Files.createTempDirectory("graft-funnel4stream").toString
    import org.apache.spark.sql.functions.lit
    fx.toDS().toDF().withColumn("props", lit("{}"))
      .write.parquet(s"$d/events.parquet")
    val batch = SparkEntry.queries("q83_funnel_stages")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_depth")).toMap
    assert(batch === Map(1L -> 4L, 2L -> 1L, 3L -> 3L, 4L -> 0L))
    batch.foreach { case (u, depth) =>
      assert(maxDepth.getOrElse(u, 0L) === depth,
        s"user $u: stream ${maxDepth.getOrElse(u, 0L)} vs batch $depth")
    }
  }
}
