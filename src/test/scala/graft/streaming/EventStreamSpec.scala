package graft.streaming

import graft.SparkTestSession
import graft.streaming.EventStream.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private val fixture = Seq(
    Event(0, ts(1), 1, "click", 1.0),
    Event(1, ts(5), 1, "click", 2.0),
    Event(2, ts(10), 2, "view", 3.0),
    Event(3, ts(65), 1, "click", 4.0), // 60-min gap: new session for user 1
    Event(4, ts(70), 2, "view", 5.0),
    Event(5, ts(130), 1, "click", 6.0)) // hour 3; pushes watermark forward

  test("withRecentSignup interval-joins two stream branches, outer rows flush on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.withRecentSignup(mem.toDF(), watermark = "10 minutes",
        horizonHours = 1)
      .writeStream.format("memory").queryName("enrich").outputMode("append").start()
    try {
      mem.addData(
        Event(0, ts(1), 1, "signup", 0.0),
        Event(4, ts(3), 1, "signup", 0.0),  // user 1 signs up AGAIN in-horizon
        Event(1, ts(5), 1, "click", 1.0),   // 2 signup matches → ONE row, max ts
        Event(2, ts(10), 2, "click", 2.0),  // user 2 never signs up → outer null
        Event(3, ts(70), 1, "click", 3.0))  // 67+ min after signups: outside 1h horizon
      q.processAllAvailable()
      // advance both watermarks far enough to close every pending outer row
      mem.addData(Event(9, ts(300), 9, "signup", 0.0),
        Event(10, ts(300), 9, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("enrich")
        .select($"event_id", $"signup_ts")
        .as[(Long, Option[Timestamp])].collect()
      // one output row per activity even with multiple matching signups
      assert(rows.map(_._1).sorted.toSeq == rows.map(_._1).distinct.sorted.toSeq,
        s"duplicate activity rows: ${rows.toSeq}")
      val got = rows.toMap
      assert(got(1L).contains(ts(3)),
        "multi-signup activity must carry the LATEST in-horizon signup")
      assert(got(2L).isEmpty, "never-signed-up activity must flush as outer null")
      assert(got(3L).isEmpty, "out-of-horizon activity must not join a stale signup")
    } finally q.stop()
  }

  test("rangeAttribution matches batch q60 on the same planted rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the RangeJoinSpec boundary shapes: strict > at the error instant,
    // inclusive at exactly +30min, a zero-follower error, another user
    val rows = Seq(
      Event(100, ts(10), 1, "error", 0.0),
      Event(10, ts(10), 1, "purchase", 99.0), // t2 == t1: excluded (strict >)
      Event(11, ts(12), 1, "purchase", 1.5),  // inside the horizon
      Event(12, ts(40), 1, "purchase", 2.25), // exactly t1+30min: included
      Event(13, ts(41), 1, "purchase", 99.0), // just past: excluded
      Event(200, ts(20), 2, "error", 0.0),    // no purchases: zero row
      Event(14, ts(15), 3, "purchase", 7.0))  // other user: never joins
    val mem = MemoryStream[Event]
    val q = EventStream.rangeAttribution(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("rattr").outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // advance both watermarks far enough to flush every pending row
      // (including the zero-follower error's outer row)
      mem.addData(Event(900, ts(500), 9, "error", 0.0),
        Event(901, ts(500), 9, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("rattr").filter($"event_id" < 900)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // the batch operator over the IDENTICAL rows is the truth
      val d = java.nio.file.Files.createTempDirectory("graft-rattr").toString
      rows.toDF().write.parquet(s"$d/events.parquet")
      val want = graft.SparkEntry.queries("q60_range_join")(spark, d)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want,
        s"stream attribution must equal batch q60:\n$got\nvs\n$want")
      assert(want(100L) == ((2L, 1.5 + 2.25)) && want(200L) == ((0L, 0.0)))
    } finally q.stop()
  }

  test("transitions stream folds to the batch q145 matrix across a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1's journey straddles the boundary (the click->purchase edge
    // crosses it — only the 1-string state can supply the left side);
    // user 2 self-transitions; in-batch arrival order is scrambled to
    // prove the (ts, event_id) sort, not arrival, defines adjacency
    val rows = Seq(
      Event(1, ts(1), 1, "view", 0.0), Event(2, ts(2), 1, "click", 0.0),
      Event(3, ts(3), 1, "purchase", 0.0),
      Event(4, ts(1), 2, "error", 0.0), Event(5, ts(2), 2, "error", 0.0))
    val mem = MemoryStream[Event]
    val q = EventStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      // batch 1 delivers user 1's first two SCRAMBLED + user 2's first
      mem.addData(rows(1), rows(0), rows(3))
      q.processAllAvailable()
      mem.addData(rows(2), rows(4))
      q.processAllAvailable()
      val got = spark.table("trans")
        .groupBy("event_type", "next_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val d = java.nio.file.Files.createTempDirectory("graft-trans").toString
      rows.toDF().write.parquet(s"$d/events.parquet")
      val want = graft.SparkEntry.queries("q145_event_transitions")(spark, d)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      graft.Caches.release(spark)
      assert(got == want, s"stream $got must equal batch q145 $want")
      assert(want == Map(("view", "click") -> 1L,
        ("click", "purchase") -> 1L, ("error", "error") -> 1L))
    } finally q.stop()
  }

  test("transitions: same-millisecond events order by their microsecond field, stream equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two events in ONE micro-batch share the millisecond; only the
    // microsecond field separates them, and event_id order is the
    // REVERSE of time order — a millisecond-only in-batch sort (the
    // pre-9549b02 defect) falls back to event_id and emits b->a. The
    // batch q145 window orders by the full microsecond timestamp, so
    // only the (ms, nanos) sort keeps the duals equal.
    val t1 = new Timestamp(60000L); t1.setNanos(1000) // +1 µs
    val t2 = new Timestamp(60000L); t2.setNanos(2000) // +2 µs
    val rows = Seq(
      Event(1, t2, 1, "b", 0.0), // lower id, LATER microsecond
      Event(2, t1, 1, "a", 0.0),
      Event(3, ts(2), 1, "c", 0.0))
    val mem = MemoryStream[Event]
    val q = EventStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("trans_us")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*) // one batch: the in-batch sort is on trial
      q.processAllAvailable()
      val got = spark.table("trans_us")
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val d = java.nio.file.Files.createTempDirectory("graft-trans-us").toString
      rows.toDF().write.parquet(s"$d/events.parquet")
      val want = graft.SparkEntry.queries("q145_event_transitions")(spark, d)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      graft.Caches.release(spark)
      assert(want == Map(("a", "b") -> 1L, ("b", "c") -> 1L),
        s"batch must order by microseconds: $want")
      assert(got == want, s"stream $got must equal batch q145 $want")
    } finally q.stop()
  }

  test("decayedTouches fold to the batch q132 channel report on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the q132 staleness ladder as a stream: weights 1e6 / 5e5 / 2.5e5 /
    // 62500 at the exact half-life boundaries, horizon and user bounds
    // offset +1000 min: an event at exactly epoch 0 sits AT the initial
    // watermark and is dropped as late on arrival
    val rows = Seq(
      Event(1, ts(1119), 1, "click", 0.0), // Δ 1 min -> 1e6
      Event(2, ts(1090), 1, "click", 0.0), // Δ 30 min exactly -> 500000
      Event(3, ts(1055), 1, "view", 0.0),  // Δ 65 min -> 250000
      Event(4, ts(1000), 1, "view", 0.0),  // Δ 120 min = horizon -> 62500
      Event(5, ts(1240), 1, "view", 0.0),  // after the purchase: excluded
      Event(6, ts(1119), 2, "click", 0.0), // other user: excluded
      Event(50, ts(1120), 1, "purchase", 10.0))
    val mem = MemoryStream[Event]
    val q = EventStream.decayedTouches(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("dtouch")
      .outputMode("append").start()
    try {
      // all four in-horizon touches land in batch 1 — the ts(0) touch
      // is 119 min older than the batch max, and a later delivery would
      // (correctly) drop it as beyond the 10-min watermark
      mem.addData(rows.take(4): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
      // flush both watermarks
      mem.addData(Event(900, ts(5000), 9, "view", 0.0),
        Event(901, ts(5000), 9, "purchase", 0.0))
      q.processAllAvailable()
      val got = spark.table("dtouch").filter($"event_id" < 900)
        .groupBy("channel")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_touches"),
          org.apache.spark.sql.functions.sum("w_ppm").as("weight_ppm"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // the batch operator over the IDENTICAL rows is the truth
      val d = java.nio.file.Files.createTempDirectory("graft-dtouch").toString
      rows.toDF().write.parquet(s"$d/events.parquet")
      val want = graft.SparkEntry.queries("q132_decay_attribution")(spark, d)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      graft.Caches.release(spark)
      assert(got == want, s"stream $got must equal batch q132 $want")
      assert(want("click") == ((2L, 1500000L)) &&
        want("view") == ((2L, 312500L)), want)
    } finally q.stop()
  }

  test("hourlyWindows over a MemoryStream matches the batch aggregation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.hourlyWindows(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select("hour", "event_type", "n", "sum_value")
        .as[(String, String, Long, Double)].collect().toSet
      val want = EventStream.hourlyWindows(fixture.toDF())
        .as[(String, String, Long, Double)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("sessionWindows groups by 30-minute inactivity gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionWindows(mem.toDF())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select($"user_id", $"n_events").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      // user 1: sessions of 2, 1, 1 events; user 2: 1, 1
      assert(got(1L) == List(1L, 1L, 2L))
      assert(got(2L) == List(1L, 1L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("fmgs_sessions")
      .outputMode("append").start()
    try {
      // two micro-batches so the watermark from batch 1 closes sessions in 2
      mem.addData(fixture.take(5): _*)
      q.processAllAvailable()
      mem.addData(fixture.drop(5): _*)
      q.processAllAvailable()
      // final event at min 130 => watermark 130-120=10min; sessions whose
      // (lastSeen+30min) <= 10min would close; emit timing aside, gap
      // splits within a batch must emit immediately:
      val got = spark.table("fmgs_sessions")
        .as[EventStream.SessionOut].collect()
      // user 1's first session (min 1-5, 2 events) closed by the min-65 gap split
      assert(got.exists(s => s.user_id == 1 && s.n_events == 2))
      got.foreach(s => assert(s.session_end.getTime >= s.session_start.getTime))
    } finally q.stop()
  }
}
