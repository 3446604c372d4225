package graft.queries

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Planted-boundary contract for the binned range join (q60): the
  * horizon is a HALF-OPEN interval (t1, t1 + W] — an event at exactly
  * t1 is not its own follower, an event at exactly t1 + W still counts —
  * and a follower landing in the NEXT time bucket must still be found
  * (the interval spans two buckets; dropping the second probe row is
  * precisely the refactor this spec exists to catch, and corpus-level
  * oracle data would only catch it statistically).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val W = 1800L * 1000000L // 30 min in µs

  /** Events fixture in the testdata layout from (event_id, µs, user,
    * type, value) tuples.
    */
  private def fixture(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-rj").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(us)"))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q145 transitions: adjacent same-user steps only, event-time order") {
    val min = 60L * 1000000L
    val rows = Seq(
      // user 1: view -> click -> purchase
      (1L, 0L, 1L, "view", 0.0), (2L, min, 1L, "click", 0.0),
      (3L, 2L * min, 1L, "purchase", 0.0),
      // user 2: error -> error (a self-transition); no cross-user pair
      (4L, 0L, 2L, "error", 0.0), (5L, min, 2L, "error", 0.0))
    val got = SparkEntry.queries("q145_event_transitions")(
        spark, fixture(rows))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    graft.Caches.release(spark)
    assert(got === Map(
      ("view", "click") -> 1L, ("click", "purchase") -> 1L,
      ("error", "error") -> 1L), got)
  }

  test("q138 session sizes: the 30-min gap rule shapes the histogram") {
    val min = 60L * 1000000L
    val rows = Seq(
      // user 1: three events 1 min apart (one session of 3), then a
      // 100-min gap into a session of 2
      (1L, 0L, 1L, "view", 0.0), (2L, min, 1L, "view", 0.0),
      (3L, 2L * min, 1L, "click", 0.0),
      (4L, 102L * min, 1L, "view", 0.0), (5L, 103L * min, 1L, "view", 0.0),
      // user 2: one lone event; user 3: two events EXACTLY 30 min apart
      // (gap = 1800s is NOT > the bound — same session)
      (6L, 0L, 2L, "view", 0.0),
      (7L, 0L, 3L, "view", 0.0), (8L, 30L * min, 3L, "view", 0.0))
    val got = SparkEntry.queries("q138_session_sizes")(spark, fixture(rows))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Caches.release(spark)
    assert(got === Map(3L -> 1L, 2L -> 2L, 1L -> 1L), got)
  }

  test("q134 drift: per-type week series with a lag ratio, first week null") {
    val wk = 604800L * 1000000L
    val rows = Seq(
      // clicks: weeks 0, 0, 1, 1, 1 -> ratio week1 = 1500
      (1L, 1L, 1L, "click", 0.0), (2L, 2L, 1L, "click", 0.0),
      (3L, wk + 1L, 1L, "click", 0.0), (4L, wk + 2L, 2L, "click", 0.0),
      (5L, wk + 3L, 3L, "click", 0.0),
      // views: week 0 only -> one row, null prev/ratio
      (6L, 5L, 1L, "view", 0.0),
      // errors: weeks 0 and 2 — the GAP week is absent from the series,
      // so week 2 lags against week 0 (count series, not a calendar)
      (7L, 7L, 1L, "error", 0.0), (8L, 2L * wk + 1L, 1L, "error", 0.0))
    val got = SparkEntry.queries("q134_weekly_drift")(spark, fixture(rows))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    graft.Caches.release(spark)
    assert(got === Map(
      ("click", 0L) -> ((2L, -1L, -1L)),
      ("click", 1L) -> ((3L, 2L, 1500L)),
      ("view", 0L) -> ((1L, -1L, -1L)),
      ("error", 0L) -> ((1L, -1L, -1L)),
      ("error", 2L) -> ((1L, 1L, 1000L))), got)
  }

  test("q132 decay: weight halves per half-life step, horizon and user bounds hold") {
    val hl = W // the operator's half-life is 30 min, same as this W
    val t = 100L * hl
    val rows = Seq(
      // user 1 converts at t; touches at increasing staleness:
      (1L, t - 1L, 1L, "click", 0.0),           // Δ < HL -> 1e6
      (2L, t - hl, 1L, "click", 0.0),           // Δ = HL exactly -> 500000
      (3L, t - 2L * hl - 1L, 1L, "view", 0.0),  // Δ just past 2·HL -> 250000
      (4L, t - 4L * hl, 1L, "view", 0.0),       // Δ = horizon exactly -> 62500
      (5L, t - 4L * hl - 1L, 1L, "view", 0.0),  // past the horizon: excluded
      (6L, t, 1L, "view", 0.0),                 // simultaneous: strict < excludes
      (7L, t - 1L, 2L, "click", 0.0),           // other user: excluded
      (50L, t, 1L, "purchase", 10.0),
      // user 3: touches but no purchase -> contributes nothing
      (8L, t, 3L, "click", 0.0))
    val got = SparkEntry.queries("q132_decay_attribution")(
        spark, fixture(rows))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    graft.Caches.release(spark)
    assert(got === Map(
      "click" -> ((2L, 1500000L)),  // 1e6 + 500000
      "view" -> ((2L, 312500L))),   // 250000 + 62500
      got)
  }

  test("q60 horizon is (t1, t1+W]: boundary events and the bucket-spanning follower") {
    // error 100 at t0 = 4·W exactly (bucket boundary); error 200 at
    // t0' = 7·W + 0.7·W (mid-bucket); error 300 with no followers
    val t0 = 4L * W
    val t1 = 7L * W + (7L * W) / 10
    val rows = Seq(
      (100L, t0, 1L, "error", 0.0),
      (200L, t1, 2L, "error", 0.0),
      (300L, t0, 3L, "error", 0.0),
      // user 1 followers around error 100:
      (10L, t0, 1L, "purchase", 99.0),          // t2 == t1: EXCLUDED (strict >)
      (11L, t0 + 1L, 1L, "purchase", 1.5),      // just inside, same bucket
      (12L, t0 + W, 1L, "purchase", 2.25),      // exactly t1+W: INCLUDED, next bucket
      (13L, t0 + W + 1L, 1L, "purchase", 99.0), // just past the horizon: excluded
      (14L, t0 + 5L, 2L, "purchase", 99.0),     // other USER at a matching time: excluded
      // user 2 follower crossing the bucket boundary mid-interval:
      (20L, t1 + W, 2L, "purchase", 4.125)      // exactly at horizon, bucket 8 ≠ 7
    )
    val got = SparkEntry.queries("q60_range_join")(spark, fixture(rows))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(
      100L -> ((2L, 1.5 + 2.25)), // events 11 and 12 only
      200L -> ((1L, 4.125)),      // event 20 only (14 is hours earlier)
      300L -> ((0L, 0.0))))
  }

  test("q60 degenerate corpora: no errors → empty; no purchases → all-zero attributions") {
    // the degenerate-input coverage the sibling operators have
    // (DegenerateTextSpec / DegenerateEmbeddingsSpec): an empty side of
    // the range join must produce the defined answer, never a crash or
    // a dropped error row
    val noErrors = Seq(
      (10L, W + 1L, 1L, "purchase", 5.0),
      (11L, W + 2L, 2L, "view", 0.0))
    assert(SparkEntry.queries("q60_range_join")(spark, fixture(noErrors))
      .collect().isEmpty, "no error events → no attribution rows")

    val noPurchases = Seq(
      (100L, W, 1L, "error", 0.0),
      (200L, 2L * W, 2L, "error", 0.0),
      (10L, W + 1L, 1L, "view", 0.0)) // non-purchase follower: ignored
    val got = SparkEntry.queries("q60_range_join")(spark, fixture(noPurchases))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === Map(100L -> ((0L, 0.0)), 200L -> ((0L, 0.0))),
      "every error survives the left join with a zero attribution")
  }
}
