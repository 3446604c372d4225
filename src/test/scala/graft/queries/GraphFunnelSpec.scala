package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts of triangle support (q77) and the ordered funnel
  * (q78) on planted fixtures where the expected answer is computable by
  * hand:
  *
  *   - q77: a 4-clique of identical documents yields C(3,2)=3 triangles
  *     per member; a document pair with no common neighbor yields none.
  *   - q78: funnel stages are ORDERED — a click before the first view is
  *     not progress; the chain restarts the conditional min at every
  *     stage.
  */
class GraphFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q77: a 4-clique contributes C(3,2)=3 triangles to each member") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-tri").toString
    // 4 identical docs = identical sketches = hamming-0 clique;
    // 2 unrelated docs that pair with nothing
    val clique = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (0L, clique), (1L, clique), (2L, clique), (3L, clique),
      (10L, "completely different text one two three four five"),
      (11L, "yet another unrelated document with its own words entirely"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q77_triangle_support")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique member sits in C(3,2) = 3 triangles of the K4
    assert(got === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    Caches.release(spark)
  }

  test("q98: cohorts key on FIRST-activity week; offsets count distinct users") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-retention").toString
    // week w -> any instant inside epoch week w; two events in the same
    // week must count a user once
    def wts(w: Long, off: Long = 1) = new Timestamp(w * 604800000L + off * 60000L)
    Seq(
      // user 1: weeks 0, 1, 3 (two week-1 events dedup to one)
      (0L, wts(0), 1L, "view", 1.0, "{}"),
      (1L, wts(1), 1L, "view", 1.0, "{}"),
      (2L, wts(1, 2), 1L, "click", 1.0, "{}"),
      (3L, wts(3), 1L, "view", 1.0, "{}"),
      // user 2: weeks 0, 2
      (4L, wts(0), 2L, "view", 1.0, "{}"),
      (5L, wts(2), 2L, "view", 1.0, "{}"),
      // user 3: first seen week 1 — its own cohort
      (6L, wts(1), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q98_retention_cohorts")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Caches.release(spark)
    assert(got === Map(
      (0L, 0L) -> 2L, // users 1, 2 in their cohort week
      (0L, 1L) -> 1L, // user 1 back in week 1
      (0L, 2L) -> 1L, // user 2 back in week 2
      (0L, 3L) -> 1L, // user 1 back in week 3
      (1L, 0L) -> 1L), got) // user 3's own cohort
  }

  test("q78: stages are ordered — pre-view clicks don't count; depth stitches") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-funnel").toString
    def ts(min: Long) = new Timestamp(min * 60000L)
    Seq(
      // user 1 converts in order: view@1, click@2, purchase@3 → depth 3
      (0L, ts(1), 1L, "view", 1.0, "{}"),
      (1L, ts(2), 1L, "click", 1.0, "{}"),
      (2L, ts(3), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE the view — not funnel progress → depth 1
      (3L, ts(1), 2L, "click", 1.0, "{}"),
      (4L, ts(2), 2L, "view", 1.0, "{}"),
      // user 3: purchase before click (view@1, purchase@2, click@3) →
      // the purchase min must be AFTER the click → depth 2
      (5L, ts(1), 3L, "view", 1.0, "{}"),
      (6L, ts(2), 3L, "purchase", 1.0, "{}"),
      (7L, ts(3), 3L, "click", 1.0, "{}"),
      // user 4 never views → depth 0
      (8L, ts(1), 4L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q78_funnel")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_depth")).toMap
    assert(got === Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L))
  }

  test("q83: depth-4 stage list — chain restarts at every stage boundary") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-funnel4").toString
    def ts(min: Long) = new Timestamp(min * 60000L)
    Seq(
      // user 1 converts fully in order → depth 4
      (0L, ts(1), 1L, "signup", 1.0, "{}"),
      (1L, ts(2), 1L, "view", 1.0, "{}"),
      (2L, ts(3), 1L, "click", 1.0, "{}"),
      (3L, ts(4), 1L, "purchase", 1.0, "{}"),
      // user 2: view BEFORE signup is not progress → depth 1
      (4L, ts(1), 2L, "view", 1.0, "{}"),
      (5L, ts(2), 2L, "signup", 1.0, "{}"),
      (6L, ts(3), 2L, "click", 1.0, "{}"),
      // user 3: purchase lands before the first post-view click → depth 3
      (7L, ts(1), 3L, "signup", 1.0, "{}"),
      (8L, ts(2), 3L, "view", 1.0, "{}"),
      (9L, ts(3), 3L, "purchase", 1.0, "{}"),
      (10L, ts(4), 3L, "click", 1.0, "{}"),
      // user 4 never signs up → depth 0 regardless of later stages
      (11L, ts(1), 4L, "view", 1.0, "{}"),
      (12L, ts(2), 4L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val got = SparkEntry.queries("q83_funnel_stages")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("funnel_depth")).toMap
    assert(got === Map(1L -> 4L, 2L -> 1L, 3L -> 3L, 4L -> 0L))
  }
}
