package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming dup-gram coverage (the q71 dual): each arrival is scored
  * against the grams of STRICTLY EARLIER batches — within-batch sharing
  * does not count (a batch is one atomic arrival), redelivery of a
  * committed batch is a no-op, and the index probe is pruned to the
  * batch's own gram buckets.
  */
class GramStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private val run = "alpha beta gamma delta epsilon zeta" // 2 distinct 5-grams
  private val fresh = "completely different ten token text with no overlap at all"

  test("coverage is causal: prior batches count, the same batch does not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-gramstream").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.runDupCoverage(
      mem.toDF().toDF("doc_id", "ingest_ts", "text"),
      s"$base/index", s"$base/out", s"$base/ckpt")
    try {
      // batch 1: doc 0 and its VERBATIM COPY doc 1 — within-batch
      // sharing must not count, so both score 0
      mem.addData((0L, ts(1), run), (1L, ts(2), run))
      q.processAllAvailable()
      // batch 2: full dup of batch 1, a fresh doc, a below-width doc
      mem.addData((10L, ts(3), run), (11L, ts(4), fresh),
        (12L, ts(5), "one two three"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), Option(r.get(3))))).toMap
      assert(out(0L) == ((2L, 0L, Some(0.0))))
      assert(out(1L) == ((2L, 0L, Some(0.0)))) // same-batch copy: not seen
      assert(out(10L) == ((2L, 2L, Some(1.0)))) // prior-batch copy: fully seen
      assert(out(11L)._2 == 0L && out(11L)._3 == Some(0.0))
      assert(out(12L) == ((0L, 0L, None))) // below gram width: null frac
      // the index holds each distinct gram once per epoch it arrived in
      val idx = spark.read.parquet(s"$base/index")
      assert(idx.select("h").distinct().count() == 2 + 6) // run + fresh grams
    } finally q.stop()
  }

  test("redelivery of a committed batch is a no-op; recompute is identical") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-gramredeliver").toString
    val b1 = Seq((0L, run)).toDF("doc_id", "text")
    val b2 = Seq((10L, run)).toDF("doc_id", "text")
    DocStream.processGramBatch(spark, b1, 0L, s"$base/index", s"$base/out")
    DocStream.processGramBatch(spark, b2, 1L, s"$base/index", s"$base/out")
    val before = spark.read.parquet(s"$base/out").collect().toSet
    // committed batch replays must change nothing
    DocStream.processGramBatch(spark, b1, 0L, s"$base/index", s"$base/out")
    DocStream.processGramBatch(spark, b2, 1L, s"$base/index", s"$base/out")
    assert(spark.read.parquet(s"$base/out").collect().toSet == before)
    val frac = spark.read.parquet(s"$base/out")
      .filter($"doc_id" === 10L).select("dup_frac").as[Double].head()
    assert(frac == 1.0)
  }
}
