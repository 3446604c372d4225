package graft.queries

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Usefulness contract of the bounded-sample quantile sketch (q66), the
  * AnnRecallSpec discipline applied to quantiles: on a corpus large
  * enough to force real admission sampling (modulus > 1), the sketch's
  * rank-selected quantiles must track the EXACT full-corpus quantiles
  * within the standard sampling envelope, the sample must hold ~cap
  * rows, and degenerate corpora (all-equal lengths, a single document)
  * must answer exactly.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-qsketch").toString
    rows.toDF("doc_id", "lang", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  /** Exact rank-selection quantile (the q47/q66 definition: value at
    * integer rank ceil(q·n) of the sorted order).
    */
  private def exactQ(xs: Seq[Long], num: Int, den: Int): Long = {
    val sorted = xs.sorted
    sorted(((xs.size.toLong * num + den - 1) / den - 1).toInt)
  }

  test("sampled quantiles track exact quantiles within the sampling envelope") {
    // 5000 docs, two languages, deterministic pseudo-uniform lengths in
    // [0, 1000) — admission modulus = ceil(5000/500) = 10, so the sketch
    // really samples (~500 of 5000)
    val rows = (0L until 5000L).map { i =>
      (i, if (i % 2 == 0) "en" else "de", (i * 2654435761L) % 1000L)
    }
    val got = SparkEntry.queries("q66_quantile_sketch")(spark, corpus(rows))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got.keySet == Set("en", "de"))
    for ((lang, (nSample, p25, p50, p75, p95)) <- got) {
      val full = rows.filter(_._2 == lang).map(_._3)
      // ~250 admitted per language (binomial around 2500/10); a hash
      // regression that admits everything or nothing lands far outside
      assert(nSample > 120 && nSample < 450, s"$lang sample size $nSample")
      // rank error of a q-quantile from a ~250-row uniform sample:
      // σ ≈ √(q(1−q)/250) ≤ 0.032 of rank; lengths are ~uniform on
      // [0,1000) so rank fraction ≈ value/1000 — 150 is ~5σ headroom
      val tol = 150L
      assert((p25 - exactQ(full, 1, 4)).abs <= tol, s"$lang p25=$p25")
      assert((p50 - exactQ(full, 1, 2)).abs <= tol, s"$lang p50=$p50")
      assert((p75 - exactQ(full, 3, 4)).abs <= tol, s"$lang p75=$p75")
      assert((p95 - exactQ(full, 19, 20)).abs <= tol, s"$lang p95=$p95")
    }
  }

  test("degenerate corpora answer exactly: constant lengths, single document") {
    val const = (0L until 2000L).map(i => (i, "en", 77L))
    val g1 = SparkEntry.queries("q66_quantile_sketch")(spark, corpus(const))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(g1.toSeq == Seq((77L, 77L, 77L, 77L)),
      "every quantile of a constant corpus is the constant")

    val one = Seq((42L, "de", 9L))
    val g2 = SparkEntry.queries("q66_quantile_sketch")(spark, corpus(one))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(g2.toSeq == Seq(("de", 1L, 9L)),
      "a single-doc corpus admits its doc (modulus 1) and answers it")
  }
}
