package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q53 — deterministic HLL vocabulary sketch. Hash-parity with the oracle
  * is the Verify gate; these pin the properties that make the sketch
  * USEFUL: the estimate tracks the in-query exact count (a register or
  * correction-table regression would keep cross-engine parity while
  * estimating garbage), and the sketch is duplication-insensitive (the
  * register max absorbs repeats — the property that makes 64 registers a
  * substitute for a corpus-wide distinct at 100 TB).
  */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(dir: String) =
    graft.SparkEntry.queries("q53_vocab_hll")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_exact"), r.getAs[Double]("n_hll"))))
      .toMap

  test("q53 estimate tracks the exact count within the m=64 error envelope") {
    val got = run("/root/testdata/sf0.01")
    assert(got.nonEmpty)
    got.foreach { case (lang, (exact, est)) =>
      assert(exact > 0 && est > 0, s"$lang degenerate: $exact / $est")
      val err = math.abs(est - exact) / exact.toDouble
      // 1.04/sqrt(64) ≈ 13% standard error; linear counting governs the
      // small-cardinality corpus — 35% is the generous outer bound that
      // still catches a broken register pipeline (raw-only read 2x high)
      assert(err <= 0.35, s"$lang: estimate $est vs exact $exact (err $err)")
    }
  }

  test("q53 sketch is duplication-insensitive: repeated tokens change nothing") {
    import spark.implicits._
    val vocab = (1 to 40).map(i => s"tok$i")
    val a = java.nio.file.Files.createTempDirectory("graft-hll-a").toString
    val b = java.nio.file.Files.createTempDirectory("graft-hll-b").toString
    Seq((1L, vocab.mkString(" "), "en"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$a/documents.parquet")
    (1L to 5L).map(i => (i, vocab.mkString(" "), "en"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$b/documents.parquet")
    val (ga, gb) = (run(a), run(b))
    assert(ga("en")._1 == 40L && gb("en")._1 == 40L)
    assert(ga("en")._2 == gb("en")._2,
      s"5x-duplicated corpus changed the sketch: ${ga("en")._2} vs ${gb("en")._2}")
  }
}
