package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q45 — each Gopher-style rule must reject independently: a document that
  * fails exactly one rule fails the filter, and the all-rules-pass document
  * passes. Pins the thresholds (50 words, mean length [3,10], >0.8 alpha,
  * ≥2 distinct required stopwords) against silent drift.
  */
class QualityFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-quality").toString
    val passText = Seq.fill(10)("the data with more words here").mkString(" ") // 60 words, mean 4.3
    Seq(
      (0L, passText),
      (1L, "the data with more"), // 4 words: fails the 50-word floor
      (2L, "the with " + Seq.fill(50)("a").mkString(" ")), // mean length 1.2: fails [3,10]
      (3L, "the with " + Seq.fill(60)("12345").mkString(" ")), // alpha 2/62: fails >0.8
      (4L, Seq.fill(20)("data words code").mkString(" "))) // 60 words, 0 required stopwords
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q45 passes the clean document and fails each single-rule violation") {
    val rows = graft.SparkEntry.queries("q45_quality_filter")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass")).toMap
    assert(rows == Map(0L -> true, 1L -> false, 2L -> false, 3L -> false, 4L -> false))
  }

  test("q45 emits the rule inputs it judged by") {
    val r = graft.SparkEntry.queries("q45_quality_filter")(spark, dir)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_words") == 60)
    assert(r(0L).getAs[Long]("n_stop_distinct") == 2) // the, with
    assert(r(4L).getAs[Long]("n_stop_distinct") == 0)
    assert(r(3L).getAs[Double]("frac_alpha") < 0.1)
  }
}
