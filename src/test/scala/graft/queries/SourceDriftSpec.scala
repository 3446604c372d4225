package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q100 source-drift semantics: the single-source fixed point (corpus ≡
  * source ⇒ every per-token term cancels ⇒ drift exactly 0) and the
  * ordering property (a source with distinctive vocabulary drifts more
  * than one speaking the corpus's common tongue).
  */
class SourceDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-drift").toString
    rows.toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def drift(dir: String): Map[String, (Long, Double)] =
    graft.SparkEntry.queries("q100_source_drift")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4)))
      .toMap

  test("a single-source corpus has exactly zero drift") {
    val dir = write(Seq(
      (1L, "alpha beta gamma alpha", "web"),
      (2L, "beta gamma delta epsilon", "web")))
    val m = drift(dir)
    assert(m.keySet === Set("web"))
    val (n, d) = m("web")
    assert(n === 8L)
    assert(d === 0.0)
    spark.catalog.clearCache()
  }

  test("a distinctive-vocabulary source drifts more than a common one") {
    // "web" repeats the corpus's dominant tokens; "ocr" speaks tokens
    // rare corpus-wide but common within itself
    val common = "the of and to in the of and to in"
    val dir = write(Seq(
      (1L, common, "web"), (2L, common, "web"), (3L, common, "web"),
      (4L, "zxqv wmbr kjpl zxqv wmbr kjpl zxqv wmbr kjpl zxqv", "ocr")))
    val m = drift(dir)
    assert(m("ocr")._2 > m("web")._2,
      s"distinctive source must drift more: $m")
    // web's tokens dominate the corpus, so its corpus-vs-source gap is 0
    assert(m("web")._2 <= 1.0)
    spark.catalog.clearCache()
  }
}
