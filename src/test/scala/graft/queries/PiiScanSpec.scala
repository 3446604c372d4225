package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q50 — the synthetic corpus contains no PII-shaped spans (all-clean is
  * the expected sf result), so this fixture plants each pattern and pins
  * detection counts; the clean flag must be a total column even for null
  * documents.
  */
class PiiScanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q50 counts planted emails, urls, and ips; clean docs stay clean") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pii").toString
    Seq(
      (0L, "contact alice.smith+dev@example.org or bob@sub.example.co today"),
      (1L, "see https://example.com/a?b=c and http://example.org"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 responded"),
      (3L, "a perfectly clean document with no contact information"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q50_pii_scan")(spark, d)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_urls"),
          r.getAs[Long]("n_ips"), r.getAs[Boolean]("clean"))))
      .toMap
    assert(got(0L) == ((2L, 0L, 0L, false)))
    assert(got(1L) == ((0L, 2L, 0L, false)))
    assert(got(2L) == ((0L, 0L, 2L, false)))
    assert(got(3L) == ((0L, 0L, 0L, true)))
    assert(got(4L)._4 == false) // null text: counts null, clean coalesced
  }
}
