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

  test("q51 redacts every span q50 detects: scan(redact(x)) counts zero") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pii-redact").toString
    Seq(
      (0L, "contact alice.smith+dev@example.org or bob@sub.example.co today"),
      (1L, "see https://example.com/a?b=c and http://example.org"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 responded"),
      (3L, "a perfectly clean document with no contact information"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val red = graft.SparkEntry.queries("q51_pii_redact")(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("redacted")).toMap
    assert(red(0L) == "contact [EMAIL] or [EMAIL] today")
    assert(red(1L) == "see [URL] and [URL]")
    assert(red(2L) == "server at [IP] and [IP] responded")
    assert(red(3L) == "a perfectly clean document with no contact information")
    assert(red(4L) == null)
    // round-trip: run the q50 scan over the redacted corpus — every
    // non-null document must come back clean
    val d2 = java.nio.file.Files.createTempDirectory("graft-pii-rescan").toString
    red.toSeq.toDF("doc_id", "text").write.parquet(s"$d2/documents.parquet")
    val rescanned = graft.SparkEntry.queries("q50_pii_scan")(spark, d2).collect()
    rescanned.filter(_.getAs[Long]("doc_id") != 4L).foreach { r =>
      assert(r.getAs[Boolean]("clean"),
        s"redacted doc ${r.getAs[Long]("doc_id")} still scans dirty: $r")
    }
  }
}
