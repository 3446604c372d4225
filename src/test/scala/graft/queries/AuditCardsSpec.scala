package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q135/q136 — the operator-evaluation cards: the lang-ID confusion
  * matrix against the corpus's own labels, and the banded-sketch
  * precision curve against the exact Jaccard bar.
  */
class AuditCardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q135 confusion: correct labels on the diagonal, a planted mislabel off it") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-langconf").toString
    val en = Seq.fill(4)("the and of to in is a").mkString(" ")
    val es = Seq.fill(4)("el la de que y en un").mkString(" ")
    // three true-en docs, one true-es doc, and one ES-labeled doc whose
    // TEXT is English — the planted off-diagonal cell
    Seq((0L, en, "en"), (1L, en, "en"), (2L, en, "en"),
        (3L, es, "es"), (4L, en, "es"))
      .toDF("doc_id", "text", "lang").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q135_langid_confusion")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    Caches.release(spark)
    assert(got === Map(
      ("en", "en") -> ((3L, 1000L)),
      ("es", "es") -> ((1L, 500L)),
      ("es", "en") -> ((1L, 500L))), got)
  }

  test("q143 coverage: orphans on both sides surface; the healthy corpus reads (n,0,0)") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-cov").toString
    Seq((0L, "has a vector"), (1L, "embed job missed me"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    Seq((0L, Seq(1f, 2f), "l"), (7L, Seq(3f, 4f), "l"))
      .toDF("vec_id", "embedding", "label").write.parquet(s"$d/embeddings.parquet")
    val r = SparkEntry.queries("q143_embedding_coverage")(spark, d).head()
    Caches.release(spark)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 1L)))
    // the real corpus is healthy 1:1 — the invariant the card confirms
    val h = SparkEntry.queries("q143_embedding_coverage")(
      spark, "/root/testdata/sf0.001").head()
    Caches.release(spark)
    assert(h.getLong(1) === 0L && h.getLong(2) === 0L && h.getLong(0) > 0L)
  }

  test("q144 cube marginals reconcile: cells sum to each marginal and the total") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q144_status_cube")(spark, dir)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(4)))
    val total = graft.Tables(spark, dir, "orders").count()
    Caches.release(spark)
    val cells = rows.filter(_._4 == 0L)
    assert(cells.map(_._3).sum === total, "gid 0 cells must tile the table")
    assert(rows.filter(_._4 == 3L).map(_._3).toSeq === Seq(total),
      "the grand total row carries gid 3")
    // each status marginal (gid 1: the LOW bit marks the second cube
    // column, priority, grouped away) equals the sum of its cells
    val statusMarginals = rows.filter(_._4 == 1L)
      .map(r => r._1 -> r._3).toMap
    val fromCells = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(statusMarginals === fromCells, "status marginals must reconcile")
  }

  test("q137 histogram keeps the zero-order bucket and conserves customers") {
    // the Q13 classic: an inner join would erase order-less customers;
    // their bucket must equal q07's anti-join count exactly, and the
    // histogram must conserve the customer table
    val dir = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("q137_order_histogram")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val noOrders = SparkEntry.queries("q07_anti_join")(spark, dir).count()
    val nCust = graft.Tables(spark, dir, "customer").count()
    Caches.release(spark)
    assert(hist.getOrElse(0L, 0L) === noOrders, s"zero bucket: $hist")
    assert(hist.values.sum === nCust, "histogram must conserve customers")
  }

  test("q140 diversity: templated source reads low, all-distinct source reads 1000") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-diversity").toString
    // A: two copies of a 3-word cycle -> 14 grams, 3 distinct (214 pm);
    // B: one all-distinct doc -> 3 grams, 3 distinct (1000 pm)
    Seq((0L, "x y z x y z x y z", "A"), (1L, "x y z x y z x y z", "A"),
        (2L, "p q r s t", "B"))
      .toDF("doc_id", "text", "source").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q140_source_diversity")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Caches.release(spark)
    assert(got === Map("A" -> ((14L, 3L, 214L)), "B" -> ((3L, 3L, 1000L))), got)
  }

  test("q141 PII incidence: exposure counts per source, clean share exact") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-pii-card").toString
    Seq((0L, "contact me at alice@example.com for details", "A"),
        (1L, "perfectly clean text with no identifiers", "A"),
        (2L, "see https://example.org and 10.0.0.1 today", "B"),
        (3L, "another clean document here", "B"),
        (4L, "yet another clean one", "B"))
      .toDF("doc_id", "text", "source").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q141_pii_incidence")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    Caches.release(spark)
    assert(got("A") === ((2L, 1L, 0L, 0L, 1L, 500L)), got)
    assert(got("B") === ((3L, 0L, 1L, 1L, 2L, 666L)), got)
  }

  test("q136 precision: identical docs confirm at hamming 0; totals cover q27") {
    // a verbatim pair is both a simhash pair (hamming 0) and a Jaccard
    // pair (1.0 >= 0.2): its hamming-0 row must show a confirmation
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val d = Files.createTempDirectory("graft-sketchprec").toString
    import spark.implicits._
    Seq((0L, t), (1L, t),
        (2L, "completely different content about spark catalyst planning"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q136_sketch_precision")(spark, d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Caches.release(spark)
    assert(got.contains(0L) && got(0L)._1 >= 1L && got(0L)._2 >= 1L, got)
    // on the real corpus the curve must tile the q27 pair set exactly
    // and never confirm more than it counts
    val dir = "/root/testdata/sf0.001"
    val curve = SparkEntry.queries("q136_sketch_precision")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    Caches.release(spark)
    val q27n = SparkEntry.queries("q27_simhash_pairs")(spark, dir).count()
    Caches.release(spark)
    assert(curve.map(_._1).sum === q27n, "curve must partition the q27 pairs")
    assert(curve.forall { case (n, c) => c <= n })
  }
}
