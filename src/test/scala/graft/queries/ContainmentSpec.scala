package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q125 — asymmetric gram containment. The operator's reason to exist is
  * pinned directly: a short snippet quoted inside a long page flags INTO
  * the page at 1000‰ while the symmetric Jaccard (q22) never surfaces
  * the pair at all (8 shared grams of a 98-gram union is 0.08), the
  * reverse direction stays silent, the admission bar is exact at the
  * [[TextAnalysis.ContainPm]] boundary, and a sub-6-gram overlap is not
  * even a candidate.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-contain").toString
    rows.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("a quoted snippet flags into its page; Jaccard misses the pair entirely") {
    // page B: 100 distinct words (98 3-grams). snippet A = B's first 10
    // words: 8 3-grams, all in B -> containment(A→B) = 1000‰ exactly;
    // containment(B→A) = 8/98 = 81‰ (silent). boundary doc D = 10 of
    // B's words + 2 novel: 8 of 10 grams in B -> exactly 800‰, admitted
    // by the ≥ bar. decoy C shares only a 5-word run with B: high
    // containment in principle but NO common 6-gram -> never a candidate.
    val w = (1 to 100).map(i => s"w$i")
    val a = w.take(10).mkString(" ")
    val b = w.mkString(" ")
    val c = w.slice(2, 7).mkString(" ")
    val d = (w.slice(30, 40) ++ Seq("novelx", "novely")).mkString(" ")
    val dir = corpus(Seq((1L, a), (2L, b), (3L, c), (4L, d)))
    val got = SparkEntry.queries("q125_gram_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    Caches.release(spark)
    assert(got === Set(
      (1L, 2L, 8L, 8L, 1000L),
      (4L, 2L, 8L, 10L, 800L)), got)
    // the symmetric measure on the SAME corpus surfaces nothing — the
    // containment-only gap q125 exists to close
    val q22 = SparkEntry.queries("q22_ngram_jaccard")(spark, dir).count()
    Caches.release(spark)
    assert(q22 === 0L, s"q22 unexpectedly surfaced $q22 pairs")
  }

  test("identical docs flag symmetrically at 1000 in both directions") {
    val t = (1 to 12).map(i => s"v$i").mkString(" ")
    val dir = corpus(Seq((7L, t), (8L, t)))
    val got = SparkEntry.queries("q125_gram_containment")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    Caches.release(spark)
    assert(got === Set((7L, 8L, 1000L), (8L, 7L, 1000L)), got)
  }
}
