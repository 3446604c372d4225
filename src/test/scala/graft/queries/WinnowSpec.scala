package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q99 winnowing semantics: the guarantee (a copied substring of
  * ≥ window+shingle−1 chars shares a fingerprint), the positional
  * locality that distinguishes it from corpus-level resemblance, and the
  * short-document single-window degenerate case.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-winnow").toString
    val passage = "the quick brown fox jumps over the lazy dog while " +
      "seventeen astronomers catalogue a nebula in patient silence"
    Seq(
      // 10 and 11 share one long pasted passage inside unrelated text
      (10L, s"completely original opening words here. $passage and then an original ending"),
      (11L, s"a different beginning of its own. $passage closed by other prose entirely"),
      // 12 shares nothing beyond common short words
      (12L, "unrelated content about volcanic basalt columns cooling into hexagons"),
      // 13: shorter than one full window of shingles (single-window path)
      (13L, "tiny text"),
      (14L, "tiny text"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def pairs() =
    graft.SparkEntry.queries("q99_winnow_pairs")(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3))))
      .toMap

  test("a pasted passage yields a high-overlap pair; unrelated docs none") {
    val p = pairs()
    assert(p.contains((10L, 11L)), s"plagiarism pair missing: ${p.keySet}")
    val (shared, overlap) = p((10L, 11L))
    // the ~110-char passage spans ~100 shingle positions -> many windows
    assert(shared >= 5, s"expected many shared fingerprints, got $shared")
    assert(overlap > 0.0 && overlap <= 1.0)
    assert(!p.keySet.exists { case (a, b) => a == 12L || b == 12L },
      s"doc 12 shares no passage but paired: ${p.keySet}")
    spark.catalog.clearCache()
  }

  test("identical short docs pair through the single-window path") {
    // "tiny text" -> 2 shingles < window, so ONE fingerprint each;
    // identical text -> identical fingerprint, but n_shared=1 is below
    // the >=2 pair floor: the pair must NOT surface (by design — one
    // shared window is noise at corpus scale)
    val p = pairs()
    assert(!p.contains((13L, 14L)),
      "single shared fingerprint must stay under the pair floor")
    spark.catalog.clearCache()
  }
}
