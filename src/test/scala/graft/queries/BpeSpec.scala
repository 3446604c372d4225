package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contract of q87's BPE merge induction on fixtures where the
  * merge table is hand-computable: frequency-weighted argmax with
  * lexicographic ties, a merged symbol participating as the LEFT of a
  * later round's pair, greedy non-overlapping merging inside a run of
  * identical symbols, and exhaustion before [[TextAnalysis.BpeRounds]]
  * when no pair remains.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-bpe").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(dir: String): Seq[(Long, String, String, Long)] = {
    val rows = SparkEntry.queries("q87_bpe_merges")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).sortBy(_._1).toSeq
    Caches.release(spark)
    rows
  }

  test("merge table: weighted argmax, then a merged symbol as a later pair's left") {
    // vocab: ab x3, abc x2, xy x1
    // round 1: (a,b) = 3 + 2 = 5 beats (b,c)=2, (x,y)=1
    // round 2: abc is now [ab, c] -> (ab,c) = 2 beats (x,y) = 1
    // round 3: only (x,y) = 1 remains
    val d = corpus(Seq("ab ab ab", "abc abc", "xy"))
    assert(run(d) === Seq((1L, "a", "b", 5L), (2L, "ab", "c", 2L),
      (3L, "x", "y", 1L)))
  }

  test("greedy non-overlap inside a run; exhaustion stops early") {
    // vocab: aaa x2. round 1: (a,a) counted per adjacent slot = 4; the
    // merge is greedy left-to-right so 'aaa' becomes [aa, a] (never
    // [a, aa] and never a double merge). round 2: (aa, a) = 2 ->
    // 'aaa' becomes [aaa]. round 3: no pairs anywhere -> the table
    // stops at two rows instead of padding a third.
    val d = corpus(Seq("aaa aaa"))
    assert(run(d) === Seq((1L, "a", "a", 4L), (2L, "aa", "a", 2L)))
  }

  test("lexicographic tie-break on equal counts") {
    // (z,w) and (b,a) both count 1; the lexicographically first pair
    // (b,a) must win round 1
    val d = corpus(Seq("zw ba"))
    val got = run(d)
    assert(got.head === ((1L, "b", "a", 1L)), got)
  }

  test("empty and degenerate corpus yield a defined empty/short table") {
    assert(run(corpus(Seq.empty)).isEmpty)
    // single-char words have no pairs at all
    assert(run(corpus(Seq("a b c"))).isEmpty)
  }
}
