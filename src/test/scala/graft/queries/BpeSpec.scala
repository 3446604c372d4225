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

  test("q90 encode: per-doc counts under the trained merge table") {
    // vocab: ab x3, abc x2, xy x1, abx x1
    // round 1: (a,b) = 3+2+1 = 6; round 2: (ab,c) = 2;
    // round 3: (ab,x) = 1 ties (x,y) = 1, lex "ab" < "x" -> (ab,x).
    // encoded: ab->1 sym, abc->1, abx->1, xy->2 (never merged)
    val d = corpus(Seq("ab ab ab", "abc abc", "xy", "abx"))
    val got = SparkEntry.queries("q90_bpe_encode")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    Caches.release(spark)
    assert(got === Seq((0L, 3L, 3L), (1L, 2L, 2L), (2L, 1L, 2L),
      (3L, 1L, 1L)))
  }

  test("q126 fertility: per-source trained-token cost over q90's encode") {
    // the q90 fixture split across two sources (+ a null-text doc that
    // must not count — an EMPTY string is one "" token under the shared
    // tokenizer, so null is the true zero-word case): encoded ab->1,
    // abc->1, abx->1, xy->2, so
    // A: 2 docs, 5 words -> 5 tokens (fertility exactly 1000);
    // B: 2 docs, 2 words -> 3 tokens (fertility 1500)
    import spark.implicits._
    val d = Files.createTempDirectory("graft-bpe").toString
    Seq((0L, "ab ab ab", "A"), (1L, "abc abc", "A"),
        (2L, "xy", "B"), (3L, "abx", "B"), (4L, null.asInstanceOf[String], "B"))
      .toDF("doc_id", "text", "source").write.parquet(s"$d/documents.parquet")
    val got = SparkEntry.queries("q126_tokenizer_fertility")(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    Caches.release(spark)
    assert(got === Map("A" -> ((2L, 5L, 5L, 1000L)),
      "B" -> ((2L, 2L, 3L, 1500L))))
  }

  test("64-round training: checkpoint cadence bounds plan depth") {
    // one word of 68 distinct symbols (ASCII 33..126 minus uppercase,
    // which tokens() would lowercase-collide): every pair counts 1, so
    // the lexicographic tie-break merges the accumulating PREFIX with
    // the next char each round — round r's lhs is the first r chars.
    val word = (33 to 126).map(_.toChar).filterNot(_.isUpper).mkString
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val vocab = Seq(word).toDF("word")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("s", regexp_replace(col("word"), "(.)", TextAnalysis.BpeD + "$1" + TextAnalysis.BpeD))
    // driverVocabCap = 0 forces the DISTRIBUTED path — this test pins
    // the per-round job shape's lineage bound, which the driver fast
    // path (tested below) never builds
    val (merges, rep) = TextAnalysis.bpeTrain(vocab, 64, driverVocabCap = 0L)
    assert(merges.length === 64)
    assert(merges.last === ((64L, word.take(64), word(64).toString, 1L)))
    // 64 merges over a 68-symbol word leave 4 symbols (evaluate BEFORE
    // release — the final rep is checkpoint-backed by design)
    val syms = rep.select(
      size(filter(split(col("s"), TextAnalysis.BpeD), x => x =!= ""))).head.getInt(0)
    assert(syms === word.length - 64)
    // the replace chain above the last checkpoint is at most the cadence
    // deep — NOT 64 Projects over the original vocabulary scan
    def depth(p: org.apache.spark.sql.catalyst.trees.TreeNode[_]): Int =
      1 + (if (p.children.isEmpty) 0
           else p.children.map(c =>
             depth(c.asInstanceOf[org.apache.spark.sql.catalyst.trees.TreeNode[_]])).max)
    val d = depth(rep.queryExecution.analyzed)
    assert(d <= TextAnalysis.BpeCheckpointEvery + 4,
      s"analyzed plan depth $d — checkpoint cadence not bounding lineage?")
    Caches.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "BPE training leaked persistent blocks past release")
  }

  private def directVocab(words: Seq[(String, Long)]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    words.toDF("word", "n").withColumn("s",
      regexp_replace(col("word"), "(.)",
        TextAnalysis.BpeD + "$1" + TextAnalysis.BpeD))
  }

  test("driver and distributed trainers produce identical merges and representations") {
    // a multi-word frequency-weighted vocabulary with genuine pair
    // sharing (random 26-letter words collide on bigrams), trained 64
    // rounds through BOTH paths — the fast path's contract is
    // bit-identical output, including the UTF8-byte tie-break and the
    // greedy left-to-right replace
    val rnd = new scala.util.Random(42)
    val words = Seq.fill(8)(
      (1 to 12).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .distinct.zipWithIndex.map { case (w, i) => (w, (i % 5 + 1).toLong) }
    val vocab = directVocab(words)
    val (dm, drep) = TextAnalysis.bpeTrain(vocab, 64) // ≤ cap: driver path
    val (xm, xrep) = TextAnalysis.bpeTrain(vocab, 64, driverVocabCap = 0L)
    assert(dm === xm, "merge tables diverged between the two paths")
    def repMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(repMap(drep) === repMap(xrep),
      "final representations diverged between the two paths")
    Caches.release(spark)
  }

  test("driver fast path: 1060 merge rounds cost a constant number of Spark actions") {
    // the production-vocab shape the fast path exists for: a ~32k-merge
    // run must not pay one job per round. 1100 ASCENDING distinct
    // symbols (the 64-round test's prefix-accumulation structure, so
    // the whole run is hand-predictable) through 1060 rounds: the job
    // count must stay at the proof-count + collect (+ AQE helpers) —
    // independent of the round count.
    val word = (0x100 until 0x100 + 1100).map(_.toChar).mkString
    val vocab = directVocab(Seq((word, 1L)))
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val (merges, rep) = try {
      val out = TextAnalysis.bpeTrain(vocab, 1060)
      var last = -1
      var spins = 0
      while (jobs != last && spins < 50) { last = jobs; Thread.sleep(100); spins += 1 }
      out
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs <= 6,
      s"driver-side training launched $jobs jobs — a per-round action crept back in?")
    assert(merges.length === 1060)
    // ascending distinct symbols: round r merges the accumulated prefix
    // with the next char, count always 1 (the 64-round structure)
    assert(merges.last === ((1060L, word.take(1060), word(1060).toString, 1L)))
    import org.apache.spark.sql.functions._
    val syms = rep.select(
      size(filter(split(col("s"), TextAnalysis.BpeD), x => x =!= ""))).head.getInt(0)
    assert(syms === word.length - 1060)
    Caches.release(spark)
  }
}
