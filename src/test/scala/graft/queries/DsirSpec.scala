package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q106 importance-weight semantics: documents speaking the TARGET
  * source's vocabulary must outscore documents speaking vocabulary the
  * target never uses, every document is re-admitted (empty/null text
  * included), and the weight unit is the integer-exact bits analogue
  * (corpus surprisal minus add-one-smoothed target surprisal).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dsir").toString
    rows.toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def weights(dir: String): Map[Long, (Long, Long)] =
    graft.SparkEntry.queries("q106_dsir_weights")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("target-vocabulary docs outscore foreign-vocabulary docs") {
    // src0 is the target: its vocabulary is {alpha}; doc 10 (from
    // another source) repeats that vocabulary, doc 11 speaks a token the
    // target never contains. With T=16, V=2, T_t=8: w(alpha) =
    // floor(log2(16/12)) - floor(log2(10/9)) = 0, w(omega) =
    // floor(log2(16/4)) - floor(log2(10/1)) = 2 - 3 = -1.
    val dir = write(Seq(
      (1L, "alpha alpha alpha alpha", "src0"),
      (2L, "alpha alpha alpha alpha", "src0"),
      (10L, "alpha alpha alpha alpha", "web"),
      (11L, "omega omega omega omega", "web")))
    val m = weights(dir)
    assert(m(10L)._2 > m(11L)._2,
      s"target-matching doc must score higher: $m")
    // both docs have 4 tokens; scores are per-doc integer bit sums
    assert(m(10L)._1 === 4L && m(11L)._1 === 4L)
    spark.catalog.clearCache()
  }

  test("empty and null docs are re-admitted with zero counts") {
    val dir = write(Seq(
      (1L, "alpha beta gamma", "src0"),
      (2L, null.asInstanceOf[String], "web"),
      (3L, "", "web")))
    val m = weights(dir)
    assert(m.keySet === Set(1L, 2L, 3L))
    assert(m(2L) === ((0L, 0L)))
    spark.catalog.clearCache()
  }

  test("hand-computed weights on a two-token corpus") {
    // corpus: T=8, tokens a (c=4) and b (c=4), V=2. target(src0): a a a a
    // -> T_t=4. bc(a)=bc(b)=floor(log2(8/4))=1.
    // bt(a)=floor(log2((4+2)/(4+1)))=floor(log2(1.2))=0 -> w(a)=1.
    // bt(b)=floor(log2((4+2)/(0+1)))=floor(log2(6))=2 -> w(b)=-1.
    val dir = write(Seq(
      (1L, "a a a a", "src0"),
      (2L, "b b b b", "web")))
    val m = weights(dir)
    assert(m(1L) === ((4L, 4L)))  // 4 tokens x w(a)=1
    assert(m(2L) === ((4L, -4L))) // 4 tokens x w(b)=-1
    spark.catalog.clearCache()
  }

  // ---------------------------------------------------------------- q109

  test("q109 hashed buckets coincide with q106's exact weights when collision-free") {
    // 6 distinct tokens into 1024 buckets land collision-free (the hash
    // is deterministic — this corpus IS collision-free, and the equality
    // below proves it: any collision would merge bucket counts and shift
    // a weight). There cc_b = cc(tok) and the non-empty bucket count
    // equals the vocabulary size, so every q109 statistic equals q106's.
    val rows = Seq(
      (1L, "alpha alpha alpha alpha", "src0"),
      (2L, "alpha beta beta gamma", "src0"),
      (10L, "alpha alpha alpha alpha", "web"),
      (11L, "omega omega omega omega", "web"),
      (12L, "beta gamma delta zeta", "web"),
      (13L, null.asInstanceOf[String], "web"))
    val dir = write(rows)
    def out(q: String): Map[Long, (Long, Long, Option[Double])] =
      graft.SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val exact = out("q106_dsir_weights")
    graft.Caches.release(spark)
    val hashed = out("q109_dsir_hashed")
    assert(hashed === exact)
    graft.Caches.release(spark)
  }

  // ---------------------------------------------------------------- q107

  test("q107 matches the reference cumsum over (importance DESC, doc_id)") {
    // texts drawn from a 4-word vocabulary at varied lengths and sources:
    // several importance rank groups, repeated (word, length) pairs so
    // groups hold multiple docs. The reference is the oracle's single
    // global window, evaluated locally over the (already spec'd) q106
    // weights — the selection machinery must reproduce it exactly.
    val rows = (0 until 30).map { i =>
      val src = if (i % 3 == 0) "src0" else "web"
      (i.toLong, (s"w${i % 4} " * (3 + i % 5)).trim, src)
    }
    val dir = write(rows)
    val w = graft.SparkEntry.queries("q106_dsir_weights")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._2 > 0)
    graft.Caches.release(spark)
    val budget = w.map(_._2).sum / 4
    var cum = 0L
    // the same IEEE division q106 emits, so rank doubles are bit-identical
    val want = w.map { case (id, n, s) => (id, n, s.toDouble / n.toDouble) }
      .sortBy { case (id, _, m) => (-m, id) }
      .flatMap { case (id, n, _) =>
        cum += n; if (cum <= budget) Some(id) else None }
      .toSet
    val got = graft.SparkEntry.queries("q107_dsir_select")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got === want)
    graft.Caches.release(spark)
  }

  test("q107 adversarial tie: one importance value — exact and distributed") {
    // identical text everywhere → per-token weights are global, so every
    // doc shares ONE mean: the whole selection is the boundary tie group.
    // 20 docs x 7 tokens = 140, budget 35 → exactly doc_ids 0..4. The
    // plan must still contain no single-partition stage (the tie cumsum
    // is range-split over doc_id buckets).
    val dir = write((0L until 20L).map(i =>
      (i, "uniform text of exactly seven small tokens",
        if (i % 2 == 0) "src0" else "web")))
    val df = graft.SparkEntry.queries("q107_dsir_select")(spark, dir)
    // unlike q58's blanket pin, q107's plan legitimately carries 1-row
    // scalar folds (q106's corpus/vocab/target totals) whose FINAL agg is
    // a bounded SinglePartition exchange — so pin the defect class
    // directly: no WINDOW may sort the world into one partition (a
    // single-partition window prints its Exchange within the sort child
    // lines directly below the Window node)
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toVector
    lines.zipWithIndex.filter(_._1.contains("Window ")).foreach { case (_, i) =>
      assert(!lines.slice(i + 1, i + 4).exists(_.contains("SinglePartition")),
        lines.slice(i, i + 4).mkString("\n"))
    }
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (0L until 5L))
    graft.Caches.release(spark)
  }

  test("q107 empty corpus selects nothing") {
    val dir = write(Seq.empty)
    assert(graft.SparkEntry.queries("q107_dsir_select")(spark, dir).count() === 0L)
    graft.Caches.release(spark)
  }
}
