package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic contracts of the KNN graph (q75) and semantic dedup (q76)
  * on the real test corpus:
  *
  *   - q75: at most k neighbors per vector, ranks are 1..k with strictly
  *     non-increasing cosine, neighbors are distinct, and the graph is
  *     candidate-symmetric (an edge's reverse pair was also scored — the
  *     directed union's contract).
  *   - q76: survivor minimality — NO two survivors in the same cell are
  *     near-duplicates (greedy min-id removes the larger of every
  *     qualifying pair, so the survivor set is duplicate-free even
  *     without transitivity), and the smallest vec_id of every cell
  *     always survives (nothing below it can remove it).
  */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("q75: per-vector rank/ordering/cardinality contract") {
    val rows = SparkEntry.queries("q75_knn_graph")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byVec = rows.groupBy(_._1)
    assert(byVec.nonEmpty)
    byVec.foreach { case (v, ns) =>
      assert(ns.length <= 3, s"vec $v has ${ns.length} neighbors")
      val sorted = ns.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to ns.length).toSeq)
      // cosine non-increasing down the ranks
      assert(sorted.map(_._4).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      }, s"vec $v ranks out of order")
      assert(ns.map(_._3).distinct.length === ns.length, s"vec $v dup neighbor")
      assert(ns.forall(_._3 != v), s"vec $v lists itself")
    }
    Caches.release(spark)
  }

  test("q76: survivors are pairwise non-duplicate; each cell keeps its min id") {
    import org.apache.spark.sql.functions._
    val survivors = SparkEntry.queries("q76_semantic_dedup")(spark, dir)
    val sv = survivors.collect().map(r => r.getLong(0) -> r.getLong(1))
    Caches.release(spark)
    // recompute in-cell cosines for the survivor set only (bounded here)
    val byCell = sv.groupBy(_._2)
    val emb = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    byCell.foreach { case (cell, members) =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        assert(cos(emb(ids(i)), emb(ids(j))) < 0.35,
          s"cell $cell keeps near-dup pair ${ids(i)},${ids(j)}")
    }
    // removed set is nonempty on this corpus (the threshold is exercised)
    assert(sv.length < emb.size)
  }

  test("q84: negatives never share the anchor's label; contract mirrors q75") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = SparkEntry.queries("q84_hard_negatives")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    Caches.release(spark)
    assert(rows.nonEmpty, "corpus must mine some negatives")
    rows.foreach { case (a, _, n, _) =>
      assert(labels(a) != labels(n), s"negative $n shares anchor $a's label")
      assert(a != n, s"anchor $a mined itself")
    }
    rows.groupBy(_._1).foreach { case (a, ns) =>
      assert(ns.length <= 2, s"anchor $a has ${ns.length} negatives")
      val sorted = ns.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to ns.length).toSeq)
      assert(sorted.map(_._4).toSeq.sliding(2).forall {
        case Seq(x, y) => x >= y; case _ => true
      }, s"anchor $a ranks out of order")
    }
  }

  test("q84: a planted other-label duplicate is the rank-1 negative") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-hardneg").toString
    // vecs 0 and 2 (label 0) are identical to vec 1 (label 1): each
    // mines the other-label twin at cosine 1. vec 3 shares label 1 but
    // points the other way — it can never outrank the planted twin.
    val u = (1 to 64).map(j => math.sin(j).toFloat)
    val w = (1 to 64).map(j => math.cos(j * 3).toFloat)
    Seq((0L, u, 0), (1L, u, 1), (2L, u, 0), (3L, w, 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val got = SparkEntry.queries("q84_hard_negatives")(spark, d).collect()
      .filter(_.getLong(1) == 1L) // rank-1 rows
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    Caches.release(spark)
    assert(got(0L)._1 == 1L && math.abs(got(0L)._2 - 1.0) < 1e-12)
    assert(got(2L)._1 == 1L && math.abs(got(2L)._2 - 1.0) < 1e-12)
    // vec 1's best other-label candidate is its identical twin vec 0
    // (tie with vec 2 at cos 1 breaks to the lower id)
    assert(got(1L)._1 == 0L && math.abs(got(1L)._2 - 1.0) < 1e-12)
  }
}
