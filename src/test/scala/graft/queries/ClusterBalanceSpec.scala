package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q101 cluster-balanced sampling: a skewed two-domain corpus flattens
  * to the ceil-mean cap — the over-represented cluster downsamples, the
  * small cluster survives whole — and the admitted set is deterministic
  * across runs (hash-rank admission, no RNG).
  */
class ClusterBalanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // two orthogonal directions with varying magnitudes: ids 0 and 5 lie
  // along e2 (the rare domain — both land in the quantizer's training
  // sample, so a cell exists for their direction); the other 42 lie
  // along e1 (the dominant domain). Cosine assignment is unambiguous
  // (1 vs 0), so the balanced shape is exactly computable: 2 assigned
  // cells, cap = ceil(44/2) = 22 -> the e1 cluster keeps 22 of 42, the
  // e2 cluster keeps both members.
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-balance").toString
    val rows = (0L until 44L).map { i =>
      val rare = i == 0L || i == 5L
      val axis = if (rare) 1 else 0
      val mag = (i % 7 + 1).toFloat
      (i, Seq.tabulate(64)(j => if (j == axis) mag else 0f), s"label$i")
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def run(): Array[(Long, Long, Long)] =
    graft.SparkEntry.queries("q101_cluster_balanced")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("skewed domains flatten to the ceil-mean cap; small domains survive whole") {
    val out = run()
    val byCell = out.groupBy(_._2)
    assert(byCell.size === 2, s"expected 2 assigned cells: $byCell")
    val sizes = byCell.values.map(_.length).toSeq.sorted
    assert(sizes === Seq(2, 22), s"expected (2, 22): $sizes")
    // the rare domain survives whole
    val rareCell = byCell.values.find(_.length == 2).get
    assert(rareCell.map(_._1).toSet === Set(0L, 5L))
    // ranks are dense from 1 within each cell
    byCell.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    spark.catalog.clearCache()
  }

  test("admission is deterministic across runs") {
    val a = run().sortBy(_._1)
    spark.catalog.clearCache()
    val b = run().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    spark.catalog.clearCache()
  }

  test("q117 reads the skew the balancer flattens: (2, 42) members, shares sum to 1") {
    val rows = graft.SparkEntry.queries("q117_ivf_health")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    spark.catalog.clearCache()
    assert(rows.map(_._2).sorted.toSeq === Seq(2L, 42L))
    // trained cell count is one constant across rows, at least the
    // assigned count (dead centroids legal)
    assert(rows.map(_._3).toSet.size === 1 && rows.head._3 >= 2L)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12)
  }
}
