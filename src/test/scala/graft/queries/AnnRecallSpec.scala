package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Quality regression bounds for the approximate similarity operators
  * against their exact baselines on sf0.01 — hash-match proves each
  * matches ITS OWN oracle; these prove the approximations stay USEFUL
  * (a quantizer regression that tanked recall would otherwise pass
  * correctness silently).
  */
class AnnRecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  private def run(q: String) = graft.SparkEntry.queries(q)(spark, dir)

  test("q35 IVF (k-means, nprobe=2/8) finds most of the exact top-10") {
    val exact = run("q29_ann_topk").collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = run("q35_ann_ivf").collect().map(_.getAs[Long]("vec_id")).toSet
    assert((ivf & exact).size >= 5, s"IVF recall collapsed: ${(ivf & exact).size}/10")
    spark.catalog.clearCache()
  }

  test("q30 single-band LSH ranks the query's own bucket sanely") {
    // single 6-plane family = deliberately low recall; the invariant is
    // that the query vector itself tops its bucket with cosine 1
    val rows = run("q30_ann_lsh").collect()
    val self = rows.find(_.getAs[Long]("vec_id") == 0L)
    assert(self.isDefined && math.abs(self.get.getAs[Double]("cos") - 1.0) < 1e-9)
  }

  test("q39 banded-LSH pairs are a subset of brute-force with recall >= 0.6") {
    val brute = run("q28_cosine_neardup").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val lsh = run("q39_cosine_neardup_lsh").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(lsh.subsetOf(brute), "LSH emitted a pair brute-force did not")
    assert(lsh.size.toDouble / brute.size >= 0.6,
      s"banded-LSH recall collapsed: ${lsh.size}/${brute.size}")
    spark.catalog.clearCache()
  }

  test("q39 still yields candidates at the bench corpus (bucket sizing holds)") {
    // regression: with 4-plane families (16 buckets) every bucket exceeded
    // the 50-doc cap at sf0.1's 2000 vectors and q39 returned ZERO rows —
    // bucket count must keep typical occupancy under the cap at the
    // largest corpus the bench runs
    val n = graft.SparkEntry.queries("q39_cosine_neardup_lsh")(
      spark, "/root/testdata/sf0.1").count()
    assert(n > 0, "bucket cap dropped every candidate at sf0.1")
    spark.catalog.clearCache()
  }
}
