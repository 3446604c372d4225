package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q55 — Bloom admission probe. Hash-parity is the Verify gate; these pin
  * the filter's defining guarantees and the aggregate's distributed
  * correctness (a buggy merge would still hash-match if both engines
  * dropped the same bits — the local-OR comparison catches it
  * independently).
  */
class BloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("q55: no false negatives; false-positive rate within the geometry bound") {
    val rows = graft.SparkEntry.queries("q55_bloom_admitted")(
        spark, "/root/testdata/sf0.01")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("admitted"),
        r.getAs[Boolean]("maybe_admitted")))
    assert(rows.length == 500)
    val (admitted, rejected) = rows.partition(_._2)
    assert(admitted.nonEmpty && rejected.nonEmpty, "fixture degenerate")
    // Bloom's hard guarantee: every admitted document probes true
    admitted.foreach { case (id, _, maybe) =>
      assert(maybe, s"doc $id admitted but probes false — false negative")
    }
    // 3 hashes / 4096 bits at n<=500 admitted: fp ~(1-e^(-3n/4096))^3 <~ 4%;
    // 15% is the generous outer bound that still catches a saturated filter
    val fp = rejected.count(_._3).toDouble / rejected.size
    assert(fp <= 0.15, s"false-positive rate $fp — filter saturated or broken")
    spark.catalog.clearCache()
  }

  test("BloomBitsAgg distributed build equals the local OR of all positions") {
    import spark.implicits._
    val positions = Seq.tabulate(1000)(i =>
      Array((i * 31L) % 4096, (i * 97L) % 4096, (i * 193L) % 4096))
    val got = positions.toDF("ps").repartition(8)
      .agg(graft.functions.SketchFunctions.bloomBits(
        org.apache.spark.sql.functions.col("ps"), 64).as("bloom"))
      .collect()(0).getSeq[Long](0)
    val want = new Array[Long](64)
    positions.flatten.foreach(p => want((p >> 6).toInt) |= 1L << (p & 63))
    assert(got == want.toSeq, "partition merge lost or invented bits")
  }
}
