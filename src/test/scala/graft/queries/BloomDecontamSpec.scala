package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q102 bloom decontamination vs the q57 exact join: the one-sided-error
  * contract. A bloom filter never false-negatives, so every exactly
  * contaminated doc MUST be flagged and every per-doc maybe-count MUST
  * dominate the exact overlap; false positives exist by design and stay
  * rare at this corpus's eval-gram mass.
  */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom flags dominate exact flags; false positives stay bounded") {
    val exact = graft.SparkEntry.queries("q57_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()
    val bloom = graft.SparkEntry.queries("q102_bloom_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.catalog.clearCache()

    assert(bloom.keySet === exact.keySet, "both see every train doc")
    // no false negatives: maybe-count dominates the exact overlap per doc
    exact.foreach { case (id, n) =>
      assert(bloom(id) >= n, s"doc $id: bloom ${bloom(id)} < exact $n")
    }
    // false positives bounded: among docs with ZERO exact overlap, at
    // most 20% may bloom-flag at this eval-gram mass (measured ~0)
    val clean = exact.filter(_._2 == 0L).keySet
    val fp = clean.count(id => bloom(id) > 0)
    assert(fp <= math.max(1, clean.size / 5), s"$fp false positives of ${clean.size}")
  }
}
