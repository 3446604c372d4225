package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** q70 Z-order clustering statistics — the properties that make the
  * Morton key a LAYOUT primitive rather than a party trick:
  *
  *  - the z-prefix envelope bound: a bucket fixes the top 2 bits of
  *    BOTH dimensions, so every bucket's (max−min) on each dimension is
  *    ≤ 2^(ZBits−2) − 1 = 63 — the narrow per-file min/max stats that
  *    multi-dimensional pruning feeds on;
  *  - the key actually discriminates at test scale (several buckets
  *    populated, else the envelope bound is vacuous);
  *  - partition-of-the-space: bucket counts sum to the table count;
  *  - plan shape: one narrow projection and exactly ONE Exchange (the
  *    aggregate's) — the interleave is per-row bit math, never a
  *    shuffle or a window.
  */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("q70_zorder_stats")(spark, dir).collect()

  test("every z-prefix bucket bounds BOTH dimensions within 64") {
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (minX, maxX) = (r.getLong(2), r.getLong(3))
      val (minY, maxY) = (r.getLong(4), r.getLong(5))
      assert(maxX - minX <= 63, s"bucket ${r.getLong(0)} x-envelope too wide")
      assert(maxY - minY <= 63, s"bucket ${r.getLong(0)} y-envelope too wide")
      // and the envelope sits inside the quadrant the prefix names:
      // bucket = x7 y7 x6 y6 ⇒ x's top-2 bits are (bit3, bit1) of bucket
      val b = r.getLong(0)
      val xq = (((b >> 3) & 1) << 1 | ((b >> 1) & 1)) << 6
      val yq = (((b >> 2) & 1) << 1 | (b & 1)) << 6
      assert(minX >= xq && maxX < xq + 64, s"bucket $b x outside quadrant")
      assert(minY >= yq && maxY < yq + 64, s"bucket $b y outside quadrant")
    }
  }

  test("the key discriminates: multiple buckets, counts partition the table") {
    assert(rows.length >= 4, "8-bit dims over sf0.001 must spread buckets")
    val total = spark.read
      .parquet(s"$dir/orders.parquet").count()
    assert(rows.map(_.getLong(1)).sum == total)
  }

  test("plan: per-row bit math, exactly one Exchange, two-phase agg, no window") {
    val p = SparkEntry.queries("q70_zorder_stats")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_"))
    assert(!p.contains("Window"))
    assert(!p.contains("Exchange rangepartitioning"))
  }
}
