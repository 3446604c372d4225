package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two plan properties bucketed staging buys, pinned against real
  * physical plans (broadcast disabled so the small test relations take
  * the code path a 100 TB fact-fact join takes):
  *
  *   1. a join between two tables bucketed on the join key with equal
  *      bucket counts has NO Exchange anywhere — the files already
  *      satisfy both sides' hash-distribution requirements;
  *   2. an equality filter on the bucket key prunes to ONE bucket at the
  *      scan (`SelectedBucketsCount: 1 out of N`).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("equal-bucket equi-join runs with zero Exchange operators") {
    import spark.implicits._
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val items = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select($"l_orderkey", $"l_quantity")
    Bucketing.stage(orders, "bkt_orders", "o_orderkey", 8)
    Bucketing.stage(items.withColumnRenamed("l_orderkey", "o_orderkey"),
      "bkt_items", "o_orderkey", 8)
    // one file per bucket — without the key-repartition inside stage,
    // every write task emits a file per bucket it holds (tasks × buckets
    // files, the small-file explosion Compaction exists to fix)
    val files = new java.io.File("spark-warehouse/bkt_orders").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.length == 8, s"expected 8 bucket files, got ${files.length}")
    try withNoBroadcast {
      val joined = spark.table("bkt_orders").join(spark.table("bkt_items"), "o_orderkey")
      val n = joined.count()
      assert(n > 0)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n${p.take(2000)}")
      // the same join over the unbucketed parquet shuffles BOTH sides —
      // the baseline that proves the assertion above is load-bearing
      val plain = orders.join(
        items.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      plain.count()
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_items")
    }
  }

  test("equality filter on the bucket key prunes to one bucket at the scan") {
    import spark.implicits._
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select($"o_orderkey", $"o_totalprice")
    Bucketing.stage(orders, "bkt_prune", "o_orderkey", 8)
    // the autoBucketedScan heuristic falls back to a plain scan when no
    // operator needs the bucket distribution — which also forfeits bucket
    // pruning. Pin the pruning behavior with the heuristic off (the
    // point-lookup shape is exactly when a reader disables it: one
    // bucket of IO beats scan parallelism).
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("bkt_prune").filter($"o_orderkey" === 42L)
      one.count()
      val p = one.queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"scan must prune to one bucket:\n${p.take(2000)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bkt_prune")
    }
  }
}
