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

  test("bucketCountFor: derived count grows across a 10x corpus, floors at 8, caps, and stays a power of two") {
    // the corpus-adaptive layout contract: a 10× corpus gets a larger
    // (power-of-two) layout, small corpora keep the historical floor of
    // 8 (every existing plan pin), and the cap bounds write-side file
    // count. Deterministic in the row count alone.
    assert(Bucketing.bucketCountFor(1000, targetRows = 100) == 16)
    assert(Bucketing.bucketCountFor(10000, targetRows = 100) == 128,
      "a 10x corpus must derive a different bucket count")
    assert(Bucketing.bucketCountFor(0) == 8 &&
      Bucketing.bucketCountFor(Bucketing.DefaultBucketRows * 8) == 8,
      "at-or-under target*min stays at the floor (bench-scale layouts unchanged)")
    assert(Bucketing.bucketCountFor(Long.MaxValue, targetRows = 1) == 4096,
      "the cap must bound the layout at any corpus")
    for (n <- Seq(1L, 999L, 123456L, 98765432L)) {
      val b = Bucketing.bucketCountFor(n, targetRows = 100)
      assert((b & (b - 1)) == 0, s"$b not a power of two for $n rows")
    }
  }

  test("a derived (non-default) bucket count still prunes to one bucket at the scan") {
    import spark.implicits._
    // 3000 rows at a 100-row target derive 32 buckets — the layout a
    // 10x-grown corpus would get; the equality prune must still read
    // exactly ONE of them (the mechanism the staged-index serves lean on
    // at every derived count, not just the floor)
    val rows = (1L to 3000L).map(i => (i, s"v$i")).toDF("k", "v")
    val nb = Bucketing.bucketCountFor(3000, targetRows = 100)
    assert(nb == 32, s"derivation changed: $nb")
    Bucketing.stage(rows, "bkt_adaptive", "k", nb)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("bkt_adaptive").filter($"k" === 42L)
      one.count()
      val p = one.queryExecution.executedPlan.toString
      assert(p.contains(s"SelectedBucketsCount: 1 out of $nb"),
        s"scan must prune to one of $nb buckets:\n${p.take(2000)}")
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS bkt_adaptive")
    }
  }

  test("rewriteInPlace recovers a crashed DROP->RENAME swap from the scratch table") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => (i, i * 10)).toDF("k", "v")
    Bucketing.stage(rows, "bkt_crash", "k", 8)
    try {
      // simulate the crash window: a completed rewrite parked under the
      // scratch name (here: rows with k <= 90), serve table dropped,
      // rename never ran
      Bucketing.stage(spark.table("bkt_crash").filter($"k" <= 90),
        "bkt_crash__rewrite", "k", 8)
      spark.sql("DROP TABLE `bkt_crash`")
      // the re-run's transform is the purge family's idempotent mask —
      // re-applying it to the recovered (already-transformed) rows is a
      // no-op, which is exactly the contract recovery relies on
      Bucketing.rewriteInPlace(spark, "bkt_crash",
        rel => rel.filter(rel("k") <= 90))
      assert(spark.catalog.tableExists("bkt_crash"),
        "recovery must restore the serve table")
      assert(!spark.catalog.tableExists("bkt_crash__rewrite"),
        "the completed re-run must consume the scratch table")
      assert(spark.table("bkt_crash").count() == 90,
        "recovered rewrite lost or duplicated rows")
      val spec = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("bkt_crash"))
        .bucketSpec
      assert(spec.exists(b => b.numBuckets == 8 &&
        b.bucketColumnNames == Seq("k")),
        s"recovery must preserve the bucket spec, got $spec")
      // and with NEITHER table present the call stays a harmless no-op
      spark.sql("DROP TABLE `bkt_crash`")
      Bucketing.rewriteInPlace(spark, "bkt_crash", identity)
      assert(!spark.catalog.tableExists("bkt_crash"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_crash")
      spark.sql("DROP TABLE IF EXISTS bkt_crash__rewrite")
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
