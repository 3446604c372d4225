package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Incremental streaming near-dedup: batches dedup against the accumulated
  * sketch index (cross-batch) and greedily within themselves (within-batch),
  * with the index growing only by survivors. The contract mirrors q27's
  * pair semantics (shared band + hamming ≤ 8) applied against history.
  */
class DocNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // distinct contents far apart in simhash space; dups are verbatim copies
  private val textA = Seq.fill(5)("the quick brown fox jumps over the lazy dog").mkString(" ")
  private val textC = Seq.fill(5)("catalyst optimizes declarative plans into tungsten codegen").mkString(" ")
  private val textE = Seq.fill(5)("streaming watermarks bound state for unbounded sources").mkString(" ")

  test("survivors admit first-seen content; cross- and within-batch dups drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-neardup").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.runNearDedup(
      mem.toDF().toDF("doc_id", "ingest_ts", "text"),
      s"$base/index", s"$base/out", s"$base/ckpt")
    try {
      // batch 1: A admitted, B (=A, larger id) dropped within-batch, C admitted
      mem.addData((0L, ts(1), textA), (1L, ts(2), textA), (2L, ts(3), textC))
      q.processAllAvailable()
      // batch 2: D (=A) dropped against the INDEX, E admitted
      mem.addData((10L, ts(4), textA), (11L, ts(5), textE))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select("doc_id").as[Long].collect().toSet
      assert(out == Set(0L, 2L, 11L))
      // the index holds band rows for exactly the survivors
      val idx = spark.read.parquet(s"$base/index")
      assert(idx.select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 11L))
      // 32-bit sketch, 8-bit bands -> 4 band rows per admitted doc
      assert(idx.count() == 12)
    } finally q.stop()
  }

  test("index band-health card matches batch q116 over the accumulated survivors") {
    // the reband decision's signal: after two micro-batches the stream
    // index holds the survivors' band rows, and indexBandHealth over it
    // must equal q116 run on a corpus of exactly those survivors (same
    // sketch, same width here — bandWidthFor(3)=8 — same aggregate), so
    // ONE dashboard semantics serves both families
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-neardup-health").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.runNearDedup(
      mem.toDF().toDF("doc_id", "ingest_ts", "text"),
      s"$base/index", s"$base/out", s"$base/ckpt")
    try {
      mem.addData((0L, ts(1), textA), (1L, ts(2), textA), (2L, ts(3), textC))
      q.processAllAvailable()
      mem.addData((10L, ts(4), textA), (11L, ts(5), textE))
      q.processAllAvailable()
    } finally q.stop()
    def card(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[Long]("band") ->
        ((r.getAs[Long]("band_width"), r.getAs[Long]("n_buckets"),
          r.getAs[Long]("max_bucket"), r.getAs[Long]("n_capped"),
          r.getAs[Long]("docs_capped"), r.getAs[Long]("n_docs")))).toMap
    val got = card(DocStream.indexBandHealth(spark, s"$base/index", 8))
    val d = Files.createTempDirectory("graft-neardup-health-batch").toString
    Seq((0L, textA), (2L, textC), (11L, textE)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val want = card(graft.SparkEntry.queries("q116_band_health")(spark, d))
    assert(got === want, s"stream card $got diverged from batch q116 $want")
    // 3 distinct far-apart sketches: every band holds 3 singleton buckets
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    assert(got.values.forall(_ === ((8L, 3L, 1L, 0L, 0L, 3L))))
    spark.catalog.clearCache()
  }

  test("stream survivors agree with batch q27/q43 semantics on the union corpus") {
    // docs admitted across the two batches above = docs with no q27-style
    // partner of smaller id in the union corpus (in-order arrival makes
    // greedy == keep-component-min here)
    import spark.implicits._
    val d = Files.createTempDirectory("graft-neardup-batch").toString
    val docs = Seq((0L, textA), (1L, textA), (2L, textC), (10L, textA), (11L, textE))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$d/documents.parquet")
    val clusters = graft.SparkEntry.queries("q43_neardup_clusters")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val batchKept = clusters.collect { case (id, c) if id == c => id }.toSet
    assert(batchKept == Set(0L, 2L, 11L)) // same survivors as the stream
    spark.catalog.clearCache()
  }

  test("redelivery: committed batches no-op; an uncommitted recompute reproduces, never loses") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-redeliver").toString
    val batch = Seq((0L, textA), (2L, textC)).toDF("doc_id", "text")
    def outIds = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSeq.sorted
    DocStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L))
    // fully-committed replay: the marker short-circuits — no duplicates
    DocStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L))
    // crash simulation, the ADVICE failure shape: the index already holds
    // the batch's bands but the commit never landed. The recompute must
    // exclude its own epoch and overwrite IDENTICAL survivors — an
    // unguarded re-run would find itself in the index and emit nothing,
    // silently losing the batch
    Files.delete(java.nio.file.Paths.get(s"$base/index/_commits/0"))
    DocStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L), "recompute must reproduce the batch, not drop it")
    // and a later batch still dedups against the recovered index
    val b1 = Seq((10L, textA), (11L, textE)).toDF("doc_id", "text")
    DocStream.processBatch(spark, b1, 1L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L, 11L))
  }

  test("a mass-duplicate batch admits one representative (pre-band collapse)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-mass").toString
    // 500 verbatim copies in ONE batch: without the exact-sketch collapse
    // this is a 500-doc band bucket -> ~125k within-batch candidate pairs;
    // with it, banding sees 2 representatives
    val batch = ((0L until 500L).map(i => (i, textA)) :+ (999L, textC))
      .toDF("doc_id", "text")
    DocStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    val out = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 999L))
    // index holds band rows for exactly the two admitted docs
    assert(spark.read.parquet(s"$base/index").count() == 8)
  }

  test("null-text documents flow through a batch unharmed (always admitted)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-null").toString
    // a null sketch has null band keys: it can never equi-join anything,
    // so the doc is admitted — and it must not crash the prune-key
    // collect (getInt on a null g was a per-batch NPE)
    val batch = Seq((0L, textA), (1L, null.asInstanceOf[String]), (2L, textA))
      .toDF("doc_id", "text")
    DocStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    val out = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 1L), s"null-text doc must survive: $out")
    // and the next batch still dedups against the index normally
    DocStream.processBatch(spark,
      Seq((10L, textA), (11L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      1L, s"$base/index", s"$base/out")
    val out2 = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(out2 == Set(0L, 1L, 11L))
  }

  test("rebandIndex refuses an index with uncommitted epochs") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-quiesce").toString
    DocStream.processBatch(spark,
      Seq((0L, textA), (2L, textC)).toDF("doc_id", "text"),
      0L, s"$base/index", s"$base/out")
    // simulate a crash after the index write but before the marker
    Files.delete(java.nio.file.Paths.get(s"$base/index/_commits/0"))
    val e = intercept[IllegalArgumentException] {
      DocStream.rebandIndex(spark, s"$base/index", s"$base/im", 16)
    }
    assert(e.getMessage.contains("uncommitted"), e.getMessage)
  }

  test("a batch's index scan reads only its own (b, g) band partitions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-prune").toString
    val idx = s"$base/index"
    DocStream.processBatch(spark,
      Seq((0L, textA), (2L, textC)).toDF("doc_id", "text"), 0L, idx, s"$base/out")
    DocStream.processBatch(spark,
      Seq((11L, textE)).toDF("doc_id", "text"), 1L, idx, s"$base/out")
    // one (b, g) group actually present: doc 0's band 0
    val full = spark.read.parquet(idx)
    val g0 = full.filter(col("doc_id") === 0L && col("b") === 0)
      .select("g").as[Int].head()
    val pruned = DocStream.prunedIndex(spark, idx, 99L, Seq((0, g0)))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val readFiles = scan.metrics("numFiles").value
    def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val st = java.nio.file.Files.walk(p)
      try st.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
      finally st.close()
    }
    val total = parquetFiles(java.nio.file.Paths.get(idx)).size
    val matching = parquetFiles(java.nio.file.Paths.get(idx))
      .count(_.toString.contains(s"/b=0/g=$g0/"))
    assert(matching > 0 && matching < total, s"fixture degenerate: $matching/$total")
    assert(readFiles == matching,
      s"scan read $readFiles files; only the $matching under b=0/g=$g0 (of $total) are allowed")
  }

  test("rebandIndex migration behaves identically to a natively-built wider index") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-reband").toString
    val b0 = Seq((0L, textA), (2L, textC)).toDF("doc_id", "text")
    DocStream.processBatch(spark, b0, 0L, s"$base/i8", s"$base/o8") // width 8
    DocStream.rebandIndex(spark, s"$base/i8", s"$base/im", newBandWidth = 16)
    DocStream.processBatch(spark, b0, 0L, s"$base/in", s"$base/on", bandWidth = 16)
    def rows(p: String) = spark.read.parquet(p)
      .select("doc_id", "simhash", "b", "bk")
      .as[(Long, Long, Int, Long)].collect().toSet
    assert(rows(s"$base/im") == rows(s"$base/in"),
      "migrated band rows must equal a from-scratch width-16 banding of the same sketches")
    // commit markers migrate: replaying committed batch 0 at the new path no-ops
    DocStream.processBatch(spark, b0, 0L, s"$base/im", s"$base/om", bandWidth = 16)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$base/om")))
    // the stream continues against the migrated index exactly as against
    // the native one: next batch drops the near-dup, admits the novel doc
    val b1 = Seq((10L, textA), (11L, textE)).toDF("doc_id", "text")
    DocStream.processBatch(spark, b1, 1L, s"$base/im", s"$base/om", bandWidth = 16)
    DocStream.processBatch(spark, b1, 1L, s"$base/in", s"$base/on", bandWidth = 16)
    def out(p: String) = spark.read.parquet(p)
      .filter(col("batch_id") === 1).select("doc_id").as[Long].collect().toSet
    assert(out(s"$base/om") == Set(11L))
    assert(out(s"$base/on") == Set(11L))
  }
}
