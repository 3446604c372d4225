package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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

  test("nearDedupBatch agrees with batch q27 pair semantics on the union corpus") {
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

  test("re-processing a batch admits nothing new (redelivery-safe)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-neardup-redeliver").toString
    val batch = Seq((0L, textA), (2L, textC)).toDF("doc_id", "text")
    val s1 = DocStream.processBatch(spark, batch, s"$base/index")
    assert(s1.count() == 2)
    val s2 = DocStream.processBatch(spark, batch, s"$base/index")
    assert(s2.count() == 0, "replayed batch must find itself in the index")
  }
}
