package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental streaming MEDIA near-dedup: q92's dHash pair semantics
  * applied against history through the shared text-stream index protocol
  * — batches dedup against the accumulated sketch index (cross-batch)
  * and greedily within themselves (within-batch), the index growing only
  * by survivors.
  */
class MediaNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // ≥72-char payloads (the full pixel plane is content-determined, no
  // wrap aliasing) with structurally different content; the near-dup
  // changes ONE character, flipping ≤2 dHash bits (see MediaSpec)
  private val payA = ("the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong tea").take(80)
  private val payAnear = payA.updated(40, 'x')
  private val payC = ("catalyst optimizes declarative plans into tungsten " +
    "codegen while scans prune columns").take(80)
  private val payE = ("streaming watermarks bound state for unbounded " +
    "sources and sinks commit exactly once").take(80)

  test("media survivors admit first-seen pixels; near-dups drop; empty payloads pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-medianeardup").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = MediaStream.runNearDedup(
      mem.toDF().toDF("media_id", "ingest_ts", "payload"),
      s"$base/index", s"$base/out", s"$base/ckpt")
    try {
      // batch 1: A admitted; its one-pixel near-dup dropped within-batch;
      // C admitted; the empty payload has a null sketch — always admitted
      mem.addData((0L, ts(1), payA), (1L, ts(2), payAnear),
        (2L, ts(3), payC), (3L, ts(4), ""))
      q.processAllAvailable()
      // batch 2: a verbatim A-copy drops against the INDEX; E admits
      mem.addData((10L, ts(5), payA), (11L, ts(6), payE))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select("doc_id").as[Long].collect().toSet
      assert(out == Set(0L, 2L, 3L, 11L))
      // the index holds band rows for exactly the non-null-sketch
      // survivors: 64-bit sketch, 16-bit bands -> 4 rows per doc
      val idx = spark.read.parquet(s"$base/index")
      assert(idx.select("doc_id").as[Long].collect().toSet == Set(0L, 2L, 11L))
      assert(idx.count() == 12)
    } finally q.stop()
  }

  test("stream survivors agree with greedy min-keep over batch q92 pairs") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-medianeardup-batch").toString
    Seq((0L, payA), (1L, payAnear), (2L, payC), (10L, payA), (11L, payE))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val pairs = graft.SparkEntry.queries("q92_media_phash")(spark, d)
      .collect().map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b")))
    spark.catalog.clearCache()
    // greedy in-id-order keep: drop any id with a kept smaller partner
    val dropped = scala.collection.mutable.Set[Long]()
    for ((a, b) <- pairs.sortBy(_._2) if !dropped(a)) dropped += b
    val kept = Set(0L, 1L, 2L, 10L, 11L) -- dropped
    assert(kept == Set(0L, 2L, 11L),
      s"batch pair semantics diverged from the stream's survivors: $kept")
  }

  test("media redelivery: a committed batch no-ops, never duplicates") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-medianeardup-redeliver").toString
    val batch = Seq((0L, payA), (2L, payC)).toDF("media_id", "payload")
    def outIds = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSeq.sorted
    MediaStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L))
    MediaStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L))
    // a later batch near-duplicating an indexed payload drops against it
    val batch2 = Seq((5L, payA.updated(40, 'q')), (6L, payE))
      .toDF("media_id", "payload")
    MediaStream.processBatch(spark, batch2, 1L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L, 6L))
  }
}
