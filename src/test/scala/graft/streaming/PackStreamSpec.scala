package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sequence packing (the q72 dual): chunk ids continue across
  * micro-batches through the persistent cursor — a chunk straddling a
  * batch boundary is continued, not restarted — so a corpus streamed in
  * arrival order re-aggregates to EXACTLY the batch q72 profile; a
  * committed batch's redelivery is a no-op; a crash before the marker
  * recomputes identically (the cursor read is strictly-before).
  */
class PackStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 37-token docs: 512/37 is fractional, so every few docs straddle a
  // chunk boundary — including across batch boundaries below
  private def doc(i: Long): (Long, String) =
    (i, Seq.fill(37)("tok").mkString(" "))

  test("streamed corpus re-aggregates to the batch q72 profile, cursor continues mid-chunk") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-packstream").toString
    // the same corpus as a batch table, for the oracle side
    val corpusDir = Files.createTempDirectory("graft-packcorpus").toString
    (0L until 100L).map(doc).toDF("doc_id", "text")
      .write.parquet(s"$corpusDir/documents.parquet")

    val mem = MemoryStream[(Long, String)]
    val q = PackStream.runPacking(
      mem.toDF().toDF("doc_id", "text"), s"$base/pack", s"$base/ckpt")
    try {
      // three arrival-ordered batches; 40×37=1480 tokens is not a
      // multiple of 512, so batch 2 starts mid-chunk
      mem.addData((0L until 40L).map(doc): _*)
      q.processAllAvailable()
      mem.addData((40L until 80L).map(doc): _*)
      q.processAllAvailable()
      mem.addData((80L until 100L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    // incl. `cum`: the cursor-continued stream prefix sum must equal the
    // batch operator's corpus-order prefix sum doc-for-doc
    val epochs = spark.read.parquet(s"$base/pack")
      .select("doc_id", "n_tokens", "chunk_id", "last_chunk", "cum")
    // doc 40 (first of batch 2) continues chunk 2 (1480 div 512), which
    // batch 1's doc 39 started — the cursor carried mid-chunk state
    val d40 = epochs.filter($"doc_id" === 40L).head()
    assert(d40.getAs[Long]("chunk_id") === 1480L / 512L)
    // per-doc assignments equal the batch operator's on the whole corpus
    val batchAssigned = graft.queries.Curation.packAssignments(
      (0L until 100L).map(doc).toDF("doc_id", "text")
        .select($"doc_id",
          org.apache.spark.sql.functions.size(
            graft.functions.TextFunctions.tokens($"text")).cast("long")
            .as("n_tokens")),
      0L)
    assert(epochs.collect().map(_.toSeq).toSet ===
      batchAssigned.collect().map(_.toSeq).toSet)
    // and the re-aggregated profile equals q72 on the same corpus table
    val streamProfile = graft.queries.Curation.packProfile(epochs)
      .collect().map(_.toSeq).toSet
    val q72 = SparkEntry.queries("q72_sequence_pack")(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    assert(streamProfile === q72)
    // the shard DEAL is stable under streaming append: chunk ids are
    // cursor-continued, so shard = chunk mod K assigns each
    // already-written chunk once and forever — the per-shard plan folded
    // from the streamed assignments equals batch q123 on the same corpus
    val cap = 512L
    val shardFold = epochs.collect().flatMap { r =>
      val ds = r.getAs[Long]("cum") - r.getAs[Long]("n_tokens")
      val de = r.getAs[Long]("cum")
      (r.getAs[Long]("chunk_id") to r.getAs[Long]("last_chunk")).map { ch =>
        (ch % 8L, ch, r.getAs[Long]("doc_id"),
          math.min(de, (ch + 1) * cap) - math.max(ds, ch * cap))
      }
    }
    val wantShards = shardFold.groupBy(_._1).map { case (sh, xs) =>
      (sh, xs.map(_._2).distinct.length.toLong,
        xs.map(_._3).distinct.length.toLong, xs.map(_._4).sum)
    }.toSet
    val q123 = SparkEntry.queries("q123_shard_plan")(spark, corpusDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(q123 === wantShards)
    // the incrementally-producible manifest equals batch q119 verbatim:
    // manifestRows is a narrow map over the cursor-continued assignments
    val streamManifest = PackStream.manifest(epochs)
      .collect().map(_.toSeq).toSet
    val q119 = SparkEntry.queries("q119_pack_manifest")(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    assert(streamManifest === q119)
    graft.Caches.release(spark)
  }

  test("committed redelivery is a no-op; a crash before the marker recomputes identically") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-packredeliver").toString
    val pack = s"$base/pack"
    val b0 = (0L until 10L).map(doc).toDF("doc_id", "text")
    val b1 = (10L until 20L).map(doc).toDF("doc_id", "text")
    PackStream.processBatch(spark, b0, 0L, pack)
    PackStream.processBatch(spark, b1, 1L, pack)
    val before = spark.read.parquet(pack).collect().toSet
    val cursorBefore2 = PackStream.cursorBefore(spark, pack, 2L)
    assert(cursorBefore2 === 20L * 37L)
    // committed replays change nothing — data or cursor
    PackStream.processBatch(spark, b0, 0L, pack)
    PackStream.processBatch(spark, b1, 1L, pack)
    assert(spark.read.parquet(pack).collect().toSet === before)
    assert(PackStream.cursorBefore(spark, pack, 2L) === cursorBefore2)

    // crash simulation: batch 2 wrote data + its cursor file but died
    // BEFORE the marker — which also means before the post-commit prune,
    // so batch 1's cursor file is still live. Reconstruct exactly that
    // state (run the batch, then remove the marker and restore the
    // pre-prune cursor file); redelivery must reproduce the identical
    // epoch via the strictly-before cursor read, not double-advance off
    // batch 2's own file
    val b2 = (20L until 30L).map(doc).toDF("doc_id", "text")
    PackStream.processBatch(spark, b2, 2L, pack)
    val committed = spark.read.parquet(pack).collect().toSet
    val fs = new org.apache.hadoop.fs.Path(pack)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$pack/_commits/2"), false)
    fs.create(new org.apache.hadoop.fs.Path(s"$pack/_cursor/1=${20L * 37L}"),
      true).close()
    PackStream.processBatch(spark, b2, 2L, pack)
    assert(spark.read.parquet(pack).collect().toSet === committed)
    assert(PackStream.cursorBefore(spark, pack, 3L) === 30L * 37L)
    // the cursor stays ONE live file (superseded files pruned at commit)
    assert(fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$pack/_cursor")).length === 1)
  }

  test("collapseEvery bounds marker count; collapsed batches stay committed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-packcollapse").toString
    val pack = s"$base/pack"
    val mem = MemoryStream[(Long, String)]
    val q = PackStream.runPacking(
      mem.toDF().toDF("doc_id", "text"), pack, s"$base/ckpt",
      collapseEvery = 2)
    try {
      mem.addData((0L until 5L).map(doc): _*)
      q.processAllAvailable() // batch 0
      mem.addData((5L until 10L).map(doc): _*)
      q.processAllAvailable() // batch 1 → collapse through 1
      mem.addData((10L until 15L).map(doc): _*)
      q.processAllAvailable() // batch 2: fresh individual marker
    } finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(pack)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val markers = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$pack/_commits")).map(_.getPath.getName)
    assert(markers.toSet === Set("compacted_through=1", "2"), markers.mkString(","))
    // a collapsed batch's redelivery is still a no-op: the data and
    // cursor are unchanged by a replay of batch 0
    val before = spark.read.parquet(pack).collect().toSet
    val cur = PackStream.cursorBefore(spark, pack, 3L)
    PackStream.processBatch(spark, (0L until 5L).map(doc).toDF("doc_id", "text"),
      0L, pack)
    assert(spark.read.parquet(pack).collect().toSet === before)
    assert(PackStream.cursorBefore(spark, pack, 3L) === cur)
  }
}
