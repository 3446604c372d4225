package graft.streaming

import graft.SparkTestSession
import java.nio.file.{Files, Path => JPath, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Epoch compaction of the streaming sketch/vector indexes: merged
  * epochs answer identically to the epoch-per-batch layout (index rows
  * feed only semi-join lookups), file and marker counts drop to the
  * compaction cadence bound, every crash prefix leaves a readable
  * correct index, and the in-stream cadence hook keeps a live stream's
  * epoch count bounded without stopping it.
  */
class CompactIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val textA = Seq.fill(5)("the quick brown fox jumps over the lazy dog").mkString(" ")
  private val textC = Seq.fill(5)("catalyst optimizes declarative plans into tungsten codegen").mkString(" ")
  private val textE = Seq.fill(5)("streaming watermarks bound state for unbounded sources").mkString(" ")
  private val textF = Seq.fill(5)("broadcast joins keep the small side off the shuffle").mkString(" ")

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private def parquetFiles(p: String): Seq[JPath] = {
    val st = Files.walk(Paths.get(p))
    try st.toArray.toSeq.map(_.asInstanceOf[JPath])
      .filter(_.toString.endsWith(".parquet"))
    finally st.close()
  }

  private def copyDir(from: JPath, to: JPath): Unit = {
    val st = Files.walk(from)
    try st.toArray.toSeq.map(_.asInstanceOf[JPath]).foreach { src =>
      val dst = to.resolve(from.relativize(src))
      if (Files.isDirectory(src)) Files.createDirectories(dst)
      else { Files.createDirectories(dst.getParent); Files.copy(src, dst) }
    } finally st.close()
  }

  private def indexRows(p: String): Set[(Long, Long, Int, Long, Int)] = {
    import spark.implicits._
    spark.read.parquet(p).select("doc_id", "simhash", "b", "bk", "g")
      .as[(Long, Long, Int, Long, Int)].collect().toSet
  }

  private def outIds(p: String): Set[Long] = {
    import spark.implicits._
    spark.read.parquet(p).select("doc_id").as[Long].collect().toSet
  }

  /** Three batches with cross-batch dups, into a fresh index/out pair. */
  private def buildThreeEpochs(idx: String, out: String): Unit = {
    import spark.implicits._
    DocStream.processBatch(spark,
      Seq((0L, textA), (1L, textC)).toDF("doc_id", "text"), 0L, idx, out)
    DocStream.processBatch(spark,
      Seq((10L, textA), (11L, textE)).toDF("doc_id", "text"), 1L, idx, out)
    DocStream.processBatch(spark,
      Seq((20L, textE), (21L, textF)).toDF("doc_id", "text"), 2L, idx, out)
  }

  /** Three 40-doc epochs of token-disjoint documents (plus one verbatim
    * cross-epoch dup per epoch): ~160 band rows per epoch over the 256
    * (b, g) slots saturates the slot space, so epochs MUST overlap in
    * groups — the pre-compaction layout holds one file per (epoch,
    * group) while the compacted layout holds one per group.
    */
  private def buildBigEpochs(idx: String, out: String): Unit = {
    import spark.implicits._
    (0 until 3).foreach { epoch =>
      val docs = (0 until 40).map { i =>
        (epoch * 100L + i,
          (0 until 10).map(j => s"w${epoch}_${i}_$j").mkString(" "))
      } :+ (epoch * 100L + 99L, textA) // dup admitted only in epoch 0
      DocStream.processBatch(spark, docs.toDF("doc_id", "text"),
        epoch.toLong, idx, out)
    }
  }

  test("compaction preserves rows and verdicts, drops files and markers") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compactidx").toString
    buildBigEpochs(s"$base/i1", s"$base/o1") // compacted
    buildBigEpochs(s"$base/i2", s"$base/o2") // uncompacted control
    val rowsBefore = indexRows(s"$base/i1")
    val filesBefore = parquetFiles(s"$base/i1").size

    assert(DocStream.compactIndex(spark, s"$base/i1", 2L) == 3)

    // one consolidated epoch, same logical rows, strictly fewer files
    assert(BatchProtocol.epochIds(spark, s"$base/i1") == Seq(-4L))
    assert(indexRows(s"$base/i1") == rowsBefore)
    assert(indexRows(s"$base/i1") == indexRows(s"$base/i2"))
    val filesAfter = parquetFiles(s"$base/i1").size
    assert(filesAfter < filesBefore,
      s"expected fewer files, got $filesBefore -> $filesAfter")
    // exactly one file per (b, g) group present — the scan-task bound
    val groups = spark.read.parquet(s"$base/i1")
      .select("b", "g").distinct().count()
    assert(filesAfter == groups, s"$filesAfter files for $groups (b,g) groups")

    // marker collapse: individual markers gone, one watermark file
    val commits = new java.io.File(s"$base/i1/_commits").list().toSeq
      .filterNot(_.startsWith(".")) // local-FS checksum shadows
    assert(commits.sorted == Seq("compacted_through=2"), commits.toString)

    // a redelivered compacted batch still no-ops: DIFFERENT data under a
    // committed id must not be recomputed (recompute would change out)
    DocStream.processBatch(spark,
      Seq((99L, textF)).toDF("doc_id", "text"), 1L, s"$base/i1", s"$base/o1")
    assert(outIds(s"$base/o1") == outIds(s"$base/o2"))

    // the next batch dedups against the consolidated epoch exactly as
    // against the epoch-per-batch control
    val b3 = Seq((30L, textA), (31L, textF), (32L, "novel phrasing entirely"))
      .toDF("doc_id", "text")
    DocStream.processBatch(spark, b3, 3L, s"$base/i1", s"$base/o1")
    DocStream.processBatch(spark, b3, 3L, s"$base/i2", s"$base/o2")
    assert(outIds(s"$base/o1") == outIds(s"$base/o2"))
  }

  test("every crash prefix leaves the old index readable; a re-run converges") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compactcrash").toString
    buildThreeEpochs(s"$base/i", s"$base/o")
    buildThreeEpochs(s"$base/ctl", s"$base/octl") // untouched control
    // manufacture the consolidated epoch a completed compaction produces
    buildThreeEpochs(s"$base/donor", s"$base/odonor")
    DocStream.compactIndex(spark, s"$base/donor", 2L)

    // crash state A: tmp written, rename never happened — a hidden
    // directory readers must ignore
    copyDir(Paths.get(s"$base/donor/batch_id=-4"),
      Paths.get(s"$base/i/_compact_tmp"))
    assert(indexRows(s"$base/i") == indexRows(s"$base/ctl"),
      "_compact_tmp must be invisible to index readers")

    // crash state B: renamed but not watermarked — consolidated epoch
    // coexists with every original epoch; duplicates are verdict-neutral
    copyDir(Paths.get(s"$base/donor/batch_id=-4"),
      Paths.get(s"$base/i/batch_id=-4"))
    assert(indexRows(s"$base/i") == indexRows(s"$base/ctl"),
      "duplicated epochs must not change the logical row set")
    val b3 = Seq((30L, textA), (31L, "novel phrasing entirely"))
      .toDF("doc_id", "text")
    DocStream.processBatch(spark, b3, 3L, s"$base/i", s"$base/o")
    DocStream.processBatch(spark, b3, 3L, s"$base/ctl", s"$base/octl")
    assert(outIds(s"$base/o") == outIds(s"$base/octl"),
      "dedup verdicts must be identical against a crashed half-compacted index")

    // a re-run of the same compaction converges: replaces the orphaned
    // consolidated epoch, drops the merged originals, keeps epoch 3
    assert(DocStream.compactIndex(spark, s"$base/i", 2L) == 4) // 0,1,2,-4
    assert(BatchProtocol.epochIds(spark, s"$base/i").sorted == Seq(-4L, 3L))
    assert(indexRows(s"$base/i") == indexRows(s"$base/ctl"))
  }

  test("a crash after the watermark but before cleanup is finished by the early return") {
    val base = Files.createTempDirectory("graft-compactwm").toString
    buildThreeEpochs(s"$base/i", s"$base/o")
    buildThreeEpochs(s"$base/donor", s"$base/odonor")
    DocStream.compactIndex(spark, s"$base/donor", 2L)
    // crash state C: consolidated epoch + watermark written, originals
    // and their markers never deleted
    copyDir(Paths.get(s"$base/donor/batch_id=-4"),
      Paths.get(s"$base/i/batch_id=-4"))
    Files.createFile(Paths.get(s"$base/i/_commits/compacted_through=2"))

    assert(DocStream.compactIndex(spark, s"$base/i", 2L) == 0)
    assert(BatchProtocol.epochIds(spark, s"$base/i") == Seq(-4L),
      "early return must finish deleting the merged epochs")
    val commits = new java.io.File(s"$base/i/_commits").list().toSeq
      .filterNot(_.startsWith(".")) // local-FS checksum shadows
    assert(commits.sorted == Seq("compacted_through=2"), commits.toString)
    assert(indexRows(s"$base/i") == indexRows(s"$base/donor"))
  }

  test("a crash leaving a PRIOR consolidated epoch beside the new one: readServable serves rows once, the early return deletes the stale consolidation") {
    val base = Files.createTempDirectory("graft-compactstale").toString
    buildThreeEpochs(s"$base/i", s"$base/o")
    // first consolidation: epochs {-3, 2}
    assert(DocStream.compactIndex(spark, s"$base/i", 1L) == 2)
    // donor runs the SECOND consolidation to completion → epochs {-4}
    copyDir(Paths.get(s"$base/i"), Paths.get(s"$base/donor"))
    assert(DocStream.compactIndex(spark, s"$base/donor", 2L) == 2) // -3, 2
    // crash state: the -4 rename and watermark landed, cleanup never ran —
    // the PRIOR consolidated epoch -3 and stream epoch 2 sit beside -4,
    // every one of their rows duplicated inside it
    copyDir(Paths.get(s"$base/donor/batch_id=-4"),
      Paths.get(s"$base/i/batch_id=-4"))
    Files.createFile(Paths.get(s"$base/i/_commits/compacted_through=2"))
    assert(BatchProtocol.epochIds(spark, s"$base/i").sorted == Seq(-4L, -3L, 2L))
    // an aggregating consumer must see each row exactly ONCE (only the
    // most negative consolidated epoch serves — the -3 and 2 leftovers
    // are its subsets)
    val served = BatchProtocol.readServable(spark, s"$base/i").get
      .select("doc_id", "simhash", "b", "bk", "g").collect()
    val truth = BatchProtocol.readServable(spark, s"$base/donor").get
      .select("doc_id", "simhash", "b", "bk", "g").collect()
    assert(served.length == truth.length,
      s"crash leftovers double-counted: served ${served.length} vs ${truth.length}")
    assert(served.map(_.toString).sorted.toSeq ==
      truth.map(_.toString).sorted.toSeq)
    // the redelivered compaction's early return finishes the cleanup —
    // stale consolidated epoch included
    assert(DocStream.compactIndex(spark, s"$base/i", 2L) == 0)
    assert(BatchProtocol.epochIds(spark, s"$base/i") == Seq(-4L),
      "early return must delete the superseded -3 consolidation too")
    assert(indexRows(s"$base/i") == indexRows(s"$base/donor"))
  }

  test("compaction refuses a watermark beyond the highest stream epoch") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compactover").toString
    buildThreeEpochs(s"$base/i", s"$base/o")
    // upToBatch=7 with only epochs 0..2 present: the watermark would
    // mark NEVER-RUN batches 3..7 as committed forever — their future
    // deliveries would no-op and silently drop data
    val e = intercept[IllegalArgumentException] {
      DocStream.compactIndex(spark, s"$base/i", 7L)
    }
    assert(e.getMessage.contains("existing stream epoch"), e.getMessage)
    // compacting through a PREFIX of the epochs is fine: later epochs
    // and their markers survive untouched
    assert(DocStream.compactIndex(spark, s"$base/i", 1L) == 2)
    assert(BatchProtocol.epochIds(spark, s"$base/i").sorted == Seq(-3L, 2L))
    assert(BatchProtocol.committed(spark, s"$base/i", 2L))
    val b3 = Seq((30L, textA), (31L, "novel phrasing entirely"))
      .toDF("doc_id", "text")
    DocStream.processBatch(spark, b3, 3L, s"$base/i", s"$base/o")
    assert(outIds(s"$base/o").contains(31L))
  }

  test("compaction refuses an index with uncommitted epochs") {
    val base = Files.createTempDirectory("graft-compactq").toString
    buildThreeEpochs(s"$base/i", s"$base/o")
    Files.delete(Paths.get(s"$base/i/_commits/1"))
    val e = intercept[IllegalArgumentException] {
      DocStream.compactIndex(spark, s"$base/i", 2L)
    }
    assert(e.getMessage.contains("uncommitted"), e.getMessage)
  }

  test("a live stream self-compacts at the configured cadence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-compactlive").toString
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.runNearDedup(
      mem.toDF().toDF("doc_id", "ingest_ts", "text"),
      s"$base/index", s"$base/out", s"$base/ckpt", compactEvery = 2)
    try {
      mem.addData((0L, ts(1), textA), (1L, ts(2), textC)); q.processAllAvailable()
      mem.addData((10L, ts(3), textA), (11L, ts(4), textE)); q.processAllAvailable()
      mem.addData((20L, ts(5), textE), (21L, ts(6), textF)); q.processAllAvailable()
      mem.addData((30L, ts(7), textF), (31L, ts(8), "novel phrasing entirely"))
      q.processAllAvailable()
      // batches 0..3; compactions fired after ids 1 and 3 — the index
      // never holds more than compactEvery+1 epochs, and ends at exactly
      // one consolidated epoch (-(3+2) = -5)
      assert(BatchProtocol.epochIds(spark, s"$base/index") == Seq(-5L))
      assert(outIds(s"$base/out") == Set(0L, 1L, 11L, 21L, 31L))
      // index rows cover exactly the survivors, 4 band rows each
      assert(spark.read.parquet(s"$base/index").count() == 20)
    } finally q.stop()
  }

  test("the vector index compacts with the same contract") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-compactvec").toString
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (math.sin(seed * 64 + i) * 10).toFloat)
    def run(idx: String, out: String): Unit = {
      EmbedStream.processBatch(spark,
        Seq((0L, vec(1)), (1L, vec(2))).toDF("vec_id", "embedding"),
        0L, idx, out)
      EmbedStream.processBatch(spark,
        Seq((10L, vec(1)), (11L, vec(3))).toDF("vec_id", "embedding"),
        1L, idx, out)
    }
    run(s"$base/i1", s"$base/o1")
    run(s"$base/i2", s"$base/o2")
    assert(EmbedStream.compactIndex(spark, s"$base/i1", 1L) == 2)
    assert(BatchProtocol.epochIds(spark, s"$base/i1") == Seq(-3L))
    val b2 = Seq((20L, vec(2)), (21L, vec(4))).toDF("vec_id", "embedding")
    EmbedStream.processBatch(spark, b2, 2L, s"$base/i1", s"$base/o1")
    EmbedStream.processBatch(spark, b2, 2L, s"$base/i2", s"$base/o2")
    import spark.implicits._
    def ids(p: String) = spark.read.parquet(p)
      .select("vec_id").as[Long].collect().toSet
    assert(ids(s"$base/o1") == ids(s"$base/o2"))
  }
}
