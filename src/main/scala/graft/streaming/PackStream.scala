package graft.streaming

import graft.functions.TextFunctions._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming sequence packing — the q72 dual: a micro-batch stream of
  * documents is concatenated into the SAME fixed-capacity chunk space
  * the batch operator profiles, continued across batches by a persistent
  * token CURSOR. The stream's chunk ids pick up exactly where the last
  * committed batch stopped (a chunk can straddle a batch boundary:
  * batch N ends mid-chunk, batch N+1's first document continues filling
  * it), so feeding the corpus through in arrival order reproduces the
  * batch assignment bit-for-bit — pinned by PackStreamSpec through the
  * shared [[graft.queries.Curation.packAssignments]] arithmetic.
  *
  * Exactly-once via the shared [[BatchProtocol]] marker discipline, with
  * one extension: the cursor AFTER batch N is recorded in the NAME of an
  * empty file `_cursor/N=<value>` (the watermark-file trick — the value
  * migrates with a plain file copy and needs no read). Crash ordering:
  *
  *   1. assignment rows land under `batch_id=N` FIRST — a post-crash
  *      recompute reads the unchanged pre-batch cursor and reproduces
  *      them bit-identically (the assignment is a pure function of
  *      (cursor, batch), and overwrite replaces the partial epoch);
  *   2. the cursor file second — [[cursorBefore]] only consults ids
  *      STRICTLY BELOW the current batch, so a crash between cursor and
  *      marker cannot make the redelivery double-advance itself;
  *   3. the commit marker LAST makes redelivery a no-op.
  *
  * Superseded cursor files are pruned after commit (max-wins semantics
  * make a crash mid-prune harmless), so the cursor costs ONE live file,
  * not one per batch — the q72 analogue of the compaction watermark.
  *
  * Scale posture: per-batch work is the q72 distributed prefix sum over
  * the batch (bucketed window, bounded driver reads — never a
  * single-task sort of the batch), plus one token-mass aggregate for the
  * cursor advance. The cursor itself is the only serialization point,
  * by construction: packing defines a total concatenation order, so the
  * stream pays one scalar of state, not a shuffle.
  *
  * File-count maintenance: `collapseEvery` bounds the MARKER count
  * (one watermark instead of one file per batch). The per-batch DATA
  * epochs are plain parquet under `batch_id=N` — on a long-lived
  * stream, compact them QUIESCED with
  * [[graft.Compaction.compactPartitioned]] (partCols = `batch_id`,
  * layout-preserving: one file per epoch) into a fresh tree, copy
  * `_commits` + `_cursor` across (underscore dirs are invisible to the
  * parquet reader and are not migrated by the rewrite), and swap with
  * one rename — redelivery semantics are untouched because
  * `committed()` consults only the migrated markers/watermark.
  */
/** The one-scalar stream cursor carried in the NAME of an empty
  * `_cursor/N=<value>` file (the watermark-file trick — the value
  * migrates with a plain file copy and needs no read), shared by the
  * packing stream (token cursor) and the curriculum stream (position
  * cursor). Max-wins semantics; reads consult ids STRICTLY below the
  * current batch — see [[PackStream]]'s crash-ordering doc for why both
  * properties are load-bearing.
  */
private[streaming] object CursorFile {
  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def dir(path: String) = new Path(s"$path/_cursor")

  /** Cursor consumed by batches strictly before `batchId` (0 before the
    * first batch). */
  def before(spark: SparkSession, path: String, batchId: Long): Long = {
    val f = fs(spark, path)
    val d = dir(path)
    if (!f.exists(d)) 0L
    else f.listStatus(d).iterator.map(_.getPath.getName)
      .flatMap { n =>
        n.split("=", 2) match {
          case Array(id, v) if id.toLongOption.exists(_ < batchId) =>
            v.toLongOption
          case _ => None
        }
      }
      .foldLeft(0L)(math.max)
  }

  /** Record the cursor AFTER `batchId` (crash-ordering step 2: data
    * first, cursor second, marker last). */
  def advance(spark: SparkSession, path: String, batchId: Long,
      value: Long): Unit = {
    val f = fs(spark, path)
    f.mkdirs(dir(path))
    f.create(new Path(s"$path/_cursor/$batchId=$value"), true).close()
  }

  /** Prune cursor files superseded by `batchId` (committed ⇒ that
    * batch's file carries the running maximum; a crash mid-prune leaves
    * extras that max-wins ignores and the next prune removes). */
  def prune(spark: SparkSession, path: String, batchId: Long): Unit = {
    val f = fs(spark, path)
    f.listStatus(dir(path)).foreach { st =>
      val keep = st.getPath.getName.split("=", 2) match {
        case Array(id, _) => id.toLongOption.forall(_ >= batchId)
        case _ => true
      }
      if (!keep) f.delete(st.getPath, false)
    }
  }
}

object PackStream {

  /** Token cursor consumed by batches strictly before `batchId` —
    * [[CursorFile.before]] (kept as the spec-facing name). */
  private[streaming] def cursorBefore(spark: SparkSession, packPath: String,
      batchId: Long): Long = CursorFile.before(spark, packPath, batchId)

  /** The `foreachBatch` body of [[runPacking]] — exactly-once chunk
    * assignment for one micro-batch, continuing from the committed
    * cursor.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      packPath: String): Unit = {
    if (BatchProtocol.committed(spark, packPath, batchId)) return
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try {
      // materialize (doc_id, n_tokens) once: it feeds the assignment's
      // two bounded driver reads, the epoch write, and the cursor
      // advance (the q72/q22 barrier, batch-scoped)
      val toks = stable
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist()
      try {
        val cursor = cursorBefore(spark, packPath, batchId)
        graft.queries.Curation.packAssignments(toks, cursor)
          .write.mode("overwrite").parquet(s"$packPath/batch_id=$batchId")
        // sum of zero rows is NULL (the r7 one-row-accounting crash
        // class): an empty batch advances the cursor by 0, not an NPE
        val mass = Option(toks.agg(sum("n_tokens")).head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        CursorFile.advance(spark, packPath, batchId, cursor + mass)
        BatchProtocol.commit(spark, packPath, batchId)
        CursorFile.prune(spark, packPath, batchId)
      } finally toks.unpersist()
    } finally graft.CheckpointBlocks.free(spark, stableIds)
  }

  /** Continuous packing over a document stream: per-doc chunk
    * assignments land under `<packPath>/batch_id=N`, the cursor under
    * `<packPath>/_cursor`, markers under `<packPath>/_commits`.
    * `collapseEvery > 0` collapses individual commit markers into one
    * watermark every that-many batches (inside `foreachBatch`, where
    * every epoch ≤ the current batch is committed by construction) —
    * without it marker count grows one file per batch for stream life.
    */
  def runPacking(docs: DataFrame, packPath: String, checkpoint: String,
      collapseEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, packPath)
        if (collapseEvery > 0 && (batchId + 1) % collapseEvery == 0)
          BatchProtocol.collapseMarkers(batch.sparkSession, packPath, batchId)
      }
      .start()

  /** The loader manifest over a streamed pack directory — q119's
    * [[graft.queries.Curation.manifestRows]] applied to the
    * cursor-continued assignment rows: a NARROW deterministic map (the
    * cursor already made `cum` globally consistent across epochs, so no
    * extra stream state exists to hold), meaning the artifact a
    * dataloader actually reads can be produced incrementally per epoch
    * dir — or over the union, where it equals batch q119 row-for-row
    * (PackStreamSpec).
    */
  def manifest(epochs: DataFrame): DataFrame =
    graft.queries.Curation.manifestRows(epochs)
}
