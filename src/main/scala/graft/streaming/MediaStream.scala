package graft.streaming

import graft.queries.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming incremental MEDIA near-dedup — q92's semantics against
  * history: dHash each incoming payload over the deterministic decoded
  * pixel plane (the SAME [[graft.queries.Multimodal.pixelPlane]] /
  * [[graft.queries.Multimodal.dhashHalf]] expressions the batch operator
  * uses — a real decoder swaps the pixel source, not the hash), then run
  * the text stream's band-index protocol unchanged
  * ([[DocStream.processSketched]]): representative collapse, (b, g)-pruned
  * index reads, cross/within-batch greedy dedup, survivors-first
  * two-write exactly-once commit, epoch compaction.
  *
  * The 64-bit dHash travels PACKED into one BIGINT (lo | hi << 32). The
  * batch operator's two-column (lo, hi) form exists for ORACLE
  * portability — DuckDB errors on signed-64 overflow where the JVM
  * wraps — but the streaming index never meets another engine, and one
  * column means [[DocStream]]'s whole protocol (banding, hamming
  * verify, index schema, compaction) applies verbatim: the packed XOR's
  * bit_count is exactly the sum of the halves' hamming distances, and
  * the band masks cut every sign-extension bit (see
  * [[DocStream.bandsFromSketch]]).
  *
  * Band width is an INDEX-LIFETIME constant like the text stream's
  * (default 16 ⇒ 4 bands of 16 bits over the 64-bit sketch — keyspace
  * 65,536 per band, good to ~1.6M media items under the 25-occupancy
  * rule; widening is [[DocStream.rebandIndex]]'s pass with bits = 64).
  */
object MediaStream {

  /** Packed 64-bit dHash of a payload column, null for empty/missing
    * payloads (a null sketch's band keys never equi-join, so such rows
    * are always admitted — the text stream's null-text posture).
    */
  private def packedDhash(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), col("payload").cast("string").as("txt"))
      .select(col("doc_id"), col("txt"),
        length(col("txt")).cast("long").as("n"))
      .select(col("doc_id"), col("n"),
        when(col("n") > 0, Multimodal.pixelPlane(col("txt"), col("n")))
          .as("px"))
      .select(col("doc_id"),
        when(col("n") > 0, Multimodal.dhashHalf(0)
          .bitwiseOR(shiftleft(Multimodal.dhashHalf(32), 32)))
          .as("simhash"))

  /** The `foreachBatch` body — [[DocStream.processBatch]]'s contract
    * (exactly-once per batchId, survivors-first ordering, commit marker)
    * with the media sketch. Input rows carry `media_id` + `payload`;
    * survivors are written with their original columns plus the packed
    * sketch.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String, bandWidth: Int = 16): Unit = {
    if (BatchProtocol.committed(spark, indexPath, batchId))
      return // replayed, fully committed
    val (stable0, stableIds) =
      graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try {
      val stable = stable0.withColumnRenamed("media_id", "doc_id")
      val sk = packedDhash(stable).select(col("doc_id"), col("simhash"))
      DocStream.processSketched(spark, stable, sk, batchId, indexPath,
        outPath, bandWidth, bits = 64)
    } finally
      graft.CheckpointBlocks.free(spark, stableIds)
  }

  /** Streaming incremental media near-dedup — the [[DocStream
    * .runNearDedup]] surface over media rows, sharing its index layout,
    * marker protocol, and self-compaction cadence.
    */
  def runNearDedup(media: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, bandWidth: Int = 16, compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, indexPath, outPath,
          bandWidth)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          DocStream.compactIndex(batch.sparkSession, indexPath, batchId); ()
        }
      }
      .start()
}
