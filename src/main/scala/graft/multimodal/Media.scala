package graft.multimodal

import graft.Tables
import graft.functions.TextFunctions.portableHash
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal payload plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, per the training-data-pipeline surface.
  *
  * The media table is derived deterministically from `documents` (payload =
  * UTF-8 bytes of the text, kind = doc_id mod 3) so every op is
  * oracle-checkable; real pipelines swap the source, not the ops.
  *
  * Decode is STUBBED — this container has no image/audio codecs. The stub
  * ([[StubCodec]]) derives metadata deterministically from the payload's
  * SHA-256, and exists in two equivalent forms:
  *   - an expression path (codegen-friendly, DuckDB-mirrorable) used by the
  *     q31-q34 queries, and
  *   - a [[MediaCodec]] `mapPartitions` path with the REAL batch shape (one
  *     codec instance per partition, iterator-to-iterator, no per-row
  *     init), which is where a JNI/native decoder would plug in.
  * A spec asserts the two paths agree row-for-row.
  *
  * Scale notes: everything is per-row (no shuffle); payload bytes never
  * leave the executor that scanned them, and the metadata projections prune
  * the payload column away before any exchange.
  */
object Media {

  /** Typed row for the codec path. */
  final case class MediaItem(media_id: Long, kind: String, payload: Array[Byte])

  final case class DecodedMedia(
      media_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, duration_ms: Long)

  /** Pluggable decoder; real implementations bind a native library. */
  trait MediaCodec extends Serializable {
    def decode(item: MediaItem): DecodedMedia
  }

  /** Deterministic stand-in codec: metadata from the payload's sha-256.
    * Matches the expression path bit-for-bit (same hash, same integer
    * arithmetic).
    */
  object StubCodec extends MediaCodec {
    def decode(item: MediaItem): DecodedMedia = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(item.payload)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val n = item.payload.length.toLong
      DecodedMedia(item.media_id, item.kind, n,
        16L + h % 320L, 16L + (h / 320L) % 320L, n * 7L)
    }
  }

  /** The media kind of a document id — ONE definition of the derived
    * modality tag, shared by [[mediaTable]] and the interleaved-pack
    * token-cost model (q165), so the two cannot drift.
    */
  def kindCol(docId: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (docId % 3).cast("int") + 1)

  /** The media table: documents as opaque binary payloads + kind tag. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.wide(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      kindCol(col("doc_id")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Expression-path stub decode (mirrors [[StubCodec]]). sha2 accepts
    * binary input; all downstream values are integer-derived.
    */
  def decodeCols(payload: Column): Seq[(String, Column)] = {
    val h = portableHash(payload) // sha2 works on binary
    val n = length(payload).cast("long")
    Seq(
      "n_bytes" -> n,
      "width" -> (lit(16L) + h % 320L),
      "height" -> (lit(16L) + floor(h / 320.0).cast("long") % 320L),
      "duration_ms" -> n * 7L)
  }

  /** Codec path: the real-world batch shape. One codec per partition,
    * iterator-to-iterator — a native decoder initializes once per task,
    * not once per row, and streams without materializing the partition.
    */
  def decodeWith(ds: Dataset[MediaItem], codec: MediaCodec): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { iter => iter.map(codec.decode) }
  }
}
