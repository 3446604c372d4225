package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries (q31-q34): stub decode, feature extraction,
  * frame sampling, resize — over the derived media table (documents as
  * opaque binary payloads, see [[graft.multimodal.Media]]).
  *
  * Oracle mirroring: payloads are the UTF-8 bytes of ASCII text, so DuckDB
  * string ops (sha256, substr, length) see the same bytes Spark's binary
  * ops do; everything emitted is integer/hex-string/double derived from
  * sha-256 prefixes — exact in both engines.
  */
object Multimodal {

  private val FrameCount = 4
  private val FrameBytes = 100

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stub decode: typed metadata from the opaque payload
    "q31_media_decode" -> ((s, dir) => {
      val m = Media.mediaTable(s, dir)
      val cols = Media.decodeCols(col("payload")).map { case (n, c) => c.as(n) }
      m.select(col("media_id") +: col("kind") +: cols: _*)
    }),

    // 8-dim feature vector in [0,1): re-hashes of the payload digest.
    // Emitted exploded as (media_id, feat_idx, feature) rows — scalar cells
    // only, so the driver's pandas sort/hash compare works (an
    // array<double> cell is unsortable there). The array shape is still
    // available via Media.featureCols for programmatic use.
    "q32_media_features" -> ((s, dir) => {
      Media.mediaTable(s, dir)
        .select(col("media_id"), sha2(col("payload"), 256).as("base"))
        .select(col("media_id"), posexplode(array((0 until 8).map(i =>
          conv(substring(sha2(concat(col("base"), lit(s"#$i")), 256), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0)): _*)))
        .select(col("media_id"), col("pos").cast("long").as("feat_idx"),
          col("col").as("feature"))
    }),

    // frame sampling: K fixed-size byte windows at even offsets
    "q33_frame_sample" -> ((s, dir) => {
      val m = Media.mediaTable(s, dir)
        .select(col("media_id"), col("payload"),
          length(col("payload")).cast("long").as("n_bytes"))
      // stride floors to >=1 so short payloads still yield K (overlapping)
      // frames; offsets are 1-based like substr
      val stride = greatest(lit(1L),
        floor((col("n_bytes") - lit(FrameBytes)) / lit(FrameCount.toDouble)).cast("long"))
      m.select(col("media_id"), col("n_bytes"),
          explode(sequence(lit(0L), lit(FrameCount - 1L))).as("frame_idx"),
          col("payload"), stride.as("stride"))
        .select(col("media_id"), col("frame_idx"),
          (col("frame_idx") * col("stride") + 1).as("frame_off"),
          sha2(col("payload").substr(
            (col("frame_idx") * col("stride") + 1).cast("int"),
            lit(FrameBytes)), 256).as("frame_sha"))
    }),

    // resize: halved dims + thumbnail payload hash (first 64 bytes)
    "q34_media_resize" -> ((s, dir) => {
      val m = Media.mediaTable(s, dir)
      val dec = Media.decodeCols(col("payload")).toMap
      m.select(col("media_id"),
          dec("width").as("width"), dec("height").as("height"),
          sha2(substring(col("payload"), 1, 64), 256).as("thumb_sha"))
        .select(col("media_id"),
          greatest(lit(1L), floor(col("width") / 2.0).cast("long")).as("new_w"),
          greatest(lit(1L), floor(col("height") / 2.0).cast("long")).as("new_h"),
          col("thumb_sha"))
    }))

  private val SqlH = "CAST('0x'||substr(sha256(text),1,8) AS BIGINT)"

  def oracleSql: Map[String, String] = Map(
    "q31_media_decode" ->
      s"""SELECT doc_id AS media_id,
         |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
         |  length(text) AS n_bytes,
         |  16 + $SqlH % 320 AS width,
         |  16 + ($SqlH // 320) % 320 AS height,
         |  length(text) * 7 AS duration_ms
         |FROM documents""".stripMargin,

    "q32_media_features" ->
      """SELECT doc_id AS media_id, i AS feat_idx,
        |  CAST(CAST('0x'||substr(sha256(sha256(text)||'#'||i),1,8) AS BIGINT) AS DOUBLE)
        |     / 4294967296.0 AS feature
        |FROM documents, range(0, 8) t(i)""".stripMargin,

    "q33_frame_sample" ->
      s"""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n_bytes,
         |  greatest(1, CAST(floor((length(text) - $FrameBytes) / ${FrameCount}.0) AS BIGINT)) AS stride
         |  FROM documents)
         |SELECT media_id, frame_idx,
         |  frame_idx * stride + 1 AS frame_off,
         |  sha256(substr(text, CAST(frame_idx * stride + 1 AS INT), $FrameBytes)) AS frame_sha
         |FROM m, range(0, $FrameCount) t(frame_idx)""".stripMargin,

    "q34_media_resize" ->
      s"""SELECT doc_id AS media_id,
         |  greatest(1, (16 + $SqlH % 320) // 2) AS new_w,
         |  greatest(1, (16 + ($SqlH // 320) % 320) // 2) AS new_h,
         |  sha256(substr(text, 1, 64)) AS thumb_sha
         |FROM documents""".stripMargin)
}
