package graft.queries

import graft.Tables
import graft.multimodal.Media
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** q92 dHash geometry: an 8×9 "pixel" grid (8 comparison columns per
    * row) folded to a 64-bit difference hash, carried as the q42 (lo, hi)
    * BIGINT pair — no 64-bit sign/overflow portability traps, and the
    * Hamming-band candidate machinery is q42's verbatim.
    */
  private val PhashRows = 8
  private val PhashCols = 8

  /** The deterministic decoded pixel plane: pixel i of the 8×9 grid is
    * the code point of the payload character at position i mod n (the
    * wrap makes short payloads well-defined). Payloads are UTF-8 bytes
    * of ASCII text (see [[Media]]), so this IS the byte plane a real
    * decoder would hand back, derived with engine-portable string ops —
    * the pixel source a JNI codec would replace, exactly like
    * [[Media.StubCodec]]'s metadata.
    */
  private[graft] def pixelPlane(txt: Column, n: Column): Column =
    transform(sequence(lit(0), lit(PhashRows * (PhashCols + 1) - 1)),
      i => ascii(txt.substr((i % n).cast("int") + 1, lit(1))))

  /** One half of the 64-bit dHash over a named `px` grid column: bit b
    * (of 32) set iff the right neighbor pixel is strictly brighter —
    * per-row adjacent comparisons, the classic difference hash.
    */
  private[graft] def dhashHalf(off: Int): Column = (0 until 32).map { b =>
    val g = off + b
    val r = g / PhashCols
    val c = g % PhashCols
    when(element_at(col("px"), r * (PhashCols + 1) + c + 2) >
         element_at(col("px"), r * (PhashCols + 1) + c + 1),
      lit(1L << b)).otherwise(lit(0L))
  }.reduce(_ + _)

  /** q165's per-kind placeholder token cost — the fixed sequence budget
    * an interleaved trainer charges for one media attachment (the
    // vision-token convention: an image is a constant patch-token
    * count, audio/video scale up). Keys are exactly
    * [[Media.kindCol]]'s value space.
    */
  private[graft] val MediaTokenCost =
    Map("image" -> 64L, "audio" -> 128L, "video" -> 256L)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // interleaved multimodal packing — q72's concat-and-chunk profile
    // under the interleaved-document cost model: every document charges
    // its TEXT tokens plus a fixed per-kind placeholder cost for its
    // media attachment ([[MediaTokenCost]] — the patch-token
    // convention), so media-only documents (null/empty text — zero text
    // tokens) still occupy sequence space and PACK, the case the
    // text-only q72 drops. Rides the SAME audited prefix-sum machinery
    // ([[Curation.packAssignments]] — bucketed cumsum, no global sort);
    // the per-chunk profile adds the text/media mass split (started-in-
    // chunk attribution, q72's convention) a loader uses to budget
    // vision-encoder batches per sequence. ONE extra doc_id equi-join
    // stitches the split columns onto the assignment (the shared
    // machinery deliberately carries only n_tokens).
    "q165_multimodal_pack" -> ((s, dir) => {
      val costs = typedLit(MediaTokenCost)
      val toks = Tables.wide(s, dir, "documents")
        .select(col("doc_id"),
          coalesce(size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long"), lit(0L)).as("n_text"),
          element_at(costs, Media.kindCol(col("doc_id"))).as("n_media"))
        .withColumn("n_tokens", col("n_text") + col("n_media"))
        .persist() // released by the consumer's Caches.release hook
      Curation.packAssignments(toks.select("doc_id", "n_tokens"), 0L)
        .join(toks.select("doc_id", "n_text", "n_media"), Seq("doc_id"))
        .groupBy("chunk_id")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("tokens_started"),
          sum("n_text").as("text_tokens"),
          sum("n_media").as("media_tokens"),
          sum(when(col("last_chunk") > col("chunk_id"), 1L)
            .otherwise(0L)).as("n_straddlers"))
    }),

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

    // multimodal near-dup — perceptual difference-hash pairs over the
    // media payloads: the missing member of the near-dup family (text
    // has q21/q25/q27/q42, embeddings q28/q39/q76; this covers the
    // MEDIA columns). dHash over the deterministic decoded pixel grid
    // ([[pixelPlane]] — no codecs needed; a real decoder swaps the
    // pixel source, not the hash or the banding), then Hamming-band
    // candidate pairs reusing the q42 machinery verbatim: corpus-
    // adaptive band widths over the (lo, hi) pair, [[Similarity
    // .MaxBandDocs]]-capped buckets (a mass-duplicate image cluster is
    // a quadratic bucket here exactly as in text), band equi-join, and
    // the hamming cut BEFORE the distinct. Work ∝ true collisions,
    // never n² — the 100 TB posture is q42's.
    "q92_media_phash" -> ((s, dir) => {
      val sk = Media.mediaTable(s, dir)
        .select(col("media_id"), col("payload").cast("string").as("txt"))
        .select(col("media_id"), col("txt"),
          length(col("txt")).cast("long").as("n"))
        .filter(col("n") > 0) // an empty payload decodes to no pixels
        .select(col("media_id"), pixelPlane(col("txt"), col("n")).as("px"))
        .select(col("media_id"), dhashHalf(0).as("lo"), dhashHalf(32).as("hi"))
        .persist() // sketch feeds both sides of the band self-join
      val w = Similarity.bandWidth64For(Tables.rowCount(s, dir, "documents"))
      val nb = 64 / w
      val nbLo = 32 / w
      val mask = (1L << w) - 1
      val bands = sk.select(col("media_id"), col("lo"), col("hi"),
        explode(array((0 until nb).map { b =>
          val bk =
            if (b < nbLo) shiftright(col("lo"), w * b).bitwiseAND(lit(mask))
            else shiftright(col("hi"), w * (b - nbLo)).bitwiseAND(lit(mask))
          struct(lit(b).as("b"), bk.as("bk"))
        }: _*)).as("x"))
        .select(col("media_id"), col("lo"), col("hi"),
          col("x.b").as("b"), col("x.bk").as("bk"))
      val rare = bands.groupBy("b", "bk")
        .agg(count(lit(1)).as("kc"))
        .filter(col("kc") <= Similarity.MaxBandDocs)
        .select("b", "bk")
      val capped = bands.join(rare, Seq("b", "bk"), "left_semi")
      capped.alias("a").join(capped.alias("b"),
          col("a.b") === col("b.b") && col("a.bk") === col("b.bk") &&
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
          (bit_count(col("a.lo").bitwiseXOR(col("b.lo"))) +
           bit_count(col("a.hi").bitwiseXOR(col("b.hi"))))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 8)
        .distinct()
    }),

    // caption-conflict audit — the decision the two near-dup families
    // COMPOSE into, and the reason a multimodal pipeline runs both: a
    // media near-dup pair whose texts are ALSO near-dups is a plain
    // full duplicate (q127's reweight / q44's drop applies to the whole
    // record); a media near-dup whose texts are NOT near-dups is a
    // CAPTION CONFLICT — the same image shipped under materially
    // different descriptions, the weak-supervision noise an image-text
    // training run filters hardest (one caption is wrong, or the image
    // is generic stock both texts legitimately describe — either way a
    // reviewer decision, so the audit emits every media pair classified
    // rather than pre-filtering). Both inputs are the SHARED pair
    // definitions (q92's banded Hamming pairs, q27's banded simhash
    // pairs — media_id IS doc_id by the mediaTable contract), stitched
    // by ONE left equi-join on the ordered pair key. Work past the two
    // audited pair generators is pair-set-sized, never corpus-sized.
    "q131_caption_conflicts" -> ((s, dir) => {
      val media = queries("q92_media_phash")(s, dir)
        .select(col("media_a"), col("media_b"), col("hamming"))
      val text = Similarity.queries("q27_simhash_pairs")(s, dir)
        .select(col("doc_a").as("media_a"), col("doc_b").as("media_b"),
          lit(1).as("td"))
      media.join(text, Seq("media_a", "media_b"), "left")
        .select(col("media_a"), col("media_b"), col("hamming"),
          col("td").isNotNull.as("text_dup"),
          col("td").isNull.as("conflict"))
    }),

    // transitive media near-dup clusters — the q43 action for the media
    // modality: q92's Hamming pairs are the edge set, and the SAME
    // min-label propagation loop ([[Dedup.propagateMin]] — per-round
    // checkpoint block release, pointer-jump escalation, the proven-
    // bound driver fast path, graph-sized repartitioning) labels the
    // components; media the pairs never touch stitch back in as
    // singletons. Closes the modality loop: pairs (q92) → clusters
    // (q111) exactly as q27/q42 → q43 for text. 100 TB posture is
    // q43's — per-round work ∝ |edges|, never corpus².
    "q111_media_clusters" -> ((s, dir) => {
      val pairs = queries("q92_media_phash")(s, dir)
        .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"))
      val ids = Media.mediaTable(s, dir).select(col("media_id").as("doc_id"))
      val (labels, _) = Dedup.propagateMin(s, pairs, ids)
      labels.select(col("doc_id").as("media_id"), col("cluster_id"))
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
    // the q72 cumsum under the interleaved cost model: text tokens plus
    // the per-kind placeholder cost (media-only docs still pack), with
    // the per-chunk text/media mass split
    "q165_multimodal_pack" ->
      s"""WITH tk AS (SELECT doc_id,
         |  COALESCE(len(${TextAnalysis.Toks}), 0) AS n_text,
         |  CASE CAST(doc_id % 3 AS INT)
         |    WHEN 0 THEN ${MediaTokenCost("image")}
         |    WHEN 1 THEN ${MediaTokenCost("audio")}
         |    ELSE ${MediaTokenCost("video")} END AS n_media
         |  FROM documents),
         |t AS (SELECT doc_id, n_text, n_media,
         |  n_text + n_media AS n_tokens FROM tk),
         |c AS (SELECT doc_id, n_text, n_media, n_tokens,
         |  SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t)
         |SELECT CAST((cum - n_tokens) // ${Curation.PackCapacity} AS BIGINT)
         |    AS chunk_id,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
         |  CAST(SUM(n_text) AS BIGINT) AS text_tokens,
         |  CAST(SUM(n_media) AS BIGINT) AS media_tokens,
         |  CAST(SUM(CASE WHEN (cum - 1) // ${Curation.PackCapacity}
         |      > (cum - n_tokens) // ${Curation.PackCapacity} THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_straddlers
         |FROM c GROUP BY 1""".stripMargin,

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
         |FROM documents""".stripMargin,

    // the q42 band/cap/pair SQL with the dHash sketch substituted: the
    // pixel plane, the per-row adjacent comparisons, and the (lo, hi)
    // halves mirror the Spark expressions integer-for-integer
    "q92_media_phash" -> SqlMediaPairSql,

    // the two shared pair chains (each as a nested-WITH subquery — their
    // CTE names overlap by design, both being q42's band shape), one
    // ordered-pair-key left join
    "q131_caption_conflicts" ->
      s"""WITH mpairs AS ($SqlMediaPairSql),
         |tpairs AS (WITH ${Similarity.SqlSimhashPairCtes}
         |  ${Similarity.SqlSimhashPairSelect.replace("\n", " ")})
         |SELECT m.media_a, m.media_b, m.hamming,
         |  (t.doc_a IS NOT NULL) AS text_dup,
         |  (t.doc_a IS NULL) AS conflict
         |FROM mpairs m LEFT JOIN tpairs t
         |  ON t.doc_a = m.media_a AND t.doc_b = m.media_b""".stripMargin,

    // q92's pair chain verbatim, then q43's recursive min-label walk
    // over media ids (every medium seeds its own label; labels flow
    // along edges; the min per id is its component)
    "q111_media_clusters" ->
      s"""WITH RECURSIVE $SqlMediaPairCtes,
         |mp AS (SELECT media_a, media_b FROM cand WHERE $SqlMediaHamming <= 8),
         |edges AS (SELECT media_a AS src, media_b AS dst FROM mp
         |  UNION ALL SELECT media_b, media_a FROM mp),
         |walk(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id)
         |SELECT id AS media_id, MIN(lbl) AS cluster_id
         |FROM walk GROUP BY id""".stripMargin)

  /** q92's pixel → dHash → corpus-adaptive band → cap → candidate CTE
    * chain through `cand` (media pair + both sketch halves) — factored
    * so the pair report (q92) and the transitive clustering built on it
    * (q111) share ONE SQL definition of a media near-dup pair.
    */
  private lazy val SqlMediaPairCtes: String = {
    val cells = PhashRows * (PhashCols + 1)
    def half(lo: Int, hi: Int, off: Int) =
      s"""CAST(list_aggregate(list_transform(range($lo, $hi), g ->
         |  CASE WHEN px[CAST((g // $PhashCols) * ${PhashCols + 1} + (g % $PhashCols) + 2 AS INT)]
         |          > px[CAST((g // $PhashCols) * ${PhashCols + 1} + (g % $PhashCols) + 1 AS INT)]
         |  THEN CAST(1 AS BIGINT) << CAST(g - $off AS INT) ELSE CAST(0 AS BIGINT) END),
         |  'sum') AS BIGINT)""".stripMargin
    s"""m AS (SELECT doc_id AS media_id, text, length(text) AS n
       |  FROM documents WHERE length(text) > 0),
       |pxs AS (SELECT media_id, list_transform(range(0, $cells),
       |    i -> ascii(substr(text, CAST(i % n AS INT) + 1, 1))) AS px FROM m),
       |s AS (SELECT media_id, ${half(0, 32, 0)} AS lo,
       |  ${half(32, 64, 32)} AS hi FROM pxs),
       |wp AS (SELECT CAST(COALESCE(MIN(j), 32) AS BIGINT) AS w
       |  FROM (VALUES (8),(16),(32)) t(j)
       |  WHERE (CAST(1 AS BIGINT) << j) * 25 >= (SELECT count(*) FROM documents)),
       |bands AS (SELECT media_id, lo, hi, b,
       |    CASE WHEN b < 32 // w
       |      THEN (lo >> CAST(w*b AS INTEGER)) & ((CAST(1 AS BIGINT) << CAST(w AS INTEGER)) - 1)
       |      ELSE (hi >> CAST(w*(b - 32 // w) AS INTEGER)) & ((CAST(1 AS BIGINT) << CAST(w AS INTEGER)) - 1)
       |    END AS bk
       |  FROM s, wp, range(0, 8) t(b) WHERE b < 64 // w),
       |rare AS (SELECT b, bk FROM bands GROUP BY b, bk
       |  HAVING COUNT(*) <= ${Similarity.MaxBandDocs}),
       |bc AS (SELECT bands.media_id, bands.lo, bands.hi, bands.b, bands.bk
       |  FROM bands JOIN rare USING (b, bk)),
       |cand AS (SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
       |    a.lo AS lo_a, a.hi AS hi_a, b.lo AS lo_b, b.hi AS hi_b
       |  FROM bc a JOIN bc b ON a.b = b.b AND a.bk = b.bk AND a.media_id < b.media_id)""".stripMargin
  }

  private val SqlMediaHamming =
    "bit_count(xor(lo_a, lo_b)) + bit_count(xor(hi_a, hi_b))"

  /** The complete q92 oracle statement — a val so the caption-conflict
    * oracle (q131) embeds the IDENTICAL pair text as a subquery.
    */
  private lazy val SqlMediaPairSql: String =
    s"""WITH $SqlMediaPairCtes
       |SELECT media_a, media_b,
       |  CAST($SqlMediaHamming AS BIGINT) AS hamming
       |FROM cand
       |WHERE $SqlMediaHamming <= 8""".stripMargin
}
