package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of the LEXICAL inverted index — the
  * [[DocStream]] band-index protocol applied to the BM25 serve substrate
  * ([[graft.queries.TextAnalysis]]'s staged postings/doclen/df), so
  * arriving documents become SERVABLE, not merely scorable against
  * frozen standing queries ([[DocStream.bm25Scored]]'s posture). A
  * retrospective-search deployment over a growing corpus runs exactly
  * this pair: micro-batches fold arrivals into a partitioned accumulated
  * index; ad-hoc queries serve from it with the batch serve's
  * byte-identical integer arithmetic (LexStreamSpec pins serve ≡ a batch
  * `ensureLexIndex` rebuild over the union corpus).
  *
  * Index layout — ONE relation, epoch- and term-bucket-partitioned
  * (`<lexPath>/batch_id=N/tb=B/`), two row kinds:
  *
  *   - postings rows `(doc_id, term, tf)` under `tb = hash(term) mod
  *     [[LexTermBuckets]]` — a query's candidate fetch partition-prunes
  *     to its terms' buckets exactly like the batch serve bucket-prunes
  *     its staged table, and df is DERIVED from the pruned postings
  *     (df(term) = count of postings rows), so no second relation needs
  *     incremental maintenance;
  *   - one doc-stat row per arriving document `(doc_id, term = NULL,
  *     tf = dl)` under the reserved `tb = -1` partition — the
  *     corpus scalars (N = stat rows, L = Σ dl) and the per-candidate
  *     dl join read ONLY this partition; null-text documents carry
  *     dl = 0 and still count into N, the batch index's convention
  *     (they shape idf, never candidacy).
  *
  * Exactly-once is [[BatchProtocol]] verbatim: the epoch write is
  * `overwrite` into the batch's own directory (redelivery replaces a
  * partial attempt instead of appending duplicates), the commit marker
  * lands LAST, and a fully-committed batch no-ops on redelivery. Unlike
  * the dedup stream there is no pre-batch index read — the fold is
  * append-only — so the single write + marker is the whole crash
  * surface. Epoch-count growth is bounded by [[compactLexIndex]]
  * (BatchProtocol's consolidated negative epoch, partitioned by `tb`),
  * run quiesced or on the `compactEvery` cadence inside the stream.
  * Each document is expected ONCE across the stream's lifetime (the
  * dedup stream's source contract); a source that re-sends a document
  * under two different batch ids would double-count its df/tf exactly
  * as it would double-insert a band row there.
  */
object LexStream {

  /** Term-bucket fan-out of the accumulated postings. Fixed per index
    * lifetime (the partition values are the index's layout — changing it
    * is a [[DocStream.rebandIndex]]-class migration, not a knob): a
    * serve prunes to ≤ query-term buckets of arbitrarily many epochs, so
    * the value trades per-epoch file count against prune selectivity.
    */
  val LexTermBuckets = 64

  /** Reserved `tb` partition holding the per-document stat rows. */
  private val StatBucket = -1

  private def termBucket(term: org.apache.spark.sql.Column) =
    pmod(hash(term), lit(LexTermBuckets)).cast("int")

  /** Takedown: mark documents DELETED from an accumulated index (lexical
    * or positional root — each root masks independently; a paired
    * deployment calls this once per root). Full protocol in
    * [[Tombstones]]: the serves anti-join their reads (postings,
    * positions, AND the stat rows, so N/L/avgdl/df all read as if the
    * documents never arrived — LexStreamSpec pins the serve
    * byte-identical to a rebuild over the corpus minus the deletions),
    * and [[compactLexIndex]] purges physically.
    */
  def deleteDocs(spark: SparkSession, indexPath: String,
      docIds: Seq[Long], requestId: String): Unit =
    Tombstones.delete(spark, indexPath, docIds, requestId, "doc_id")

  private def masked(spark: SparkSession, indexPath: String,
      rel: DataFrame): DataFrame =
    Tombstones.masked(spark, indexPath, rel, "doc_id")

  /** The `foreachBatch` body, exactly-once per `batchId` — fold one
    * micro-batch of `(doc_id, …, text)` arrivals into the accumulated
    * index at `lexPath`.
    */
  def processLexBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, lexPath: String): Unit = {
    if (BatchProtocol.committed(spark, lexPath, batchId))
      return // replayed, fully committed
    // one pinned checkpoint: the tf aggregate and the stat projection
    // both read the ephemeral micro-batch source (the processBatch
    // discipline — and the same leak-proof release contract)
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try {
      val tf = stable
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("tb", termBucket(col("term")))
      // dl = size(tokens) ≡ Σ tf (same tokenizer); null text → 0, so
      // the document still counts into N — the batch index's convention
      val stats = stable.select(col("doc_id"),
        lit(null).cast("string").as("term"),
        coalesce(size(tokens(col("text"))), lit(0)).cast("long").as("tf"),
        lit(StatBucket).as("tb"))
      tf.unionByName(stats)
        .write.partitionBy("tb").mode("overwrite")
        .parquet(s"$lexPath/batch_id=$batchId")
      BatchProtocol.commit(spark, lexPath, batchId)
    } finally graft.CheckpointBlocks.free(spark, stableIds)
  }

  /** The positional layer's `foreachBatch` body — [[processLexBatch]]
    * for the phrase serve substrate: one (doc_id, term, pos) row per
    * token occurrence of the batch, same `tb` partitioning, same marker
    * protocol under the SEPARATE `posPath` index root (its own
    * `_commits`; the two layers commit independently and each is
    * idempotent, so a crash between them just recomputes the
    * uncommitted one on redelivery). No stat rows: adjacency needs no
    * corpus scalars, and null-text docs contribute no positions.
    */
  def processPosBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, posPath: String): Unit = {
    if (BatchProtocol.committed(spark, posPath, batchId))
      return // replayed, fully committed
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try {
      stable
        .select(col("doc_id"),
          posexplode(tokens(col("text"))).as(Seq("pos", "term")))
        .select(col("doc_id"), col("term"), col("pos"),
          termBucket(col("term")).as("tb"))
        .write.partitionBy("tb").mode("overwrite")
        .parquet(s"$posPath/batch_id=$batchId")
      BatchProtocol.commit(spark, posPath, batchId)
    } finally graft.CheckpointBlocks.free(spark, stableIds)
  }

  /** Streaming incremental lexical indexing: every micro-batch of
    * documents folds into `<lexPath>` — and, when `posPath` is given,
    * into the positional layer too (ONE stream maintains both serve
    * substrates, the production retrieval-index shape) — under the
    * exactly-once protocol; `compactEvery > 0` self-compacts after
    * every N-th commit (quiescence holds by construction inside
    * foreachBatch — the [[DocStream.runNearDedup]] cadence contract).
    */
  def runLexIndex(docs: DataFrame, lexPath: String, checkpoint: String,
      compactEvery: Int = 0, posPath: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processLexBatch(batch.sparkSession, batch, batchId, lexPath)
        posPath.foreach(p =>
          processPosBatch(batch.sparkSession, batch, batchId, p))
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          compactLexIndex(batch.sparkSession, lexPath, batchId)
          // the positional root shares the layout column AND the
          // tombstone protocol — one purging compaction for both layers
          posPath.foreach(p =>
            compactLexIndex(batch.sparkSession, p, batchId))
          ()
        }
      }
      .start()

  /** Merge committed epochs ≤ `upToBatch` into one consolidated
    * `tb`-partitioned epoch (file count bounded by compaction cadence,
    * not stream age) — [[BatchProtocol.compactIndex]] with this index's
    * layout columns. Full ordering/crash contract there. Works verbatim
    * on a positional-layer root too (same layout column).
    *
    * Tombstoned rows are PURGED from the consolidated epoch (the
    * `rowFilter` hook — masking already hides them, so the purge changes
    * no serve), and the per-request tombstone files consolidate into one
    * ([[Tombstones.consolidate]] — ids are retained, they may still mask
    * epochs this compaction did not merge).
    */
  def compactLexIndex(spark: SparkSession, lexPath: String,
      upToBatch: Long): Int = {
    val n = BatchProtocol.compactIndex(spark, lexPath, upToBatch, Seq("tb"),
      rowFilter = rel => masked(spark, lexPath, rel))
    Tombstones.consolidate(spark, lexPath, upToBatch, "doc_id")
    n
  }

  /** Exact-phrase top-k against the ACCUMULATED positional layer — the
    * [[lexTopDocs]] posture for quoted queries: each external (qid,
    * qtext) query's first `k` tokens are the phrase, ranking and
    * arithmetic are the staged serve's verbatim (the shared
    * [[graft.queries.TextAnalysis.phraseAdjacencyTopDocs]] fold —
    * LexStreamSpec pins byte-parity against a batch q154/q158 rebuild
    * over the union corpus). The bounded driver read of the ≤
    * k·|queries| phrase terms buys the `tb` partition prune + term
    * literal-IN on every adjacency side.
    */
  def posTopDocs(spark: SparkSession, posPath: String,
      queries: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 2, s"a phrase needs at least two tokens, got $k")
    val qp = queries.select(col("qid"), tokens(col("qtext")).as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col("qid") +:
        (1 to k).map(i => element_at(col("tk"), i).as(s"t$i")): _*)
    val termRows = qp
      .select(explode(array((1 to k).map(i => col(s"t$i")): _*)).as("term"))
      .select(col("term"), termBucket(col("term")).as("tb"))
      .distinct().collect()
    val terms: Array[Any] = termRows.map(_.getString(0))
    val tbs: Array[Any] = termRows.map(r => Int.box(r.getInt(1)): Any).distinct
    // the serve AGGREGATES index rows, so it must exclude epochs a
    // crashed compaction left beside their consolidated copy (and an
    // epoch-less new index serves a defined empty, not a schema error)
    val servable = BatchProtocol.readServable(spark, posPath)
    if (terms.isEmpty || servable.isEmpty)
      queries.select(col("qid"), lit(0L).as("rnk"),
        lit(0L).as("doc_id"), lit(0L).as("phrase_tf")).limit(0)
    else
      graft.queries.TextAnalysis.phraseAdjacencyTopDocs(
        masked(spark, posPath, servable.get
          .filter(col("tb").isin(tbs: _*))
          .filter(col("term").isin(terms: _*))
          .select("doc_id", "term", "pos")),
        qp, k)
  }

  /** One-row observability card for an accumulated index root — the
    * ops read an index owner checks between serves (the q160 posture
    * for the INCREMENTAL substrate, where the staged card cannot see
    * epochs, markers, or takedowns): live stream epochs, whether a
    * consolidated epoch exists, the compaction watermark, row counts by
    * layer (postings vs the reserved stat partition — 0 on a positional
    * root, which carries no stats), and the takedown posture (request
    * files and distinct masked ids). Costs ONE pruned-column scan of
    * the index plus the bounded tombstone read; serves nothing itself,
    * so it is spec-verified against hand-built index states rather than
    * a DuckDB oracle (the accumulated roots exist only at runtime).
    */
  def indexCard(spark: SparkSession, indexPath: String): DataFrame = {
    import spark.implicits._
    val epochs = BatchProtocol.epochIds(spark, indexPath)
    val wm = BatchProtocol.compactedThrough(spark, indexPath)
    // servable counts (crash-leftover epochs a consolidated copy
    // supersedes are excluded — they are about to be cleaned up, and
    // double-counting them would false-alarm the ops check); an
    // epoch-less root is the defined all-zero card, not a schema error
    val (post, stat) = BatchProtocol.readServable(spark, indexPath) match {
      case None => (0L, 0L)
      case Some(idx) =>
        val r = idx
          .agg(sum(when(col("tb") =!= StatBucket, 1L).otherwise(0L)),
            sum(when(col("tb") === StatBucket, 1L).otherwise(0L))).head
        (Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
          Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
    val (nReq, nTomb) = Tombstones.ids(spark, indexPath, "doc_id") match {
      case None => (0L, 0L)
      case Some(t) =>
        (t.select(input_file_name()).distinct().count(),
          t.distinct().count())
    }
    Seq((epochs.count(_ >= 0).toLong, epochs.exists(_ < 0), wm,
      post, stat, nReq, nTomb))
      .toDF("n_stream_epochs", "has_consolidated", "compacted_through",
        "n_postings_rows", "n_stat_rows", "n_tomb_files", "n_tomb_ids")
  }

  /** The accumulated index's doc-stat partition (one row per arrived
    * document) — `tb = -1` hits only the partition column, so the scan
    * reads no postings bucket. `idx` is the caller's servable read.
    */
  private def statRows(spark: SparkSession, lexPath: String,
      idx: DataFrame): DataFrame =
    masked(spark, lexPath, idx
      .filter(col("tb") === StatBucket)
      .select(col("doc_id"), col("tf").as("dl")))

  /** BM25 top-[[graft.queries.TextAnalysis.Bm25TopK]] per query against
    * the ACCUMULATED index — the batch serve's integer fixed point
    * (milli-scale log-free idf × centi-scale quantized tfn, int64
    * per-term products, order-independent sums) re-derived from the
    * incremental layout, byte-identical to a batch `ensureLexIndex`
    * rebuild over the union corpus (LexStreamSpec). `queries` is a
    * bounded `(qid BIGINT, qtext STRING)` relation of EXTERNAL query
    * strings — the ad-hoc form the batch q148 samples from the corpus.
    *
    * Plan shape mirrors the batch serve: the per-query term cap rides a
    * qid-partitioned window; ONE bounded driver read of the capped
    * terms (≤ |queries|·cap rows) buys BOTH the `tb` partition prune
    * and the term literal-IN on the postings read, so candidate work ∝
    * the query terms' postings across however many epochs hold them —
    * never the corpus; df folds from exactly those pruned rows; the
    * corpus scalars and dl come from the stat partition alone; the
    * final cut is a qid-partitioned window (WindowGroupLimit).
    */
  def lexTopDocs(spark: SparkSession, lexPath: String,
      queries: DataFrame): DataFrame = {
    import graft.queries.TextAnalysis.{Bm25QTermCap, Bm25TopK}
    val qt0 = queries
      .select(col("qid"), explode(tokens(col("qtext"))).as("term"))
      .groupBy("qid", "term").agg(count(lit(1)).as("qtf"))
    val wq = Window.partitionBy("qid").orderBy(desc("qtf"), asc("term"))
    val qt = qt0.withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= Bm25QTermCap).select("qid", "term")
    // the bounded driver read that buys the prune (the bm25Stage
    // discipline): capped distinct query terms with their buckets
    val termRows = qt.select(col("term"), termBucket(col("term")).as("tb"))
      .distinct().collect()
    val terms: Array[Any] = termRows.map(_.getString(0))
    val tbs: Array[Any] =
      termRows.map(r => Int.box(r.getInt(1)): Any).distinct
    // aggregate-consumer discipline: exclude crash-superseded epochs,
    // and serve a defined empty on an epoch-less new index
    val servable = BatchProtocol.readServable(spark, lexPath)
    if (terms.isEmpty || servable.isEmpty)
      // no query has a term (null/empty query strings) or no batch has
      // arrived: a defined empty serve with the contract schema, not an
      // empty-IN plan / schema-inference error
      queries.select(col("qid"), lit(0L).as("rnk"),
        lit(0L).as("doc_id"), lit(0L).as("score_u")).limit(0)
    else {
      val stats = statRows(spark, lexPath, servable.get)
      // N counts every arrived document (null text included — the batch
      // convention); L is null-safe for an all-null-text corpus
      val (n, l) = {
        val r = stats.agg(count(lit(1)), sum("dl")).head
        (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
      }
      val a = math.max(1L, l / math.max(1L, n))
      // the takedown mask applies to candidates AND (via statRows) the
      // corpus scalars/dl, so a deleted doc vanishes from df and idf
      // exactly as a rebuild-without-it would have it
      val post = masked(spark, lexPath, servable.get
        .filter(col("tb").isin(tbs: _*))       // partition prune
        .filter(col("term").isin(terms: _*))   // row cut inside buckets
        .select("doc_id", "term", "tf"))
      // df derives from the pruned postings — the accumulated layout
      // maintains ONE relation, not three
      val dfq = post.groupBy("term").agg(count(lit(1)).as("df"))
      val qtIdf = qt.join(broadcast(dfq), Seq("term"))
        .withColumn("idf_m",
          expr(s"(${2 * n} - 2*df + 1) * 1000 div (2*df + 1)"))
        .select("qid", "term", "idf_m")
      val w = Window.partitionBy("qid").orderBy(desc("score_u"), asc("doc_id"))
      post.join(broadcast(qtIdf), Seq("term"))
        .join(stats, Seq("doc_id"))
        .withColumn("tscore",
          expr(s"idf_m * ((${2200 * a} * tf) div" +
            s" (${10 * a} * tf + ${3 * a} + 9 * dl))"))
        .groupBy("qid", "doc_id").agg(sum("tscore").as("score_u"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= Bm25TopK)
        .select("qid", "rnk", "doc_id", "score_u")
    }
  }
}
