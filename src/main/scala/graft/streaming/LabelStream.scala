package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming incremental near-dup LABEL maintenance — the micro-batch
  * dual of the batch append ([[graft.queries.Dedup.appendLabels64]],
  * q184), completing the label artifact's lifecycle: fresh closure
  * (q150), batch growth (q184), physical erasure
  * (`Dedup.rebuildLabelsAfterPurge`), and now arrivals.
  *
  * Root layout (the [[BatchProtocol]] discipline, one level down so the
  * adopted base stays outside the epoch scan):
  *
  *   `<root>/base/`        the ADOPTED pre-stream corpus: one row per
  *                         document `(doc_id, lo, hi, cluster_id)` —
  *                         its 64-bit sketch (null for null text, the
  *                         q42 posture) and its staged label.
  *   `<root>/_width=W`     the band width FROZEN at adoption (derived
  *                         from the base corpus — the frozen-model
  *                         stance: a stream cannot know its final
  *                         corpus size; the q191 drift card is the
  *                         batch-side rebuild signal for the same
  *                         boundary).
  *   `<root>/stream/`      BatchProtocol epochs `batch_id=N`: the
  *                         batch's sketch+label rows PLUS re-rooted
  *                         override rows `(doc_id, null, null,
  *                         cluster_id)` for previously-labeled
  *                         documents whose cluster merged through an
  *                         arrival — label reads are LAST-WRITE-WINS
  *                         per doc_id over (base, epochs).
  *
  * Per batch: band the arrivals and every PRIOR sketch (base + served
  * epochs — from storage, texts are never re-read) under the frozen
  * width, recompute the frequency caps over the union (admission then
  * matches what a batch append at this moment would compute), generate
  * only arrival-involving pairs, contract prior labels to super-nodes,
  * run the shared closure on the collision-sized contracted graph, and
  * emit ONLY the batch's labels plus the CHANGED prior labels — epoch
  * size tracks the arrival's true collisions, never the corpus.
  * Exactly-once is [[BatchProtocol]] verbatim: the fold is
  * deterministic in (prior committed state, batch), so one write +
  * marker is the whole crash surface; a redelivered committed batch is
  * a no-op.
  *
  * Epoch growth is bounded by RE-ADOPTION, not [[BatchProtocol
  * .compactIndex]]: consolidation merges epochs under one id, which
  * would destroy the last-write-wins ordering the override rows depend
  * on. The consolidation path for this root is [[initRoot]] over the
  * current served labels + sketches (fold everything into a fresh
  * base); automating that crash-safely is the next increment — until
  * then the epoch count tracks arrival cadence, exactly like the ADC
  * sidecar between compactions.
  *
  * Exactness contract (the q184 boundary, streamed): the served labels
  * equal a fresh clustering of base ∪ arrivals whenever no band
  * parameter crosses its boundary ACROSS THE WHOLE ARRIVAL HISTORY —
  * each batch's caps see only the sketches present so far, so a bucket
  * that crosses the cap in a LATER batch leaves earlier admissions in
  * place (merges never retract). LabelStreamSpec pins the identity on
  * the real corpus and a planted cross-batch bridge.
  */
object LabelStream {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def streamRoot(root: String) = s"$root/stream"

  private val WidthPrefix = "_width="

  /** Adopt the pre-stream corpus: its sketches + staged labels become
    * the base the arrivals append to, and the band width freezes at
    * the base-derived value. Idempotent (overwrite + width re-write) —
    * re-adoption replaces the base wholesale.
    */
  def initRoot(spark: SparkSession, root: String, baseDocs: DataFrame,
      baseLabels: DataFrame, width: Int): Unit = {
    graft.queries.Similarity.sketch64(baseDocs)
      .join(baseLabels, Seq("doc_id"))
      .write.mode("overwrite").parquet(s"$root/base")
    val f = fs(spark, root)
    f.listStatus(new Path(root)).iterator
      .map(_.getPath).filter(_.getName.startsWith(WidthPrefix))
      .foreach(p => f.delete(p, false))
    f.create(new Path(s"$root/$WidthPrefix$width"), true).close()
  }

  private def widthOf(spark: SparkSession, root: String): Int = {
    val f = fs(spark, root)
    f.listStatus(new Path(root)).iterator
      .map(_.getPath.getName).filter(_.startsWith(WidthPrefix))
      .map(_.stripPrefix(WidthPrefix).toInt)
      .foldLeft(None: Option[Int])((a, b) => Some(a.fold(b)(math.max(_, b))))
      .getOrElse(sys.error(s"label root $root has no frozen width — " +
        "initRoot must adopt a base before the stream starts"))
  }

  /** The PRIOR state a batch folds against: base + COMMITTED epochs
    * only, the current batch's own id excluded — a crash between the
    * epoch write and its marker leaves the epoch's files visible, and
    * a replay that read its own partial output would fold doc labels
    * twice and OVERWRITE the epoch with a smaller one (losing the
    * crashed write's override rows). Restricting the fold input to the
    * committed prior makes the replay recompute from exactly the
    * original input — deterministic, so the rewritten epoch is
    * byte-equal and the marker lands (LabelStreamSpec pins the
    * crash-replay convergence).
    */
  private def priorRows(spark: SparkSession, root: String,
      batchId: Long): DataFrame = {
    val sroot = streamRoot(root)
    val base = spark.read.parquet(s"$root/base")
      .withColumn("batch_id", lit(-1L))
    BatchProtocol.readServable(spark, sroot).fold(base) { e =>
      val live = BatchProtocol.epochIds(spark, sroot)
        .filter(id => id != batchId &&
          (id < 0 || BatchProtocol.committed(spark, sroot, id)))
      base.unionByName(e.select(
          col("doc_id"), col("lo"), col("hi"), col("cluster_id"),
          col("batch_id").cast("long"))
        .filter(col("batch_id").isin(live: _*)))
    }
  }

  /** One micro-batch of arriving `(doc_id, text)` documents: the
    * incremental append against everything committed so far, emitting
    * the batch's labels plus the changed prior labels as epoch
    * `batch_id=N`. Crash-safe and redelivery-idempotent per
    * [[BatchProtocol]].
    */
  def processLabelBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, root: String): Unit = {
    val sroot = streamRoot(root)
    if (BatchProtocol.committed(spark, sroot, batchId))
      return // replayed, fully committed
    val w = widthOf(spark, root)
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    try {
      val prior = priorRows(spark, root, batchId)
      val priorLabels = prior
        .groupBy("doc_id")
        .agg(expr("max_by(cluster_id, batch_id)").as("cluster_id"))
      val priorSk = prior.filter(col("lo").isNotNull)
        .select("doc_id", "lo", "hi")
      // an at-least-once source can redeliver a document in a LATER
      // batch id (the committed-batch guard only catches same-id
      // replays); an already-labeled doc_id folding through the append
      // again would emit a second, conflicting label row (its pairs
      // contract to its own super-node, leaving it an isolated
      // singleton), so re-arrivals DROP here — label maintenance is
      // append-only per id, first write wins (LabelStreamSpec pins the
      // cross-batch redelivery no-op)
      val batchSk = graft.queries.Similarity.sketch64(stable)
        .join(priorLabels.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .persist() // feeds the band join, the epoch write, and newIds
      val appended = graft.queries.Dedup.appendLabelsFromBands(spark,
        priorLabels,
        graft.queries.Similarity.bandsFromSketches(priorSk, w),
        graft.queries.Similarity.bandsFromSketches(
          batchSk.filter(col("lo").isNotNull), w),
        batchSk.select(col("doc_id")))
      // epoch rows: the batch's own sketch+label rows, plus overrides
      // for prior documents whose label MOVED (sketch columns null —
      // their sketch lives in its original epoch)
      val batchIds = batchSk.select(col("doc_id"))
      val batchRows = batchSk.join(
        appended.join(batchIds, Seq("doc_id"), "left_semi"), Seq("doc_id"))
        .select("doc_id", "lo", "hi", "cluster_id")
      val moved = appended.join(batchIds, Seq("doc_id"), "left_anti")
        .join(priorLabels.withColumnRenamed("cluster_id", "prev_cid"),
          Seq("doc_id"))
        .filter(col("cluster_id") =!= col("prev_cid"))
        .select(col("doc_id"), lit(null).cast("long").as("lo"),
          lit(null).cast("long").as("hi"), col("cluster_id"))
      batchRows.unionByName(moved)
        .write.mode("overwrite").parquet(s"$sroot/batch_id=$batchId")
      BatchProtocol.commit(spark, sroot, batchId)
    } finally {
      // the append's closure scaffolding (pair persists, checkpoint
      // rounds, batchSk) is dead once the epoch is on disk; the PINNED
      // batch blocks predate the snapshot and stay
      (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
        .foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
          .foreach(_.unpersist(false)))
      graft.CheckpointBlocks.free(spark, stableIds)
    }
  }

  /** The served label set — last-write-wins per document over (base,
    * COMMITTED epochs): `(doc_id, cluster_id)` for every document ever
    * adopted or arrived. The committed filter is the same one the fold
    * input uses: a crash-leftover epoch without its marker is NOT
    * delivered state and must not serve (its replay will re-commit the
    * identical rows).
    */
  def servableLabels(spark: SparkSession, root: String): DataFrame =
    priorRows(spark, root, Long.MinValue)
      .groupBy("doc_id")
      .agg(expr("max_by(cluster_id, batch_id)").as("cluster_id"))

  /** Streaming entry: maintain the label root from an unbounded
    * `(doc_id, text)` stream — foreachBatch over
    * [[processLabelBatch]] (the [[EmbedStream.runAdcIngest]] shape).
    * The root must have been adopted ([[initRoot]]) first.
    */
  def runLabelMaintenance(docs: DataFrame, root: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processLabelBatch(b.sparkSession, b, id, root)
      }
      .start()
}
