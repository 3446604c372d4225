package graft.streaming

import graft.functions.TextFunctions.portableHashLocal
import graft.functions.VectorFunctions.{hyperplaneBands, vecDot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental streaming embedding near-dedup — the streaming form of
  * q39's banded hyperplane-LSH cosine dedup, exactly as
  * [[DocStream]]'s near-dedup is the streaming form of q27: each
  * micro-batch band-joins its vectors against the accumulated survivor
  * index on `(family, bucket)`, verifies candidates with ONE exact
  * codegen'd cosine per pair, admits survivors greedily to the smallest
  * vec_id, and appends their band rows to the index.
  *
  * The planes are the SAME deterministic sha-derived sequence q39 uses
  * (`plane<p>_<i>`), with the planes-per-family count an INDEX-LIFETIME
  * constant (batch q39 derives it per corpus; an index's band keys must
  * stay comparable across every batch — widening is a re-band pass over
  * the stored vectors, as in [[DocStream.rebandIndex]]).
  *
  * Crash safety is [[DocStream]]'s marker protocol verbatim: batch-scoped
  * overwrite directories, survivors first, own-epoch-excluded index
  * reads, commit marker last. The index partitions by the bucket group
  * `g = bk mod 64` and each batch's read is pruned to its own groups.
  */
object EmbedStream {

  private[streaming] val BkBuckets = 64
  private val Families = 20

  /** Streaming per-source centroid sums: q115's corpus-facing
    * (source, pos, c) stage as additive stream state over an unbounded
    * `(source, embedding, …)` vector stream — the
    * [[DocStream.sourceTokenCounts]] posture (update/complete mode, no
    * watermark; state = |sources|·dims longs forever, the VALUE space,
    * not the stream length). The similarity matrix is
    * [[graft.queries.Similarity.matrixFromSums]]'s tiny batch step over
    * the emitted table; the shared fixed-point Columns make streamed
    * sums bit-identical to batch q115's.
    */
  def centroidSums(vecs: DataFrame): DataFrame =
    graft.queries.Similarity.sourceCentroidSums(vecs)

  /** Streaming IVF cell assignment — the index-MAINTENANCE dual of the
    * shared cell machinery (q35/q101/q117 route through it): k-means
    * training is corpus-global and stays a batch job; the stream
    * assigns arriving vectors against the FROZEN centroid table with
    * the IDENTICAL argmax ([[graft.queries.Similarity.assignCells]] —
    * one definition, zero drift). Stateless narrow per-row (centroids
    * are a driver literal baked into the expression: no shuffle, no
    * state, any output mode — the dsirScored posture), so an index
    * ingests new vectors at scan speed; cell health (q117's report) is
    * a re-aggregation over the emitted assignments, and the upgrade
    * path when the stream drifts from the trained cells is re-training,
    * which the q117 card is exactly the trigger for. Zero-norm arrivals
    * are dropped by the shared q28 guard, as in every cosine operator.
    */
  def ivfAssigned(vecs: DataFrame,
      cents: Array[(Int, Seq[Double], Double)]): DataFrame =
    graft.queries.Similarity.assignCells(
      vecs.select(col("vec_id"), col("embedding"),
          sqrt(vecDot(col("embedding"), col("embedding"))).as("nrm"))
        .filter(col("nrm") > 0), cents)

  /** The `foreachBatch` body of the SERVABLE accumulated IVF index —
    * the [[LexStream]] posture for vectors ([[ivfAssigned]] only
    * assigns; this makes arrivals probe-able): each micro-batch's
    * non-zero-norm vectors are cell-assigned against the FROZEN
    * centroid table (the shared q35 argmax — k-means training stays a
    * corpus-global batch job) and written as (vec_id, embedding, nrm,
    * cell) under `<idxPath>/batch_id=N/cell=C`, so a probe's candidate
    * read partition-prunes to its probed cells across every epoch —
    * exactly the staged batch index's (q68) pruned-scan discipline in
    * accumulated form. Exactly-once is [[BatchProtocol]] verbatim; the
    * fold is append-only (no pre-batch read), so one write + marker is
    * the whole crash surface. Compact with [[compactIvfIndex]].
    */
  def processIvfBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      idxPath: String, cents: Array[(Int, Seq[Double], Double)]): Unit = {
    if (BatchProtocol.committed(spark, idxPath, batchId))
      return // replayed, fully committed
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try {
      val e = stable.select(col("vec_id"), col("embedding"),
          sqrt(vecDot(col("embedding"), col("embedding"))).as("nrm"))
        .filter(col("nrm") > 0) // the shared q28 zero-norm guard
      e.join(graft.queries.Similarity.assignCells(e, cents), Seq("vec_id"))
        .select("vec_id", "embedding", "nrm", "cell")
        .write.partitionBy("cell").mode("overwrite")
        .parquet(s"$idxPath/batch_id=$batchId")
      BatchProtocol.commit(spark, idxPath, batchId)
    } finally graft.CheckpointBlocks.free(spark, stableIds)
  }

  /** The `foreachBatch` body of the accumulated ADC SIDECAR — the
    * [[processIvfBatch]] posture for the COMPRESSED read path: each
    * micro-batch's vectors encode under the FROZEN centroid + PQ
    * codebook tables (the one shared
    * [[graft.queries.Similarity.pqCodes]] definition — an arrival's
    * codes are bit-identical to the same vector in a full re-stage) and
    * land as (vec_id, cell, code0..codeM-1) under
    * `<adcPath>/batch_id=N/cell=C`. A production deployment keeps this
    * root NEXT TO the session-staged code table: the composed serve
    * (q91/q122's shape) unions the staged scan with
    * [[adcServable]]'s epoch read, so arrivals become probe-able at
    * micro-batch latency without ever re-staging the historical corpus
    * — 256 B of float32 per vector stay off the index on both halves.
    * Exactly-once is [[BatchProtocol]] verbatim (append-only fold: one
    * write + marker is the whole crash surface); compact with
    * [[compactIvfIndex]] — the protocol is layout-identical (cell
    * partitions, vec_id tombstones).
    */
  def processAdcBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      adcPath: String, cents: Array[(Int, Seq[Double], Double)],
      books: Array[Array[Array[Double]]]): Unit = {
    if (BatchProtocol.committed(spark, adcPath, batchId))
      return // replayed, fully committed
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try {
      graft.queries.Similarity.pqCodes(stable, cents, books)
        .write.partitionBy("cell").mode("overwrite")
        .parquet(s"$adcPath/batch_id=$batchId")
      BatchProtocol.commit(spark, adcPath, batchId)
    } finally graft.CheckpointBlocks.free(spark, stableIds)
  }

  /** The accumulated ADC root's SERVABLE code rows — the union leg a
    * composed probe adds to its staged scan: epochs read through
    * [[BatchProtocol.readServable]] (so a crashed compaction never
    * double-serves a code row — ADC probes RETURN rows) and masked
    * against the root's takedown tombstones. None = no epoch yet (a
    * fresh sidecar: the union degenerates to the staged scan alone).
    */
  def adcServable(spark: SparkSession, adcPath: String): Option[DataFrame] =
    BatchProtocol.readServable(spark, adcPath).map(rel =>
      Tombstones.masked(spark, adcPath, rel.drop("batch_id"), "vec_id"))

  /** Takedown: mark vectors DELETED from the accumulated IVF index —
    * the [[LexStream.deleteDocs]] protocol with the vector side's key
    * ([[Tombstones]] holds the one shared implementation): [[ivfTopK]]
    * anti-joins its pruned candidate read, [[compactIvfIndex]] purges
    * physically and consolidates the request files.
    */
  def deleteVecs(spark: SparkSession, idxPath: String,
      vecIds: Seq[Long], requestId: String): Unit =
    Tombstones.delete(spark, idxPath, vecIds, requestId, "vec_id")

  /** Merge the accumulated IVF index's committed epochs ≤ `upToBatch`
    * into one consolidated `cell`-partitioned epoch —
    * [[BatchProtocol.compactIndex]] with this index's layout column.
    * Tombstoned vectors are purged from the consolidated epoch (masking
    * already hides them, so the purge changes no probe).
    */
  def compactIvfIndex(spark: SparkSession, idxPath: String,
      upToBatch: Long): Int = {
    val n = BatchProtocol.compactIndex(spark, idxPath, upToBatch, Seq("cell"),
      rowFilter = rel => Tombstones.masked(spark, idxPath, rel, "vec_id"))
    Tombstones.consolidate(spark, idxPath, upToBatch, "vec_id")
    n
  }

  /** IVF probe top-k against the ACCUMULATED index — the q68 serve over
    * arrivals: the EXTERNAL query vector's `probes` best cells come
    * from the same frozen centroid cosine argmax (ties to the lowest
    * cell), the candidate read partition-prunes to those cells, and the
    * exact cosine + (cos DESC, vec_id) cut reuse q68's Column
    * expressions verbatim — IvfStreamSpec pins byte-parity against the
    * staged batch serve on the union corpus. A zero-norm query has no
    * cosine and serves a defined empty (the q122 posture).
    */
  def ivfTopK(spark: SparkSession, idxPath: String,
      cents: Array[(Int, Seq[Double], Double)], queryVec: Seq[Double],
      probes: Int = 2, k: Int = 10): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions.vecDotMany
    val q = Seq(Tuple1(queryVec)).toDF("qv")
      .select(col("qv"), sqrt(vecDot(col("qv"), col("qv"))).as("qn"))
    // the probe selection: ONE 1-row job over the broadcast-bounded
    // centroid table with the shared cosine/tie discipline — never a
    // driver-side float reimplementation that could diverge from the
    // assignment argmax
    val qCells: Array[Long] = q
      .select(posexplode(zip_with(
        vecDotMany(col("qv"), cents.flatMap(_._2).toArray, cents.length),
        typedLit(cents.map(_._3).toSeq),
        (d, cn) => when(col("qn") > 0, d / (col("qn") * cn)))))
      .select(col("pos").cast("long").as("cent_id"), col("col").as("ccos"))
      .filter(col("ccos").isNotNull)
      .orderBy(desc("ccos"), asc("cent_id")).limit(probes)
      .collect().map(_.getLong(0))
    // the probe RETURNS index rows, so it must exclude epochs a crashed
    // compaction left beside their consolidated copy (a duplicate row
    // would surface the same vec_id twice in top-k); an epoch-less new
    // index serves a defined empty, not a schema error
    val servable = BatchProtocol.readServable(spark, idxPath)
    if (qCells.isEmpty || servable.isEmpty)
      // zero-norm query (every ccos folded null) or empty index — a
      // defined empty
      spark.emptyDataFrame.select(lit(0L).as("vec_id"),
        lit(0L).as("cell"), lit(0.0).as("cos")).limit(0)
    else
      Tombstones.masked(spark,
        idxPath,
        servable.get
          .filter(col("cell").isin(qCells.map(Long.box): _*)), "vec_id")
        .crossJoin(broadcast(q))
        .select(col("vec_id"), col("cell"),
          (vecDot(col("embedding"), col("qv")) /
            (col("nrm") * col("qn"))).as("cos"))
        .orderBy(desc("cos"), asc("vec_id"))
        .limit(k)
  }

  /** q39's deterministic plane component (Similarity mirrors this): the
    * sha-32 of "plane<p>_<i>" scaled to [-1, 1).
    */
  private def planeComp(p: Int, i: Int): Double =
    portableHashLocal(s"plane${p}_$i").toDouble / 2147483648.0 - 1.0

  private def planes(k: Int): Array[Double] =
    Array.tabulate(Families * k * 64)(x => planeComp(x / 64, x % 64 + 1))

  /** Band rows `(vec_id, embedding, nrm, f, bk, g)` of a batch —
    * zero-norm vectors (no direction, ANSI divide hazard) are dropped at
    * the source, as in every batch cosine operator.
    */
  private def bandsOf(batch: DataFrame, k: Int): DataFrame =
    batch
      .select(col("vec_id"), col("embedding"),
        sqrt(vecDot(col("embedding"), col("embedding"))).as("nrm"),
        hyperplaneBands(col("embedding"), planes(k), Families, k).as("bks"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        posexplode(col("bks")))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("pos").cast("long").as("f"), col("col").as("bk"))
      .withColumn("g", pmod(col("bk"), lit(BkBuckets)).cast("int"))

  private def emptyIndex(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "vec_id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE, f BIGINT, bk BIGINT"))

  /** The admitted index as this batch must see it: every committed epoch
    * except the batch's own (a crashed attempt may have written
    * uncommitted rows), pruned to the batch's own `g` partitions.
    */
  private[streaming] def prunedIndex(spark: SparkSession, indexPath: String,
      batchId: Long, groups: Seq[Int]): DataFrame =
    try spark.read.parquet(indexPath)
      .filter(col("batch_id").cast("long") =!= lit(batchId))
      .filter(col("g").isin(groups: _*))
      .select("vec_id", "embedding", "nrm", "f", "bk")
    catch { case _: org.apache.spark.sql.AnalysisException =>
      emptyIndex(spark) // first batch: no index directory yet
    }

  /** One micro-batch, exactly-once per `batchId` (the [[DocStream]]
    * protocol): dedup the batch against the index (band equi-join +
    * exact cosine ≥ `threshold`), then greedily within itself, write
    * survivors then the index delta to batch-scoped directories, commit
    * marker last.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String, planesPerFam: Int = 6,
      threshold: Double = 0.35): Unit = {
    if (BatchProtocol.committed(spark, indexPath, batchId))
      return // replayed, fully committed
    // checkpoint-and-pin atomically, free on every path (see
    // DocStream.processBatch for both hazards this structure closes)
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    try processPinnedBatch(spark, stable, batchId, indexPath, outPath,
      planesPerFam, threshold)
    finally graft.CheckpointBlocks.free(spark, stableIds)
  }

  private def processPinnedBatch(spark: SparkSession, stable: DataFrame,
      batchId: Long, indexPath: String, outPath: String,
      planesPerFam: Int, threshold: Double): Unit = {
    // lossless mass-cluster hygiene (see DocStream.processBatch): exact
    // duplicate vectors collapse to their min-id representative before
    // banding — identical vectors share every family bucket at cosine 1,
    // and any verdict against the representative applies to every
    // member, so semantics are unchanged while a mass-duplicate batch
    // stops being a quadratic bucket in the within-batch self-join.
    val reps = stable.groupBy("embedding").agg(min("vec_id").as("vec_id"))
      .select("vec_id", "embedding")
    val bands = bandsOf(reps, planesPerFam).persist()
    try {
      val groups = bands.select("g").distinct().collect().map(_.getInt(0)).toSeq
      val index = prunedIndex(spark, indexPath, batchId, groups)
      def cos(an: String, bn: String) =
        vecDot(col(s"$an.embedding"), col(s"$bn.embedding")) /
          (col(s"$an.nrm") * col(s"$bn.nrm"))
      val crossDup = bands.alias("n").join(index.alias("i"),
          col("n.f") === col("i.f") && col("n.bk") === col("i.bk") &&
          cos("n", "i") >= threshold, "left_semi")
        .select("vec_id").distinct()
      val survBands = bands.join(crossDup, Seq("vec_id"), "left_anti")
      val withinDup = survBands.alias("a").join(survBands.alias("b"),
          col("a.f") === col("b.f") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") < col("b.vec_id") && cos("a", "b") >= threshold)
        .select(col("b.vec_id").as("vec_id")).distinct()
      val keptBands = survBands.join(withinDup, Seq("vec_id"), "left_anti")
      val survivors = stable.join(
        keptBands.select("vec_id").distinct(), Seq("vec_id"))
      survivors.write.mode("overwrite").parquet(s"$outPath/batch_id=$batchId")
      keptBands.write.partitionBy("g").mode("overwrite")
        .parquet(s"$indexPath/batch_id=$batchId")
      BatchProtocol.commit(spark, indexPath, batchId)
    } finally bands.unpersist() // staged bands: cache, not data — caller frees the pins
  }

  /** Merge the index's committed epochs ≤ `upToBatch` into one
    * consolidated `g`-partitioned epoch — [[DocStream.compactIndex]]'s
    * contract for the vector index (crash ordering at
    * [[BatchProtocol.compactIndex]]).
    */
  def compactIndex(spark: SparkSession, indexPath: String,
      upToBatch: Long): Int =
    BatchProtocol.compactIndex(spark, indexPath, upToBatch, Seq("g"))

  /** Streaming incremental embedding near-dedup over a stream of
    * `(vec_id, ingest_ts, embedding)` rows. `compactEvery > 0`
    * self-compacts the index after every N-th committed batch (see
    * [[DocStream.runNearDedup]] for why quiescence holds there).
    */
  /** Run the accumulated ADC sidecar as a streaming query — the
    * production entry point over [[processAdcBatch]]: arriving
    * `(vec_id, embedding)` rows encode under the frozen models and fold
    * into the sidecar's exactly-once epochs; `compactEvery` bounds the
    * epoch count by cadence (the [[runNearDedup]] knob — safe in-stream
    * because `foreachBatch` runs post-commit, where quiescence holds by
    * construction).
    */
  def runAdcIngest(vectors: DataFrame, adcPath: String,
      cents: Array[(Int, Seq[Double], Double)],
      books: Array[Array[Array[Double]]], checkpoint: String,
      compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processAdcBatch(batch.sparkSession, batch, batchId, adcPath,
          cents, books)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          compactIvfIndex(batch.sparkSession, adcPath, batchId); ()
        }
      }
      .start()

  def runNearDedup(vectors: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, planesPerFam: Int = 6, threshold: Double = 0.35,
      compactEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, indexPath, outPath,
          planesPerFam, threshold)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          compactIndex(batch.sparkSession, indexPath, batchId); ()
        }
      }
      .start()
}
