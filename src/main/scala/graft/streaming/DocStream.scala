package graft.streaming

import graft.functions.TextFunctions._
import graft.functions.SketchFunctions.simHash32
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming duals of the training-data prep pipeline (batch:
  * q17/q18/q36 in [[graft.queries.TextAnalysis]]) over a document stream
  * `(doc_id, ingest_ts timestamp, text)`.
  *
  * Scoring and language-ID are the *same Column expressions* as the batch
  * queries — narrow, per-row, stateless, so the streaming and batch paths
  * cannot diverge. Exact dedup becomes
  * `dropDuplicatesWithinWatermark` on the content hash: the state store
  * holds one hash per distinct document inside the watermark horizon
  * (state is bounded by horizon × arrival rate, the streaming form of the
  * batch hash-groupBy; batch keeps min doc_id, streaming keeps the first
  * arrival — identical sets when ids arrive in order).
  */
object DocStream {

  /** Per-row scoring: token count, quality, language argmax — exactly the
    * q36 scoring expressions.
    */
  def scored(docs: DataFrame): DataFrame = {
    val scoredTk = docs
      .select(col("*"), tokens(col("text")).as("tk"))
      .select(col("*"),
        size(col("tk")).cast("long").as("n_tokens"),
        stopwordHits(col("tk"), stopwordsByLang.head._2).as("stops"))
    val Seq(en, es, de, fr) = langScores(col("tk")).map(_._2)
    scoredTk
      .withColumn("lang_guess",
        when(en >= greatest(es, de, fr), "en")
          .when(es >= greatest(de, fr), "es")
          .when(de >= fr, "de").otherwise("fr"))
      .withColumn("quality",
        (col("stops").cast("double") / col("n_tokens").cast("double")) * 0.4 +
          least(lit(1.0), col("n_tokens").cast("double") / 50.0) * 0.6)
      .drop("tk", "stops")
  }

  /** Streaming exact dedup on the content hash, state expiring with the
    * watermark.
    */
  def deduped(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withWatermark("ingest_ts", watermark)
      .withColumn("content_hash", sha2(col("text"), 256))
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")

  /** The full prep dual (q36 semantics on a stream): dedup → score →
    * keep English documents above the quality bar.
    */
  def prep(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    scored(deduped(docs, watermark))
      .filter(col("lang_guess") === "en" && col("quality") >= 0.5)
      .select("doc_id", "n_tokens", "quality")

  /** Streaming quality-rule filter — the q45 semantics on a stream, via
    * the SAME [[graft.functions.QualityRules]] Columns the batch operator
    * uses (stateless, narrow, per-row: nothing about the rules changes
    * under streaming execution). Keeps documents passing every rule.
    */
  def qualityFiltered(docs: DataFrame): DataFrame =
    graft.functions.QualityRules.annotate(docs)
      .filter(col("pass"))
      .drop("n_words", "mean_word_len", "frac_alpha", "n_stop_distinct", "pass")

  // ---- incremental near-dedup (the q27 semantics against history) ---------

  /** Band rows `(…, simhash, b, bk)` of the batch's 32-bit simhash sketches
    * — the q27 banding with a fixed width. The width is an INDEX-LIFETIME
    * constant (unlike batch q27's corpus-adaptive width): band keys must
    * stay comparable across every batch that ever wrote to the index.
    * Widening for a bigger target corpus is a re-banding pass over the
    * stored `(doc_id, simhash)` pairs — the sketches are in the index, so
    * re-banding never re-reads text.
    */
  private def sketchBands(docs: DataFrame, w: Int): DataFrame = {
    val nb = 32 / w
    val mask = (1L << w) - 1
    docs
      .withColumn("simhash",
        simHash32(transform(array_distinct(tokens(col("text"))), t => portableHash(t))))
      .select(col("doc_id"), col("simhash"), explode(array(
        (0 until nb).map(b => struct(lit(b).as("b"),
          shiftright(col("simhash"), w * b).bitwiseAND(lit(mask)).as("bk"))): _*)).as("x"))
      .select(col("doc_id"), col("simhash"), col("x.b").as("b"), col("x.bk").as("bk"))
  }

  /** One micro-batch of incremental near-dedup — the 100 TB shape of "dedup
    * the new crawl against everything already admitted" without ever
    * re-pairing the corpus:
    *
    *   1. sketch the batch and band-join it against the admitted index
    *      (equi-join on `(b, bk)`, hamming ≤ 8 verify) — work is
    *      proportional to true band collisions, and the index side prunes
    *      to the batch's band keys, never a corpus scan;
    *   2. within-batch near-dups resolve greedily to the smallest doc_id:
    *      a document sharing a band with a smaller-id batch document at
    *      hamming ≤ 8 is dropped. Greedy over-drops only along transitive
    *      chains (C≈B dropped because B≈A) — the same direction the batch
    *      clustering (q43) resolves them, where B bridges A and C into one
    *      component;
    *   3. survivors' band rows are the index delta.
    *
    * Returns (survivors with their sketch, index delta). The index grows
    * with the admitted corpus by design — it IS the dedup history; at
    * scale it lives partitioned by band key so step 1's join prunes files.
    */
  def nearDedupBatch(batch: DataFrame, index: DataFrame, bandWidth: Int = 8)
      : (DataFrame, DataFrame) = {
    val bands = sketchBands(batch, bandWidth)
    val crossDup = bands.alias("n").join(index.alias("i"),
        col("n.b") === col("i.b") && col("n.bk") === col("i.bk") &&
        bit_count(col("n.simhash").bitwiseXOR(col("i.simhash"))) <= 8,
        "left_semi")
      .select("doc_id").distinct()
    val survBands = bands.join(crossDup, Seq("doc_id"), "left_anti")
    val withinDup = survBands.alias("a").join(survBands.alias("b"),
        col("a.b") === col("b.b") && col("a.bk") === col("b.bk") &&
        col("a.doc_id") < col("b.doc_id") &&
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= 8)
      .select(col("b.doc_id").as("doc_id")).distinct()
    val keptBands = survBands.join(withinDup, Seq("doc_id"), "left_anti")
    val survivors = batch.join(
      keptBands.select("doc_id", "simhash").distinct(), Seq("doc_id"))
    (survivors, keptBands)
  }

  /** The `foreachBatch` body: load the index (empty before the first
    * batch), dedup the batch against it, append the survivors' bands, and
    * return the survivors for the caller's sink. Redelivery-safe the same
    * way the ETL loads are: re-processing a batch finds its own survivors
    * already in the index and admits nothing twice — EXCEPT the appended
    * band rows, which `runNearDedup` guards with the streaming
    * checkpoint's exactly-once batch ids.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, indexPath: String,
      bandWidth: Int = 8): DataFrame = {
    // a foreachBatch micro-batch is backed by an EPHEMERAL source — the
    // within-batch band self-join needs a stable base, and the two writes
    // below must not re-pull the source; one checkpoint pins both
    val stable = batch.localCheckpoint()
    val index =
      try spark.read.parquet(indexPath) // file listing pinned at read time
      catch { case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "doc_id BIGINT, simhash BIGINT, b INT, bk BIGINT"))
      }
    val (survivors, delta) = nearDedupBatch(stable, index, bandWidth)
    // materialize survivors against the PRE-append index before the delta
    // write mutates what a recompute would see
    val surv = survivors.localCheckpoint()
    delta.write.mode("append").parquet(indexPath)
    surv
  }

  /** Streaming incremental near-dedup: survivors append to
    * `<outPath>`, the sketch index accumulates at `<indexPath>`, and the
    * stream checkpoint makes batch effects exactly-once across restarts.
    */
  def runNearDedup(docs: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, bandWidth: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, indexPath, bandWidth)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
