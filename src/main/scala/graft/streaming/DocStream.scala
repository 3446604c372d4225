package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
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
}
