package graft.functions

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", §A1.1) in their engine-portable subset —
  * ONE set of Column expressions shared verbatim by the batch operator
  * (q45, DuckDB-oracled) and the streaming dual
  * ([[graft.streaming.DocStream.qualityFiltered]]), so the two paths
  * cannot diverge. Narrow per-row array ops over the shared tokenizer,
  * zero shuffles; every ratio is integer-derived (sums/counts of ints,
  * one double divide), so the oracle hash-matches with no float-fold
  * concerns. `pass` is the rules' conjunction, null-coalesced to false so
  * the verdict column is total even for null documents.
  */
object QualityRules {

  /** Gopher's "required word" stopword list: a document must contain at
    * least 2 of these to pass.
    */
  val Stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Appends the rule columns (`n_words`, `mean_word_len`, `frac_alpha`,
    * `n_stop_distinct`, `pass`) to a DataFrame with a `text` column,
    * preserving the input columns. Layered projections (see q25): the
    * token array becomes a named column before any lambda touches it.
    */
  def annotate(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk", tokens(col("text")))
      .withColumn("n_words", size(col("tk")).cast("long"))
      .withColumn("sum_len",
        aggregate(col("tk"), lit(0L), (acc, t) => acc + length(t).cast("long")))
      .withColumn("n_alpha",
        size(filter(col("tk"), t => t.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop_distinct",
        size(array_intersect(array_distinct(col("tk")), typedLit(Stops)))
          .cast("long"))
      .withColumn("mean_word_len", when(col("n_words") > 0,
        col("sum_len").cast("double") / col("n_words").cast("double")))
      .withColumn("frac_alpha", when(col("n_words") > 0,
        col("n_alpha").cast("double") / col("n_words").cast("double")))
      .withColumn("pass", coalesce(
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("frac_alpha") > 0.8 &&
          col("n_stop_distinct") >= 2, lit(false)))
      .drop("tk", "sum_len", "n_alpha")
}
