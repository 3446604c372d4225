package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The staged BAND-RELATION index shared by the label artifact's two
  * growth paths — ONE layout and ONE pruned-probe implementation so the
  * streaming dual ([[LabelStream]]'s `bands/` epochs) and the batch
  * append ([[graft.queries.Dedup]]'s q184 staging) cannot drift on what
  * "probe only the delta's band keys" means.
  *
  * Layout: `(doc_id, lo, hi, bk)` rows under `b=B/g=G/` directories,
  * `g = bk mod` [[DocStream.BkBuckets]] — `b` alone has too few values
  * to prune anything (a delta touches every band), so the band KEY
  * buckets into `g` and a probe's read is filtered to the `(b, g)`
  * groups the delta's own bands occupy: partition pruning by FILE, with
  * the pushed key set bounded by `bands × BkBuckets` at any delta size
  * (the [[DocStream]] near-dedup index discipline; LabelStreamSpec and
  * DedupSpec pin the numFiles metric). One shuffle keyed on the layout
  * columns at write time → one file per present group, the scan-task
  * bound the probe wants.
  */
private[graft] object LabelBandIndex {

  /** Band rows with the layout's `g` column, from a (doc_id, lo, hi)
    * sketch relation at an explicit width (null sketches band nowhere).
    */
  def bands(sketches: DataFrame, w: Int): DataFrame =
    graft.queries.Similarity.bandsFromSketches(
        sketches.filter(col("lo").isNotNull).select("doc_id", "lo", "hi"), w)
      .withColumn("g", pmod(col("bk"), lit(DocStream.BkBuckets)).cast("int"))

  /** Stage one `(b, g)`-partitioned band directory (an epoch of the
    * stream index, or the batch staging's whole artifact).
    */
  def write(spark: SparkSession, path: String, sketches: DataFrame,
      w: Int): Unit =
    bands(sketches, w)
      .repartition(col("b"), col("g"))
      .write.partitionBy("b", "g").mode("overwrite").parquet(path)

  /** The `(b, g)` groups a delta's band relation occupies — the probe's
    * driver-side prune-key set, bounded by bands × BkBuckets.
    */
  def groupsOf(deltaBands: DataFrame): Seq[(Int, Int)] =
    deltaBands
      .filter(col("bk").isNotNull) // a null-sketch band row has null
                                   // keys: joins nothing, prunes nothing
                                   // (and getInt on null is an NPE —
                                   // the DocStream lesson)
      .select(col("b"),
        pmod(col("bk"), lit(DocStream.BkBuckets)).cast("int").as("g"))
      .distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq

  /** The partition-pruning key filter over a band read — `b` and `g`
    * are partition columns, so this prunes by file.
    */
  def groupFilter(groups: Seq[(Int, Int)]): org.apache.spark.sql.Column = {
    val keys = groups.map { case (b, g) => b * DocStream.BkBuckets + g }
    (col("b") * lit(DocStream.BkBuckets) + col("g")).isin(keys: _*)
  }

  /** Probe ONE staged band directory (the batch artifact), pruned to
    * the delta's groups. The stream side composes [[groupFilter]] with
    * its epoch mask instead ([[LabelStream.prunedBands]]).
    */
  def prunedRead(spark: SparkSession, path: String,
      groups: Seq[(Int, Int)]): DataFrame =
    if (groups.isEmpty)
      empty(spark)
    else
      spark.read.parquet(path)
        .filter(groupFilter(groups))
        .select("doc_id", "lo", "hi", "b", "bk")

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, lo BIGINT, hi BIGINT, b INT, bk BIGINT"))
}
