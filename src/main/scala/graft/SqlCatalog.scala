package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Named SQL surfaces over the engine's staged and derived relations —
  * the composition layer for users who live in `spark.sql` rather than
  * the Scala API: [[GraftExtensions]] already registers the native
  * FUNCTIONS (`vec_dot`, `simhash32`, …); this registers the RELATIONS
  * they compose with, so the serving/audit reads need no Scala at all.
  *
  * `register(spark, dir)` publishes, for one testdata-shaped corpus
  * directory:
  *
  *   - `graft_ivfpq_index` — the staged IVF-PQ code table
  *     (vec_id, cell, code0..code7), the SAME cell-bucketed catalog
  *     table the q91/q122 serve paths scan (a view over it, so a
  *     `WHERE cell IN (…)` probe still bucket-prunes);
  *   - `graft_centroids` — the bounded k-means quantizer table
  *     (cell, cvec, cnrm): broadcast-sized, the dimension side of any
  *     SQL probe plan;
  *   - `graft_band_index` — the corpus's un-capped simhash band rows
  *     (doc_id, simhash, b, bk, band_width) at the corpus-adaptive
  *     width ([[graft.queries.Similarity.bandRelation]] — q116's exact
  *     input), for near-dup candidate joins and occupancy audits;
  *   - `graft_pack_manifest` — q119's loader artifact (chunk rows with
  *     offsets) as a queryable relation;
  *   - `graft_lex_postings` / `graft_lex_doclen` / `graft_lex_df` — the
  *     staged lexical inverted index (q148's serve substrate): postings
  *     hash-bucketed by TERM (a `WHERE term IN (…)` fetch bucket-prunes
  *     through the view), per-doc lengths, per-term document
  *     frequencies.
  *
  * The documented example (SqlCatalogSpec runs both verbatim):
  *
  * {{{
  *   -- band-occupancy health (q116's aggregate) in pure SQL
  *   SELECT b, COUNT(*) AS n_buckets, MAX(cnt) AS max_bucket
  *   FROM (SELECT b, bk, COUNT(*) AS cnt FROM graft_band_index
  *         WHERE bk IS NOT NULL GROUP BY b, bk)
  *   GROUP BY b ORDER BY b
  *
  *   -- a query vector's IVF probe, end to end: nearest centroid by
  *   -- native vec_dot, then the bucket-pruned cell scan
  *   SELECT i.* FROM graft_ivfpq_index i WHERE i.cell =
  *     (SELECT c.cell FROM graft_centroids c CROSS JOIN q
  *      ORDER BY vec_dot(c.cvec, CAST(q.qv AS ARRAY<DOUBLE>)) / c.cnrm
  *        DESC, c.cell LIMIT 1)
  * }}}
  *
  * Views are TEMPORARY (session-scoped): the index is a real staged
  * table built once per (session, dir); the band/manifest views are
  * plan-backed and recompute on read (their internal persists follow
  * the [[Caches]] consumer-release contract — after a release, a
  * re-read is a cache miss, never an error).
  */
object SqlCatalog {

  val ViewNames: Seq[String] = Seq("graft_ivfpq_index", "graft_centroids",
    "graft_band_index", "graft_pack_manifest", "graft_lex_postings",
    "graft_lex_doclen", "graft_lex_df")

  /** Publish the catalog views for `dir`; returns the view names. */
  def register(spark: SparkSession, dir: String): Seq[String] = {
    val cents = queries.Similarity.kmeansCentroids(spark, dir)
    val books = queries.Similarity.pqCodebooks(spark, dir)
    val idxT = queries.Similarity.ensureIvfPqIndex(spark, dir, cents, books)
    spark.table(idxT).createOrReplaceTempView("graft_ivfpq_index")
    val s = spark
    import s.implicits._
    cents.toSeq.map { case (k, v, n) => (k.toLong, v, n) }
      .toDF("cell", "cvec", "cnrm")
      .createOrReplaceTempView("graft_centroids")
    val (bands, w) = queries.Similarity.bandRelation(spark, dir)
    bands.withColumn("band_width", lit(w))
      .createOrReplaceTempView("graft_band_index")
    queries.Curation.queries("q119_pack_manifest")(spark, dir)
      .createOrReplaceTempView("graft_pack_manifest")
    // the staged lexical inverted index (q148's serve substrate):
    // postings bucketed by term — a `WHERE term IN (…)` candidate fetch
    // bucket-prunes through the view like the serve path's does
    val (postT, dlT, dfT, _, _) =
      queries.TextAnalysis.ensureLexIndex(spark, dir)
    spark.table(postT).createOrReplaceTempView("graft_lex_postings")
    spark.table(dlT).createOrReplaceTempView("graft_lex_doclen")
    spark.table(dfT).createOrReplaceTempView("graft_lex_df")
    ViewNames
  }
}
