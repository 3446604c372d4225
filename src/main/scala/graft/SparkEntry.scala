package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain modules under graft.queries; every
  * entry has a DuckDB oracle in `oracleSql` unless marked rows-only.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + exact-decimal revenue rollup (TPC-H Q5
    * shape) — the engine's relational core in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.TextAnalysis.queries ++
    graft.queries.Events.queries ++
    graft.queries.Similarity.queries ++
    graft.queries.Dedup.queries ++
    graft.queries.Curation.queries ++
    graft.queries.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracleSql ++
    graft.queries.TextAnalysis.oracleSql ++
    graft.queries.Events.oracleSql ++
    graft.queries.Similarity.oracleSql ++
    graft.queries.Dedup.oracleSql ++
    graft.queries.Curation.oracleSql ++
    graft.queries.Multimodal.oracleSql
}
