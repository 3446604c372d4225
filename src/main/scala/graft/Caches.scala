package graft

import org.apache.spark.sql.SparkSession

/** Query-completion cache release — the ONE lifecycle hook for queries
  * that persist intermediates.
  *
  * Several queries stage a projection that feeds multiple consumers
  * (q25/q27/q39/q42/q46/q57 persist a sketch or gram relation; q43/q44
  * back their converged result with `localCheckpoint` blocks). A
  * lazily-returned DataFrame cannot unpersist its own scaffolding — the
  * blocks must outlive construction because the caller evaluates the plan
  * later. The contract is therefore consumer-side: materialize the
  * result, then call [[release]]. `Verify` and `Bench` do this after
  * every query; long-lived sessions must do the same or cached blocks
  * accumulate across queries.
  *
  * `catalog.clearCache` alone is NOT sufficient: `localCheckpoint` blocks
  * are plain persisted RDDs invisible to the DataFrame cache registry
  * (see [[CheckpointBlocks]]), so this hook sweeps
  * `getPersistentRDDs` as well.
  *
  * After release, results backed by checkpoint blocks (q43/q44/q52) must
  * not be re-evaluated — their lineage is truncated by design, so the
  * blocks ARE the data. Release means "done consuming", not "pause".
  */
object Caches {
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
