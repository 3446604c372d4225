package graft

import org.apache.spark.sql.SparkSession

/** Query-completion cache release — the ONE lifecycle hook for queries
  * that persist intermediates.
  *
  * Several queries stage a projection that feeds multiple consumers
  * (see CacheHygieneSpec's `persisting` list for the authoritative
  * roster — sketch/gram/scored persists plus the clustering loop's
  * `localCheckpoint`-backed results). A lazily-returned DataFrame cannot
  * unpersist its own scaffolding — the blocks must outlive construction
  * because the caller evaluates the plan later. The contract is
  * therefore consumer-side: materialize the result, then call
  * [[release]]. `Verify` and `Bench` do this after every query;
  * long-lived sessions must do the same or cached blocks accumulate
  * across queries.
  *
  * `catalog.clearCache` alone is NOT sufficient: `localCheckpoint` blocks
  * are plain persisted RDDs invisible to the DataFrame cache registry
  * (see [[CheckpointBlocks]]), so this hook sweeps
  * `getPersistentRDDs` as well — EXCEPT ids an in-flight consumer has
  * pinned ([[CheckpointBlocks.pin]]): the streaming micro-batch sinks pin
  * their batch's checkpoint blocks for the duration of the batch, so a
  * concurrent `release` from a completed batch query cannot destroy a
  * stream's only copy of its data. (A stream's plain `persist`ed
  * staging, like its band relation, is NOT shielded — losing it is a
  * recompute from the pinned checkpoint, a cache miss, not data loss.)
  *
  * After release, results backed by checkpoint blocks (q43/q44/q52) must
  * not be re-evaluated — their lineage is truncated by design, so the
  * blocks ARE the data (re-evaluation throws "Checkpoint block … not
  * found"; pinned by CachesSpec). Release means "done consuming", not
  * "pause".
  */
object Caches {
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    // under sweepLock: a concurrent pinnedCheckpoint either completes
    // before the snapshot (and is skipped) or blocks until the sweep is
    // done (and its blocks are registered after) — no in-between
    CheckpointBlocks.sweepLock.synchronized {
      val pinned = CheckpointBlocks.pinned
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => pinned.contains(r.id))
        .foreach(_.unpersist(blocking = false))
    }
  }
}
