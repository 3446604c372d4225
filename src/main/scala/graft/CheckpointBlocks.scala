package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Release handle for `localCheckpoint` blocks — the ONE implementation
  * used by the iterative clustering loop ([[graft.queries.Dedup]]) and
  * the streaming batch sinks ([[graft.streaming.DocStream]] /
  * [[graft.streaming.EmbedStream]]).
  *
  * `Dataset.localCheckpoint` persists an internal RDD but exposes no
  * unpersist handle. Diffing the session-global `getPersistentRDDs`
  * registry around the call is RACY: any concurrently-running query that
  * persists (a second stream's batch, another clustering loop) lands in
  * the diff and gets its live checkpoint blocks freed mid-job — for
  * localCheckpoint blocks that is data loss, not a cache miss (lineage
  * is truncated; the blocks are the only copy). Instead, read the exact
  * RDD the checkpointed Dataset wraps (its analyzed plan is a
  * `LogicalRDD` holding it) and free precisely those ids.
  *
  * The same data-loss hazard exists in the other direction:
  * [[Caches.release]] sweeps the whole registry on query completion, and
  * an in-flight streaming micro-batch's checkpoint blocks must survive
  * that sweep. [[pin]] marks ids as live-consumer-owned; `release` skips
  * them, and [[free]] unpins when the consumer is done.
  */
private[graft] object CheckpointBlocks {

  /** Ids whose blocks an in-flight consumer (a streaming micro-batch)
    * still needs — excluded from [[Caches.release]]'s sweep.
    */
  private val pinnedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Serializes checkpoint-registration+pin against [[Caches.release]]'s
    * sweep. Without it two races lose data: (a) a release landing
    * between `localCheckpoint()` (which registers the RDD as persistent
    * immediately) and `pin()` sweeps the just-registered blocks; (b) a
    * release that snapshotted the pin set before a concurrent pin lands
    * sweeps ids pinned mid-sweep. Both sides hold this lock, so a pin is
    * either fully visible to a sweep or happens strictly after it.
    */
  private[graft] val sweepLock = new Object

  /** The checkpoint-backing RDD ids of a localCheckpoint'd DataFrame
    * (empty for plans that are not LogicalRDD-backed).
    */
  def ids(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.toSet

  /** `localCheckpoint` + pin as ONE atomic step w.r.t.
    * [[Caches.release]]: the returned DataFrame's checkpoint blocks are
    * shielded from the sweep from the instant the RDD is registered —
    * there is no window in which a concurrent release can destroy the
    * only copy. Caller MUST [[free]] the returned ids in a `finally`
    * that starts immediately after this call (anything the caller does
    * first runs outside that protection and would leak the pins on
    * failure).
    */
  def pinnedCheckpoint(df: DataFrame): (DataFrame, Set[Int]) =
    sweepLock.synchronized {
      // LAZY checkpoint: registers the RDD as persistent and truncates
      // lineage without running a job, so the lock window is
      // microseconds — materialization happens at the caller's first
      // action, already under pin protection. An eager checkpoint here
      // would hold concurrent releases hostage for the whole
      // materialization.
      val stable = df.localCheckpoint(eager = false)
      val stableIds = ids(stable)
      stableIds.foreach(pinnedIds.add(_))
      (stable, stableIds)
    }

  /** Shield these ids from [[Caches.release]] until [[free]]d: losing a
    * lineage-truncated block mid-batch is data loss, not a cache miss.
    * Prefer [[pinnedCheckpoint]], which closes the register-to-pin race.
    */
  def pin(rddIds: Set[Int]): Unit =
    sweepLock.synchronized { rddIds.foreach(pinnedIds.add(_)) }

  /** Currently pinned ids ([[Caches.release]] reads this under
    * [[sweepLock]]).
    */
  def pinned: Set[Int] = {
    import scala.jdk.CollectionConverters._
    pinnedIds.iterator().asScala.toSet
  }

  /** Unpin and unpersist exactly these RDD ids (non-blocking; absent ids
    * no-op).
    */
  def free(spark: SparkSession, rddIds: Set[Int]): Unit =
    rddIds.foreach { id =>
      pinnedIds.remove(id)
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false))
    }
}
