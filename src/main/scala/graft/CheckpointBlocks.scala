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
  */
private[graft] object CheckpointBlocks {

  /** The checkpoint-backing RDD ids of a localCheckpoint'd DataFrame
    * (empty for plans that are not LogicalRDD-backed).
    */
  def ids(df: DataFrame): Set[Int] =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.toSet

  /** Unpersist exactly these RDD ids (non-blocking; absent ids no-op). */
  def free(spark: SparkSession, rddIds: Set[Int]): Unit =
    rddIds.foreach { id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(false))
    }
}
