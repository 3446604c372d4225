package graft

import org.scalatest.funsuite.AnyFunSuite

/** The two sharp edges of the [[Caches.release]] contract, pinned:
  *
  *   - release means "done consuming", not "pause": a checkpoint-backed
  *     result (q43's clustering labels) has truncated lineage, so the
  *     blocks ARE the data — re-evaluating it after release is a defined
  *     runtime failure ("Checkpoint block … not found"), never a silent
  *     recompute of possibly-different results.
  *   - release is safe to call while a streaming micro-batch is in
  *     flight: the batch sinks pin their localCheckpoint block ids
  *     ([[CheckpointBlocks.pin]]), the sweep skips pinned ids, and
  *     [[CheckpointBlocks.free]] (the batch's own completion hook)
  *     unpins and releases them. Without the pin, a completed batch
  *     query's release would destroy the stream's only copy of its
  *     batch — data loss, not a cache miss.
  */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("re-evaluating a checkpoint-backed result after release throws, not recomputes") {
    // force the distributed propagation path (the sf0.001 graph otherwise
    // takes the driver union-find fast path, whose result has ordinary
    // lineage and no checkpoint backing). The RAW build, not the q43
    // entry: the entry serves the staged label table (file-backed, no
    // checkpoint blocks to observe)
    spark.conf.set("graft.dedup.localEdgeThreshold", "0")
    val df =
      try graft.queries.Dedup
        .clusterLabelsWithRounds(spark, "/root/testdata/sf0.001")._1
      finally spark.conf.unset("graft.dedup.localEdgeThreshold")
    assert(df.count() > 0) // materialize while the blocks are live
    Caches.release(spark)
    // lineage is truncated by design: the blocks were the data, so the
    // contract violation surfaces as a checkpoint-block failure. Release
    // unpersists with blocking=false, so the executors may still serve
    // the blocks for a moment — poll until the async removal lands (a
    // successful recount means the blocks were still readable, not that
    // the contract holds)
    val e = {
      var caught: Option[Exception] = None
      var attempts = 0
      while (caught.isEmpty && attempts < 100) {
        try { df.count(); attempts += 1; Thread.sleep(100) }
        catch { case ex: Exception => caught = Some(ex) }
      }
      caught.getOrElse(fail(
        "re-evaluation kept succeeding 10s after release — blocks never removed"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
        m.contains("Checkpoint block") || m.contains("checkpoint")),
      s"expected a checkpoint-block failure, got: $e")
  }

  test("pinned checkpoint blocks survive release; free unpins and sweeps them") {
    import spark.implicits._
    val stable = (1L to 100L).toDF("id").repartition(4).localCheckpoint()
    val ids = CheckpointBlocks.ids(stable)
    assert(ids.nonEmpty)
    CheckpointBlocks.pin(ids)
    try {
      Caches.release(spark) // the sweep another completed query triggers
      assert(ids.subsetOf(spark.sparkContext.getPersistentRDDs.keySet),
        "pinned blocks must survive a concurrent release")
      assert(stable.count() === 100L, "the in-flight consumer still reads them")
    } finally CheckpointBlocks.free(spark, ids)
    assert(CheckpointBlocks.pinned.intersect(ids).isEmpty, "free must unpin")
    assert(ids.intersect(spark.sparkContext.getPersistentRDDs.keySet).isEmpty,
      "free must unpersist")
    // once unpinned, a later release would sweep anything like them again
    Caches.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
