package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming label dual's contract: arrivals label EXACTLY like a
  * fresh re-cluster of the grown corpus (the q173 identity stance for
  * the label artifact), merges propagate ACROSS batch boundaries and
  * into the adopted base, epochs stay arrival-collision-sized, and the
  * marker protocol makes redelivery/crash replay no-ops.
  */
class LabelStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap

  test("q192 serves the fresh union closure on the real corpus (sf0.001 and sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fresh = labels(graft.SparkEntry.queries("q150_clusters64")(
        spark, dir))
      val served = labels(graft.SparkEntry.queries("q192_label_stream")(
        spark, dir))
      graft.Caches.release(spark)
      assert(served == fresh, s"$dir: streamed labels drifted from the " +
        "fresh closure")
    }
    spark.catalog.clearCache()
  }

  test("a late arrival bridges two base clusters through a prior arrival's epoch; epochs stay collision-sized") {
    import spark.implicits._
    // the q184 bridge triple (deterministic sketch distances — see
    // DedupSpec): TA/TB are not near-dups (d=11), the bridge is within
    // the bar of both (7/6)
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val base64 = vocab.take(64)
    val tA = base64.mkString(" ")
    val tB = (base64.dropRight(4) ++ vocab.slice(100, 104)).mkString(" ")
    val tBr = (base64.dropRight(4) ++ vocab.slice(100, 102) ++
      base64.takeRight(4).drop(2)).mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA, 2L -> tB, 4L -> tB,
      5L -> "zebra quark lantern oboe marsh violet kestrel dune")
      .toDF("doc_id", "text")
    // the base's honest pre-stream labels: {0,1} and {2,4} + singleton
    val baseLabels = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L, 5L -> 5L)
      .toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    // batch 0: a twin of A — joins {0,1} without touching B
    LabelStream.processLabelBatch(spark,
      Seq(10L -> tA).toDF("doc_id", "text"), 0L, root)
    val after0 = labels(LabelStream.servableLabels(spark, root))
    assert(after0 == Map(0L -> 0L, 1L -> 0L, 10L -> 0L,
      2L -> 2L, 4L -> 2L, 5L -> 5L),
      s"batch 0 must join the twin and nothing else: $after0")
    // batch 1: the bridge — merges {0,1,10} and {2,4} to min-id 0,
    // relabeling base docs AND reading batch 0's sketch from its epoch
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 1L, root)
    val after1 = labels(LabelStream.servableLabels(spark, root))
    assert(after1 == Map(0L -> 0L, 1L -> 0L, 10L -> 0L, 11L -> 0L,
      2L -> 0L, 4L -> 0L, 5L -> 5L),
      s"the bridge must merge both clusters to the union min: $after1")
    // epoch 1 carries the arrival + ONLY the two moved labels — the
    // collision-sized-epoch contract, physically
    val ep1 = spark.read.parquet(s"$root/stream/batch_id=1")
    assert(ep1.count() == 3L,
      s"epoch must hold 1 sketch row + 2 overrides: ${ep1.count()}")
    assert(ep1.filter(col("lo").isNull).select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(2L, 4L),
      "override rows must be exactly the moved base docs")
    // redelivery of a committed batch is a no-op
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 1L, root)
    assert(labels(LabelStream.servableLabels(spark, root)) == after1,
      "committed redelivery must not change the served labels")
    // crash between epoch write and marker: replay recomputes the same
    // epoch and commits — served labels identical
    val f = new org.apache.hadoop.fs.Path(s"$root/stream/_commits/1")
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(s"$root/stream/_commits/1"), false)
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 1L, root)
    assert(labels(LabelStream.servableLabels(spark, root)) == after1,
      "crash-before-marker replay must converge to the same labels")
    spark.catalog.clearCache()
  }

  test("a document redelivered in a LATER batch is a no-op (append-only per id)") {
    import spark.implicits._
    // an at-least-once source can replay a doc under a NEW batch id —
    // the committed-batch guard cannot catch that, so the fold itself
    // must drop already-labeled ids or it would emit a second,
    // conflicting label row (the doc's pairs contract to its own
    // super-node, detaching it as a singleton under max_by ties)
    val tA = (1 to 64).map(i => f"word$i%03d").mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA).toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 1L -> 0L).toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-redeliver").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    LabelStream.processLabelBatch(spark,
      Seq(1L -> tA).toDF("doc_id", "text"), 0L, root)
    val got = labels(LabelStream.servableLabels(spark, root))
    assert(got == Map(0L -> 0L, 1L -> 0L),
      s"a cross-batch redelivery must not move or split labels: $got")
    // and the epoch it wrote is EMPTY — nothing new arrived
    assert(spark.read.parquet(s"$root/stream/batch_id=0").count() == 0L,
      "the redelivery's epoch must hold no rows")
    spark.catalog.clearCache()
  }

  test("a null-text arrival labels as a singleton and never bands") {
    import spark.implicits._
    val baseDocs = Seq(0L -> "alpha beta gamma delta epsilon zeta")
      .toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L).toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-null").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    LabelStream.processLabelBatch(spark,
      Seq((7L, null: String)).toDF("doc_id", "text"), 0L, root)
    val got = labels(LabelStream.servableLabels(spark, root))
    assert(got == Map(0L -> 0L, 7L -> 7L),
      s"null text must be its own singleton: $got")
    spark.catalog.clearCache()
  }
}
