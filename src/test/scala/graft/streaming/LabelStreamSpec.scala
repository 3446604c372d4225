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
    // and the epoch it wrote is EMPTY — nothing new arrived (a row-free
    // partitioned write leaves no data files at all, the stronger
    // physical check)
    val epFiles = {
      val st = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$root/stream/batch_id=0"))
      try st.toArray.toSeq.map(_.toString).count(_.endsWith(".parquet"))
      finally st.close()
    }
    assert(epFiles == 0,
      s"the redelivery's epoch must hold no rows, found $epFiles files")
    spark.catalog.clearCache()
  }

  test("a batch's band probe reads only its own (b, g) partitions of the staged band index") {
    import spark.implicits._
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val tA = vocab.take(64).mkString(" ")
    val tC = vocab.slice(100, 164).mkString(" ")
    val baseDocs = Seq(0L -> tA, 2L -> tC).toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 2L -> 2L).toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-prune").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    LabelStream.processLabelBatch(spark,
      Seq(10L -> tA).toDF("doc_id", "text"), 0L, root)
    // one (b, g) group actually present: doc 0's band 0
    val g0 = spark.read.parquet(s"$root/bands")
      .filter(col("doc_id") === 0L && col("b") === 0)
      .select("g").as[Int].head()
    val pruned = LabelStream.prunedBands(spark, root, 99L, Seq((0, g0)))
    pruned.collect()
    // the probe's dedup makes the plan adaptive: AQE wraps subtrees in
    // leaf-like stage nodes TreeNode.collect does not descend into —
    // recurse explicitly (the LexStreamSpec pin's technique)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
      case q: QueryStageExec => collectScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(collectScans)
    }
    val scan = collectScans(pruned.queryExecution.executedPlan).head
    val readFiles = scan.metrics("numFiles").value
    def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val st = java.nio.file.Files.walk(p)
      try st.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
      finally st.close()
    }
    val all = parquetFiles(java.nio.file.Paths.get(s"$root/bands"))
    val matching = all.count(_.toString.contains(s"/b=0/g=$g0/"))
    assert(matching > 0 && matching < all.size,
      s"fixture degenerate: $matching/${all.size}")
    assert(readFiles == matching,
      s"band probe read $readFiles files; only the $matching under " +
        s"b=0/g=$g0 (of ${all.size}) are allowed — the o(corpus) pin")
    spark.catalog.clearCache()
  }

  test("a batch's label-STATE probes read only their own d=/c= partitions of base + epochs") {
    import spark.implicits._
    // five base docs spread over five d= partitions and three c=
    // partitions, plus one committed epoch — the doc-keyed probe
    // (priorByDoc: the dup check and every lww fold) must read only
    // the probed ids' d= files, and the cluster-keyed probe
    // (priorByCluster: the moved-candidate resolve) only the probed
    // cluster ids' c= files, across BOTH the base and the epoch scans
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val tA = vocab.take(64).mkString(" ")
    val tC = vocab.slice(100, 164).mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA, 2L -> tC, 4L -> tC,
      5L -> "zebra quark lantern oboe marsh violet kestrel dune")
      .toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L, 5L -> 5L)
      .toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-stateprune").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    LabelStream.processLabelBatch(spark,
      Seq(10L -> tA).toDF("doc_id", "text"), 0L, root)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def collectScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => collectScans(a.executedPlan)
      case q: QueryStageExec => collectScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(collectScans)
    }
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      collectScans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    def labelFiles(sub: String => Boolean): Seq[String] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try st.toArray.toSeq.map(_.toString)
        .filter(p => p.endsWith(".parquet") && !p.contains("/bands/"))
        .filter(sub)
      finally st.close()
    }
    val all = labelFiles(_ => true)
    // doc probe: id 2 lives in d = 2 mod 8 = 2; the epoch's arrival
    // (id 10) shares that partition (10 mod 8 = 2) — the pruned read
    // must touch exactly the d=2 files of base AND stream, nothing else
    val docProbe = LabelStream.priorByDoc(spark, root, 99L,
      Seq(2L).toDF("doc_id"))
    assert(docProbe.select("doc_id").as[Long].collect().toSet == Set(2L))
    val dMatch = labelFiles(_.contains("/d=2/"))
    assert(dMatch.nonEmpty && dMatch.size < all.size,
      s"fixture degenerate: ${dMatch.size}/${all.size}")
    assert(filesRead(docProbe) == dMatch.size,
      s"doc probe read ${filesRead(docProbe)} files; only the " +
        s"${dMatch.size} under d=2 (of ${all.size}) are allowed — the " +
        "o(corpus) label-state pin")
    // cluster probe: cluster 0 lives in c = 0 — base rows (0,1) and the
    // epoch's arrival row (10 → cluster 0) match; c=2 / c=5 files must
    // not be read
    val cluProbe = LabelStream.priorByCluster(spark, root, 99L,
      Seq(0L).toDF("cluster_id"))
    assert(cluProbe.select("doc_id").as[Long].collect().toSet
      == Set(0L, 1L, 10L))
    val cMatch = labelFiles(_.contains("/c=0/"))
    assert(cMatch.nonEmpty && cMatch.size < all.size,
      s"fixture degenerate: ${cMatch.size}/${all.size}")
    assert(filesRead(cluProbe) == cMatch.size,
      s"cluster probe read ${filesRead(cluProbe)} files; only the " +
        s"${cMatch.size} under c=0 (of ${all.size}) are allowed — the " +
        "o(corpus) label-state pin")
    // an EMPTY probe id set reads nothing and returns a defined empty
    // (the key filter degenerates to false, not an empty-IN plan error)
    val emptyProbe = LabelStream.priorByDoc(spark, root, 99L,
      Seq.empty[Long].toDF("doc_id"))
    assert(emptyProbe.collect().isEmpty,
      "an empty probe must be a defined empty, not an error")
    spark.catalog.clearCache()
  }

  test("consolidate: invisible to the serve, epochs retire, the stream continues, crash windows recover") {
    import spark.implicits._
    // the bridge fixture again: base {0,1}+{2,4}+5, batch 0 a twin,
    // batch 1 the bridge — then consolidation folds it all into a
    // fresh base and the stream keeps going against the compacted index
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val base64 = vocab.take(64)
    val tA = base64.mkString(" ")
    val tB = (base64.dropRight(4) ++ vocab.slice(100, 104)).mkString(" ")
    val tBr = (base64.dropRight(4) ++ vocab.slice(100, 102) ++
      base64.takeRight(4).drop(2)).mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA, 2L -> tB, 4L -> tB,
      5L -> "zebra quark lantern oboe marsh violet kestrel dune")
      .toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L, 5L -> 5L)
      .toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-consolidate").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    LabelStream.processLabelBatch(spark,
      Seq(10L -> tA).toDF("doc_id", "text"), 0L, root)
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 1L, root)
    val before = labels(LabelStream.servableLabels(spark, root))
    LabelStream.consolidate(spark, root)
    assert(labels(LabelStream.servableLabels(spark, root)) == before,
      "consolidation must be invisible to the served labels")
    // the stream epochs are gone; the band epochs compacted to ONE
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(BatchProtocol.epochIds(spark, s"$root/stream").isEmpty,
      "stream epochs must retire into the fresh base")
    assert(BatchProtocol.epochIds(spark, s"$root/bands") == Seq(-3L),
      "band epochs must compact to the consolidated id -(upTo+2)")
    // a checkpoint-replayed pre-consolidation batch stays a no-op (the
    // marker watermark), and a NEW arrival still pairs against the
    // consolidated bands: a twin of B lands in the merged cluster 0
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 1L, root)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$root/stream/batch_id=1")),
      "a replayed pre-watermark batch must not rewrite its epoch")
    LabelStream.processLabelBatch(spark,
      Seq(12L -> tB).toDF("doc_id", "text"), 2L, root)
    val after = labels(LabelStream.servableLabels(spark, root))
    assert(after == before + (12L -> 0L),
      s"post-consolidation arrival must pair against the compacted index: $after")
    // crash window: the swap dies between its two renames — the
    // recovery preamble renames the complete original back in
    require(f.rename(new org.apache.hadoop.fs.Path(s"$root/base"),
      new org.apache.hadoop.fs.Path(s"$root/_base_old")))
    assert(labels(LabelStream.servableLabels(spark, root)) == after,
      "the serve must recover a half-landed base swap")
    // and a second consolidation over the new epoch converges
    LabelStream.consolidate(spark, root)
    assert(labels(LabelStream.servableLabels(spark, root)) == after,
      "re-consolidation drifted the serve")
    assert(BatchProtocol.epochIds(spark, s"$root/bands") == Seq(-4L),
      "the second consolidation must supersede the first's epoch")
    spark.catalog.clearCache()
  }

  test("the pruned probe's frequency caps are exact at the boundary: 50 prior copies veto the pair, 49 admit it") {
    import spark.implicits._
    // the cap argument behind the pruned band read, pinned at its
    // boundary: a bucket with at least one delta row lives entirely
    // inside the probed (b, g) partitions, so its occupancy count is
    // the TRUE union count — an under-count through the pruning (say,
    // a missed prior file) would admit a pair the cap must drop. At
    // MaxBandDocs = 50: 49 prior copies + the arrival = 50 ≤ cap →
    // the twin merges; 50 prior copies + the arrival = 51 > cap →
    // every bucket of the identical-sketch family is capped and the
    // twin stays a singleton (the q191 crossing, streamed).
    val tA = (1 to 64).map(i => f"word$i%03d").mkString(" ")
    for ((nCopies, expectJoin) <- Seq((49, true), (50, false))) {
      val baseDocs = (0 until nCopies).map(i => (i.toLong, tA))
        .toDF("doc_id", "text")
      val baseLabels = (0 until nCopies).map(i => (i.toLong, 0L))
        .toDF("doc_id", "cluster_id")
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-labelstream-cap$nCopies").toString
      LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
      LabelStream.processLabelBatch(spark,
        Seq(1000L -> tA).toDF("doc_id", "text"), 0L, root)
      val got = labels(LabelStream.servableLabels(spark, root))(1000L)
      assert(got == (if (expectJoin) 0L else 1000L),
        s"$nCopies prior copies: arrival labeled $got — the pruned cap " +
          s"count must read exactly ${nCopies + 1}")
    }
    spark.catalog.clearCache()
  }

  test("runLabelMaintenance: the streaming entry maintains the root end to end, consolidating on cadence") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val base64 = vocab.take(64)
    val tA = base64.mkString(" ")
    val tB = (base64.dropRight(4) ++ vocab.slice(100, 104)).mkString(" ")
    val tBr = (base64.dropRight(4) ++ vocab.slice(100, 102) ++
      base64.takeRight(4).drop(2)).mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA, 2L -> tB, 4L -> tB)
      .toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L)
      .toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-run").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = LabelStream.runLabelMaintenance(
      mem.toDF().toDF("doc_id", "text"), root,
      java.nio.file.Files.createTempDirectory("graft-labelrun-ck").toString,
      consolidateEvery = 2)
    try {
      mem.addData((10L, tA)); q.processAllAvailable()     // batch 0: twin
      mem.addData((11L, tBr)); q.processAllAvailable()    // batch 1: bridge
      // consolidation fired after batch 1: epochs folded into the base
      assert(BatchProtocol.epochIds(spark, s"$root/stream").isEmpty,
        "consolidateEvery must fold the epochs on cadence")
      mem.addData((12L, tB)); q.processAllAvailable()     // batch 2: post-fold
      assert(BatchProtocol.epochIds(spark, s"$root/stream") == Seq(2L),
        "the post-consolidation batch appends as a fresh epoch")
      val got = labels(LabelStream.servableLabels(spark, root))
      assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 4L -> 0L,
        10L -> 0L, 11L -> 0L, 12L -> 0L),
        s"the maintained root must serve the full merged closure: $got")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("purgeRoot: physical erasure re-clusters the reduced state; the ledger outlives the purge") {
    import spark.implicits._
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val base64 = vocab.take(64)
    val tA = base64.mkString(" ")
    val tB = (base64.dropRight(4) ++ vocab.slice(100, 104)).mkString(" ")
    val tBr = (base64.dropRight(4) ++ vocab.slice(100, 102) ++
      base64.takeRight(4).drop(2)).mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA, 2L -> tB, 4L -> tB)
      .toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L)
      .toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-purge").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 0L, root)
    assert(labels(LabelStream.servableLabels(spark, root))
      == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 4L -> 0L, 11L -> 0L))
    // the takedown: the bridge document. The mask is immediate
    // (membership-only — the merged clusters stay merged until the
    // purge, the documented impactRead stance)...
    Tombstones.delete(spark, root, Seq(11L), "req-1", "doc_id")
    val masked = labels(LabelStream.servableLabels(spark, root))
    assert(!masked.contains(11L), "a tombstoned id must mask immediately")
    assert(masked == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 4L -> 0L),
      s"pre-purge the mask is membership-only: $masked")
    // ...and the purge is the erasure event: the chain through the
    // deleted bridge SPLITS (a fresh re-cluster of a corpus that never
    // held it), and no file under the root carries the id anymore
    LabelStream.purgeRoot(spark, root)
    val purged = labels(LabelStream.servableLabels(spark, root))
    assert(purged == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L),
      s"purge must re-cluster the reduced state: $purged")
    for (sub <- Seq("base", "bands")) {
      val ids = spark.read.parquet(s"$root/$sub")
        .select("doc_id").as[Long].collect().toSet
      assert(!ids.contains(11L), s"$sub still holds the purged id")
      assert(ids.nonEmpty, s"$sub must keep the surviving rows")
    }
    assert(BatchProtocol.epochIds(spark, s"$root/stream").isEmpty,
      "purge must retire the stream epochs into the reduced base")
    // idempotent re-run
    LabelStream.purgeRoot(spark, root)
    assert(labels(LabelStream.servableLabels(spark, root)) == purged,
      "purge re-run drifted")
    // the ledger survives: the id REDELIVERED after its takedown stays
    // masked (takedown outranks late arrival)
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 1L, root)
    assert(!labels(LabelStream.servableLabels(spark, root)).contains(11L),
      "a post-purge redelivery of a taken-down id must stay masked")
    spark.catalog.clearCache()
  }

  test("rootCard reads the label root's layout, epoch split, and takedown posture") {
    import spark.implicits._
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val base64 = vocab.take(64)
    val tA = base64.mkString(" ")
    val tB = (base64.dropRight(4) ++ vocab.slice(100, 104)).mkString(" ")
    val tBr = (base64.dropRight(4) ++ vocab.slice(100, 102) ++
      base64.takeRight(4).drop(2)).mkString(" ")
    val baseDocs = Seq(0L -> tA, 1L -> tA, 2L -> tB, 4L -> tB)
      .toDF("doc_id", "text")
    val baseLabels = Seq(0L -> 0L, 1L -> 0L, 2L -> 2L, 4L -> 2L)
      .toDF("doc_id", "cluster_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-labelstream-card").toString
    LabelStream.initRoot(spark, root, baseDocs, baseLabels, 8)
    def card() = LabelStream.rootCard(spark, root).collect().head
    val c0 = card()
    assert(c0.getAs[Long]("width") == 8L &&
      c0.getAs[Long]("d_buckets") == 8L &&
      c0.getAs[Long]("c_buckets") == 8L &&
      c0.getAs[Long]("base_rows") == 4L &&
      c0.getAs[Long]("n_stream_epochs") == 0L &&
      c0.getAs[Long]("n_band_epochs") == 0L &&
      !c0.getAs[Boolean]("bands_consolidated"), c0.toString)
    // the bridge batch: 1 arrival sketch row + 2 moved overrides
    LabelStream.processLabelBatch(spark,
      Seq(11L -> tBr).toDF("doc_id", "text"), 0L, root)
    val c1 = card()
    assert(c1.getAs[Long]("n_stream_epochs") == 1L &&
      c1.getAs[Long]("epoch_sketch_rows") == 1L &&
      c1.getAs[Long]("epoch_override_rows") == 2L &&
      c1.getAs[Long]("n_band_epochs") == 1L, c1.toString)
    Tombstones.delete(spark, root, Seq(11L), "req-1", "doc_id")
    assert(card().getAs[Long]("n_tomb_ids") == 1L)
    // consolidation folds everything into the base; bands compact
    LabelStream.consolidate(spark, root)
    val c2 = card()
    assert(c2.getAs[Long]("n_stream_epochs") == 0L &&
      c2.getAs[Long]("base_rows") == 5L &&
      c2.getAs[Boolean]("bands_consolidated"), c2.toString)
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
