package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q43/q44 — transitive near-dup clustering. The strongest check available:
  * exact equality of the converged labels against an independently-computed
  * union-find over the SAME q27 pair set, on the real sf0.001 corpus. That
  * pins transitivity (multi-hop merging), min-labeling, singleton handling,
  * and convergence in one assertion — if the iterative propagation stopped
  * a round early or merged along a non-edge, some label differs.
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Plain driver-side union-find (path-halving), small-N ground truth. */
  private def unionFind(n: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(i => i -> i): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // label = component MINIMUM: union-by-min above keeps roots minimal
    n.map(i => i -> find(i)).toMap
  }

  test("q43 labels equal union-find components of the q27 pair graph") {
    val pairs = graft.SparkEntry.queries("q27_simhash_pairs")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
    val docs = graft.Tables(spark, dir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val truth = unionFind(docs, pairs)
    val got = graft.SparkEntry.queries("q43_neardup_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got.size == docs.size, "q43 must label every document")
    assert(got == truth)
    // the test is only meaningful if transitive merging actually occurred:
    // some same-cluster pair must NOT be a direct q27 pair
    val direct = pairs.toSet
    val transitiveMerge = truth.groupBy(_._2).values.exists { comp =>
      val ids = comp.keys.toSeq.sorted
      ids.combinations(2).exists { case Seq(u, w) =>
        !direct((u, w)) && !direct((w, u))
      }
    }
    assert(transitiveMerge,
      "corpus has no multi-hop component — transitivity untested")
    spark.catalog.clearCache()
  }

  test("q44 survivor report is consistent with q43 and covers the corpus") {
    val labels = graft.SparkEntry.queries("q43_neardup_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    val surv = graft.SparkEntry.queries("q44_dedup_survivors")(spark, dir)
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("cluster_size")).toMap
    val bySize = labels.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(surv == bySize)
    // every kept doc is its own cluster's minimum (it labels itself)
    assert(surv.keys.forall(k => labels.toMap.get(k).contains(k)))
    // sizes sum back to the corpus — nothing dropped, nothing duplicated
    assert(surv.values.sum == labels.length)
    spark.catalog.clearCache()
  }

  test("q43/q44 on an all-unique corpus: every doc is its own singleton") {
    // zero near-dup pairs is the COMMON real-corpus case — the loop must
    // short-circuit (an empty touched set has a null label mass; r4 found
    // this as a latent NPE the degenerate fixture masked by pairing its
    // empty/whitespace docs)
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-unique").toString
    Seq((1L, "alpha bravo charlie delta echo foxtrot"),
        (2L, "golf hotel india juliet kilo lima"),
        (3L, "mike november oscar papa quebec romeo"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val (labels, rounds) = Dedup.clusterLabelsWithRounds(spark, d)
    assert(rounds == 0)
    assert(labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val surv = graft.SparkEntry.queries("q44_dedup_survivors")(spark, d)
      .collect().map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("cluster_size")).toMap
    assert(surv == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    spark.catalog.clearCache()
  }

  /** Run `body` with the driver fast path disabled (edge threshold 0) so
    * the distributed propagation loop itself is what's under test.
    */
  private def forcingDistributed[A](body: => A): A = {
    spark.conf.set("graft.dedup.localEdgeThreshold", "0")
    try body finally spark.conf.unset("graft.dedup.localEdgeThreshold")
  }

  test("adversarial 200-node path converges within the escalation round budget") {
    // worst case for min-label propagation: a single path 0–1–…–199 where
    // the min label travels one hop per plain round (~199 rounds). Past
    // JumpAfter (8) the loop composes the label table with itself each
    // round, halving the remaining depth — stated bound: 8 plain rounds
    // + ~log2(199) jumped rounds + 1 fixpoint observation ≈ 17; budget 20.
    // (threshold 0: a 199-edge graph would otherwise take the driver path)
    import spark.implicits._
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val docs = (0L until 200L).toDF("doc_id")
    val (labels, rounds) = forcingDistributed(
      Dedup.propagateMin(spark, pairs, docs))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    assert(got.values.forall(_ == 0L), "every path node must label to the min (0)")
    assert(rounds > 0, "distributed path not taken — threshold override broken")
    assert(rounds <= 20, s"200-node path took $rounds rounds — escalation broken")
    spark.catalog.clearCache()
  }

  test("driver fast path and distributed loop label identically") {
    // the adaptive cut (edge count vs graft.dedup.localEdgeThreshold) must
    // be invisible in the answer: same graph, both paths, byte-equal label
    // maps — and both equal the independent union-find truth. Graph mixes
    // the shapes that distinguish wrong implementations: a 3-cycle, a
    // 6-node chain (multi-hop min travel), a star, and singletons.
    import spark.implicits._
    val edgeSeq: Seq[(Long, Long)] =
      Seq((1L, 2L), (2L, 3L), (3L, 1L)) ++            // cycle
        (10L until 15L).map(i => (i + 1, i)) ++       // chain, reversed dirs
        Seq((30L, 25L), (30L, 26L), (30L, 27L))       // star, hub > leaves
    val docIds = (edgeSeq.flatMap(e => Seq(e._1, e._2)) ++ Seq(98L, 99L)).distinct
    val pairs = edgeSeq.toDF("doc_a", "doc_b")
    val docs = docIds.toDF("doc_id")
    val (fastL, fastRounds) = Dedup.propagateMin(spark, pairs, docs)
    val fast = fastL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fastRounds == 0, "expected the driver fast path under the default threshold")
    val (distL, distRounds) = forcingDistributed(
      Dedup.propagateMin(spark, pairs, docs))
    val dist = distL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distRounds > 0, "expected the distributed loop at threshold 0")
    assert(fast == dist)
    assert(fast == unionFind(docIds, edgeSeq))
    spark.catalog.clearCache()
  }

  test("cluster labels are STAGED once per (session, dir): bucketed by doc_id, reread not rebuilt") {
    // first read stages; the table is the artifact every cluster
    // consumer joins on
    val first = graft.SparkEntry.queries("q150_clusters64")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    for (t <- Seq(s"graft_q150_labels_$tag", s"graft_q43_labels_$tag")) {
      graft.SparkEntry.queries(
        if (t.contains("q150")) "q150_clusters64" else "q43_neardup_clusters")(
        spark, dir).count()
      assert(spark.catalog.tableExists(t), s"$t not staged")
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      assert(meta.bucketSpec.exists(_.bucketColumnNames == Seq("doc_id")),
        s"$t must be hash-bucketed by doc_id: ${meta.bucketSpec}")
    }
    // a second read serves the staged table — zero propagation rounds, no
    // persisted scaffolding left behind, identical labels
    graft.Caches.release(spark)
    val again = graft.SparkEntry.queries("q150_clusters64")(spark, dir)
    assert(again.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == first, "staged labels drifted from the built labels")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "the staged read must not persist anything")
    spark.catalog.clearCache()
  }

  test("q184 incremental append equals a fresh clustering of the union corpus") {
    // the exactness contract on real data: clustering seven-eighths of
    // the corpus, then appending the residue-3 shard through the
    // contracted-graph step, must label every document exactly as the
    // staged fresh closure does (the oracle IS q150's text)
    def labels(q: String): Map[Long, Long] =
      graft.SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
        .toMap
    val fresh = labels("q150_clusters64")
    val inc = labels("q184_label_append")
    graft.Caches.release(spark)
    assert(inc.size == fresh.size, "append must label every document")
    assert(inc == fresh, "incremental append drifted from the fresh closure")
    // the build leaves the old shard's band relation STAGED as a
    // (b, g)-partitioned artifact, and a delta-group probe of it reads
    // only the matching files — the o(old-shard) append pin (the
    // LabelStreamSpec band-probe pin's batch twin)
    val bandDir = graft.queries.Dedup.q184BandRoots
      .get((spark.sparkContext.applicationId, dir))
    assert(bandDir != null, "q184 must stage its band artifact")
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val g0 = spark.read.parquet(bandDir)
      .filter(col("b") === 0).select("g").as[Int].head()
    val probe = graft.streaming.LabelBandIndex.prunedRead(spark, bandDir,
      Seq((0, g0)))
    probe.collect()
    val scan = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    def parquetFiles(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
      val st = java.nio.file.Files.walk(p)
      try st.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
      finally st.close()
    }
    val all = parquetFiles(
      java.nio.file.Paths.get(bandDir.stripPrefix("file:")))
    val matching = all.count(_.toString.contains(s"/b=0/g=$g0/"))
    assert(matching > 0 && matching < all.size,
      s"fixture degenerate: $matching/${all.size}")
    assert(scan.metrics("numFiles").value == matching,
      s"band probe read ${scan.metrics("numFiles").value} files; only " +
        s"the $matching under b=0/g=$g0 (of ${all.size}) are allowed")
    spark.catalog.clearCache()
  }

  test("q184 planted bridge: a delta doc merges two old clusters; a delta twin joins; a loner stays singleton") {
    import spark.implicits._
    // deterministic simhash64 bridge triple (found by sweeping
    // replaced-suffix sizes over a 64-word base vocabulary; distances
    // are fixed properties of the tokenizer+hash):
    //   TA = word001..word064
    //   TB = TA with the last 4 words swapped for word101..word104
    //        → d(TA,TB) = 11 — NOT near-dups (bar is 8)
    //   TBr = TA with word061/word062 swapped for word101/word102
    //        → d(TA,TBr) = 7, d(TBr,TB) = 6 — near-dup of BOTH, and at
    //        d ≤ 7 the 8×8-bit band split shares a key by pigeonhole,
    //        so the pair generator must admit both bridge edges
    val vocab = (1 to 200).map(i => f"word$i%03d")
    val base = vocab.take(64)
    val tA = base.mkString(" ")
    val tB = (base.dropRight(4) ++ vocab.slice(100, 104)).mkString(" ")
    val tBr = (base.dropRight(4) ++ vocab.slice(100, 102) ++
      base.takeRight(4).drop(2)).mkString(" ")
    val uniq = Seq(
      "zebra quark lantern oboe marsh violet kestrel dune",
      "anvil copper glacier heron imprint jasmine kelp lotus",
      "nimbus orchid parable quince rivet saffron tundra umber")
    // old shard (% 8 != 3): twin A-cluster {0,1}, twin B-cluster {2,4},
    // two singletons; delta shard (% 8 = 3): the bridge (3), an
    // A-family twin (11), a loner (19)
    val d = java.nio.file.Files.createTempDirectory("graft-append").toString
    Seq(0L -> tA, 1L -> tA, 2L -> tB, 4L -> tB,
      5L -> uniq(0), 6L -> uniq(1),
      3L -> tBr, 11L -> tA, 19L -> uniq(2))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    // precondition: the union pair graph admits both bridge edges but
    // no direct A-B edge (otherwise the merge tests nothing)
    val pairs = graft.SparkEntry.queries("q42_simhash64_pairs")(spark, d)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(pairs((0L, 3L)) && pairs((2L, 3L)),
      s"bridge edges missing from the pair graph: $pairs")
    assert(!pairs((0L, 2L)) && !pairs((1L, 2L)) &&
      !pairs((0L, 4L)) && !pairs((1L, 4L)),
      s"A and B must not pair directly: $pairs")
    val got = graft.SparkEntry.queries("q184_label_append")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    graft.Caches.release(spark)
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      11L -> 0L, 5L -> 5L, 6L -> 6L, 19L -> 19L),
      s"append must merge {0,1}+{2,4} through the bridge to min-id 0, " +
        s"join the twin, keep loners singleton: $got")
    spark.catalog.clearCache()
  }

  test("q191 drift card: certifies the real corpus's append exactness; a planted cap-crossing reads 0") {
    import spark.implicits._
    // the card must CERTIFY what the q184 identity test observes on the
    // real corpus: no band parameter crossed its boundary
    val real = graft.SparkEntry.queries("q191_append_drift_card")(spark, dir)
      .collect()
    graft.Caches.release(spark)
    assert(real.length == 1)
    val r = real.head
    assert(r.getAs[Long]("w_old") == r.getAs[Long]("w_union") &&
      r.getAs[Long]("n_crossed") == 0L &&
      r.getAs[Long]("append_exact") == 1L,
      s"the verified-identical corpus must certify exact: $r")
    // planted crossing: 51 identical documents, 50 in the old shard and
    // one arriving as the delta — every band bucket sits AT the cap
    // before the growth and past it after, so a fresh union build drops
    // the bucket's pairs while the append kept the old ones: the card
    // must read all 8 buckets crossed and veto the append
    val ids = (0L until 200L).filter(_ % 8 != 3).take(50) :+ 3L
    val d = java.nio.file.Files.createTempDirectory("graft-drift").toString
    ids.map(i => (i, "same text in every single copy of this document"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val planted = graft.SparkEntry.queries("q191_append_drift_card")(
      spark, d).collect().head
    graft.Caches.release(spark)
    assert(planted.getAs[Long]("n_buckets") == 8L &&
      planted.getAs[Long]("n_crossed") == 8L &&
      planted.getAs[Long]("append_exact") == 0L,
      s"the planted crossing must veto the append: $planted")
    spark.catalog.clearCache()
  }

  test("q177 dedup card reads the planted duplication exactly") {
    // 3 identical copies + 2 distinct docs: 5 docs, 3 clusters, the
    // family of 3 is the largest, 2 docs are non-canonical duplicates
    // → dup_pm = (2 * 1000) div 5 = 400
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-dedupcard").toString
    val t = "the quick brown fox jumps over the lazy dog again and again"
    Seq((10L, t), (11L, t), (12L, t),
        (98L, "completely different content about spark catalyst planning"),
        (99L, "another unrelated document on bucketed staging tables"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val c = graft.SparkEntry.queries("q177_dedup_card")(spark, d)
      .collect().head
    assert(c.getAs[Long]("n_docs") == 5L)
    assert(c.getAs[Long]("n_clusters") == 3L)
    assert(c.getAs[Long]("max_cluster") == 3L)
    assert(c.getAs[Long]("dup_docs") == 2L)
    assert(c.getAs[Long]("dup_pm") == 400L)
    spark.catalog.clearCache()
  }

  test("q43 on a planted 3-chain merges A-B-C into one cluster") {
    // identical texts A=B and B'=C where B' is doc B re-issued verbatim:
    // chain A–B (hamming 0) and B–C (hamming 0) with A–C also hamming 0 —
    // plus a far-away singleton that must NOT join. This pins the merge
    // direction and singleton preservation deterministically (identical
    // sketches always share every band; the 4-doc corpus is under every
    // cap).
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-chain").toString
    val t = "the quick brown fox jumps over the lazy dog again and again"
    Seq((10L, t), (11L, t), (12L, t),
        (99L, "completely different content about spark catalyst planning"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q43_neardup_clusters")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
    spark.catalog.clearCache()
  }

  test("q170 takedown impact: a requested survivor and a requested free copy read differently") {
    // 10 docs so the modulus (5) samples requests {0, 5}. Doc 0 is a
    // singleton in source a — trivially its own survivor (deleting it
    // loses content). Docs 3 and 5 are identical twins in source b:
    // the tie-broken survivor is min id 3, so requested doc 5 is the
    // FREE copy (its cluster's content outlives the takedown).
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-takedown").toString
    Seq(
      (0L, "zebra quark alpha beta gamma", "a"),
      (1L, "one two three", "a"),
      (2L, "four five six", "a"),
      (3L, "the data with more words here", "b"),
      (4L, "seven eight nine", "b"),
      (5L, "the data with more words here", "b"),
      (6L, "unrelated tokens entirely", "c"),
      (7L, "more filler text rows", "c"),
      (8L, "even more filler", "c"),
      (9L, "last one", "c"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q170_takedown_impact")(spark, d)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("token_mass"),
          r.getAs[Long]("n_survivors"), r.getAs[Long]("survivor_pm")))).toMap
    graft.Caches.release(spark)
    assert(got == Map(
      "a" -> ((1L, 5L, 1L, 1000L)),
      "b" -> ((1L, 6L, 0L, 0L))), got.toString)
  }

  test("q175 takedown expansion: a requested twin expands to its whole cluster, a singleton to itself") {
    // 10 docs → tmod 5 → requests {1, 6}. Docs 1 and 3 are identical
    // twins (one cluster, label = min id 1): requesting 1 must expand
    // to BOTH members. Doc 6 is a singleton: it expands to itself.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-expand").toString
    val twin = "the data with more words here"
    Seq(
      (0L, "zebra quark alpha beta gamma"),
      (1L, twin),
      (2L, "four five six"),
      (3L, twin),
      (4L, "seven eight nine"),
      (5L, "one two three"),
      (6L, "unrelated tokens entirely"),
      (7L, "more filler text rows"),
      (8L, "even more filler"),
      (9L, "last one"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q175_takedown_expand")(spark, d)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("member_id"))).toSet
    graft.Caches.release(spark)
    assert(got == Set((1L, 1L, 1L), (1L, 1L, 3L), (6L, 6L, 6L)), got.toString)
  }

  test("q127 soft-dedup: cluster copies split a singleton's mass; floors documented") {
    // three verbatim copies (one component) + a singleton: members weigh
    // 1e6 div 3 = 333333 ppm each (the floor loss is the documented
    // remainder), the singleton exactly 1e6
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-soft").toString
    val t = "the quick brown fox jumps over the lazy dog again and again"
    Seq((10L, t), (11L, t), (12L, t),
        (99L, "completely different content about spark catalyst planning"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q127_soft_dedup")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"),
          r.getAs[Long]("weight_ppm")))).toMap
    assert(got === Map(
      10L -> ((10L, 3L, 333333L)), 11L -> ((10L, 3L, 333333L)),
      12L -> ((10L, 3L, 333333L)), 99L -> ((99L, 1L, 1000000L))))
    // the policy's conservation property: each component's weighted mass
    // is 1e6 up to the floor remainder (< cluster_size ppm)
    got.values.groupBy(_._1).foreach { case (_, members) =>
      val k = members.head._2
      val total = members.map(_._3).sum
      assert(total <= 1000000L && 1000000L - total < k, s"cluster mass $total")
    }
    spark.catalog.clearCache()
  }

  test("q69 planted graph: clique members share a rank above the isolated doc's base") {
    // three verbatim copies form a triangle in the q27 pair graph (every
    // pair hamming 0); the singleton receives no contributions, so its
    // rank is exactly the base term — and by symmetry the three clique
    // members' integer ranks are identical and strictly higher
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-pr").toString
    val t = "the quick brown fox jumps over the lazy dog again and again"
    Seq((10L, t), (11L, t), (12L, t),
        (99L, "completely different content about spark catalyst planning"))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q69_pagerank")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    val scale = 1000000000000L
    val base = ((scale / 4) * 15L) / 100L
    assert(got(99L) == base, s"isolated doc must hold exactly the base rank: $got")
    assert(got(10L) == got(11L) && got(11L) == got(12L),
      s"symmetric clique members must rank identically: $got")
    assert(got(10L) > base, s"clique members must outrank the isolated doc: $got")
    spark.catalog.clearCache()
  }

  test("capCrossings reads the cap boundary exactly over the pruned band pair") {
    import spark.implicits._
    // the q191 verdict's in-ensure form: a bucket crosses iff old
    // occupancy ≤ MaxBandDocs (50) < union occupancy — 50 old rows +
    // the arrival cross (51 > 50), 49 do not (50 ≤ 50)
    def oldB(n: Int) = (0 until n).map(i => (i.toLong, 0, 7L))
      .toDF("doc_id", "b", "bk")
    val newB = Seq((1000L, 0, 7L)).toDF("doc_id", "b", "bk")
    assert(Dedup.capCrossings(oldB(50), newB) == 1L,
      "50 prior rows + the arrival must read as a crossing")
    assert(Dedup.capCrossings(oldB(49), newB) == 0L,
      "49 prior rows + the arrival must not")
    spark.catalog.clearCache()
  }

  test("q184 consumes the q191 verdict: a cap-crossing growth stages the fresh closure, not the append") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 50 identical old docs sit exactly AT the cap (the old shard's own
    // honest build merges them); the 51st copy arrives as the delta and
    // pushes every bucket of the family past it — a fresh union closure
    // drops all the bucket's pairs (51 > 50) and labels everyone a
    // singleton, while the append (merges never retract) would keep the
    // old 50-way cluster. The wired verdict must pick the fresh side.
    val tA = (1 to 64).map(i => f"word$i%03d").mkString(" ")
    val oldIds = (0L until 60L).filter(_ % 8 != 3).take(50)
    val d = java.nio.file.Files
      .createTempDirectory("graft-q184-cross").toString
    (oldIds :+ 3L).map(i => (i, tA)).toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    def labels(q: String): Map[Long, Long] =
      graft.SparkEntry.queries(q)(spark, d).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
        .toMap
    val fresh = labels("q150_clusters64")
    assert(fresh.forall { case (id, c) => id == c },
      s"51 copies past the cap must all label as singletons: $fresh")
    val inc = labels("q184_label_append")
    graft.Caches.release(spark)
    assert(inc == fresh,
      "the consumed q191 verdict must stage the fresh closure")
    // and the verdict genuinely mattered: the naive append over the
    // same shards diverges (the old build merges its at-cap 50, and an
    // append never retracts a merge)
    val dOld = java.nio.file.Files
      .createTempDirectory("graft-q184-cross-old").toString
    oldIds.map(i => (i, tA)).toDF("doc_id", "text")
      .write.parquet(s"$dOld/documents.parquet")
    val oldLabels = graft.SparkEntry.queries("q150_clusters64")(spark, dOld)
    assert(oldLabels.collect().forall(_.getAs[Long]("cluster_id") == 0L),
      "the at-cap old shard's honest build must merge")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val naive = Dedup.appendLabels64(spark, oldLabels,
      docs.filter(col("doc_id") % 8 =!= 3),
      docs.filter(col("doc_id") % 8 === 3), 51L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
      .toMap
    graft.Caches.release(spark)
    assert(naive != fresh,
      "fixture degenerate: the naive append did not diverge from fresh")
    spark.catalog.clearCache()
  }
}
