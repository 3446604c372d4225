package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 10×-corpus sweep of the heavy COMPOSITES built on the clustering
  * labels (q105 survivor pick, q127 soft weights, q142 discounted
  * budget, q97 pipeline): BandScaleSpec proves the underlying band
  * family at this scale; this drives the composed policies through one
  * 50k corpus and asserts their invariants hold — conservation, weight
  * exactness, the min-id-on-tie survivor rule, the budget bound, and
  * the pipeline's stage arithmetic.
  *
  * The sweep also PINS a measured precision finding: at 50k documents
  * the 32-bit sketch's hamming ≤ 8 bar loses precision — band
  * candidates of unrelated sketches pass it at the birthday rate
  * (P[B(21,½) ≤ 8] ≈ 0.19 given a shared 11-bit band), so the q27 edge
  * set — and every cluster composite on it — over-merges far beyond
  * the planted duplicates. The 64-bit family (q42) holds the precision
  * at the same corpus (P ≈ 2·10⁻⁶ given a shared 16-bit band): the
  * documented upgrade path when a cluster chain outgrows the 32-bit
  * sketch, with q136's precision curve as the per-corpus dial. The
  * composites' invariants below are the ones that hold REGARDLESS of
  * how loose the edge bar is — that is what makes them policies, not
  * corpus-tuned heuristics.
  *
  * Corpus: 50k docs of 30–70 random tokens (2k vocabulary; length
  * varies by doc id so quality spans 0.36–0.84 and the quality-gated /
  * budget stages see a real distribution), doc 100·m+1 a verbatim copy
  * of 100·m.
  */
class CompositeScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scale-comp").toString
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 2000).map(i => s"w$i")
    var prev = ""
    val rows = (0 until 50000).map { i =>
      val t =
        if (i % 100 == 1) prev // planted verbatim copy of i-1
        else Seq.fill(30 + (i % 5) * 10)(vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      prev = t
      (i.toLong, t)
    }
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private val planted: Seq[(Long, Long)] =
    (0 until 50000 by 100).map(m => (m.toLong, (m + 1).toLong))

  test("32-bit vs 64-bit pair precision at 50k docs: q42's candidates track true collisions") {
    // both families recover the planted verbatim pairs; only the 64-bit
    // sketch's pair set stays ∝ true collisions — the 32-bit bar admits
    // birthday-rate false positives at this corpus (the measured reason
    // a cluster chain at scale rides the 64-bit family)
    val p27 = SparkEntry.queries("q27_simhash_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.release(spark)
    val p42 = SparkEntry.queries("q42_simhash64_pairs")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.release(spark)
    val plantedSet = planted.toSet
    assert(planted.count(p42.contains) >= (planted.size * 9) / 10,
      s"64-bit family recovered only ${planted.count(p42.contains)}/${planted.size}")
    assert(p42.size <= planted.size * 3,
      s"64-bit pair set ${p42.size} not ∝ the ${planted.size} true collisions")
    assert(p27.size > p42.size * 10,
      s"expected the 32-bit bar to over-admit at 50k docs (32-bit ${p27.size}, " +
        s"64-bit ${p42.size}) — if this starts failing, the precision note above is stale")
    assert(planted.count(p27.contains) >= (planted.size * 9) / 10)
    assert(p42.count(plantedSet.contains) * 3 >= p42.size,
      "planted pairs should dominate the 64-bit pair set")
  }

  test("q150 at 50k docs: the 64-bit cluster chain's labels track true collisions") {
    // the operator the precision finding above exists for: the SAME
    // propagation machinery over the 64-bit pair graph must label the
    // corpus with ~one cluster per planted pair merged and essentially
    // nothing else — clusters ∝ true collisions at 10×
    val rows = SparkEntry.queries("q150_clusters64")(spark, dir).collect()
    Caches.release(spark)
    assert(rows.length == 50000, "every document must be labeled")
    val label = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val co = planted.count { case (a, b) => label(a) == label(b) }
    assert(co >= (planted.size * 9) / 10,
      s"only $co/${planted.size} planted pairs co-labeled")
    val clusters = label.values.toSet.size
    assert(clusters >= 50000 - planted.size - 50 && clusters <= 50000 - co,
      s"$clusters clusters — the 64-bit chain must merge (almost) only the " +
        s"${planted.size} planted pairs")
  }

  test("q151 at 50k docs: the at-scale survivor pick keeps ~everything but the planted copies") {
    // the production read q150 exists for: under labels that track true
    // collisions, the survivor set is the corpus minus one doc per
    // merged planted pair — and a copy still never outlives its twin
    val rows = SparkEntry.queries("q151_survivors64")(spark, dir).collect()
    Caches.release(spark)
    assert(rows.map(_.getAs[Long]("cluster_size")).sum == 50000L)
    val keep = rows.map(_.getAs[Long]("keep_id")).toSet
    assert(keep.size == rows.length)
    assert(rows.length >= 50000 - planted.size - 50 &&
      rows.length <= 50000 - (planted.size * 9) / 10,
      s"${rows.length} survivors under the 64-bit labels")
    assert(planted.count { case (_, b) => keep.contains(b) } <= planted.size / 10)
  }

  test("q153 at 50k docs: the 64-bit band card reads zero capped buckets") {
    // the keyspace-headroom half of the precision story: at 10× the
    // 64-bit family widens to 4 bands of 16 bits (occupancy ≪ 1), so
    // NO bucket approaches the quadratic cap — a future non-zero
    // n_capped on this family is a true hot-cluster signal, never
    // keyspace exhaustion
    val rows = SparkEntry.queries("q153_band64_health")(spark, dir).collect()
    Caches.release(spark)
    assert(rows.length == 4, s"${rows.length} bands at 50k (expect 64/16)")
    rows.foreach { r =>
      assert(r.getAs[Long]("band_width") == 16L)
      assert(r.getAs[Long]("n_docs") == 50000L)
      assert(r.getAs[Long]("n_capped") == 0L && r.getAs[Long]("docs_capped") == 0L,
        r.toString)
    }
  }

  test("q127 at 50k docs: every copy weighted, weights exactly 1e6 div size, mass conserved") {
    val rows = SparkEntry.queries("q127_soft_dedup")(spark, dir).collect()
    Caches.release(spark)
    assert(rows.length == 50000, "soft dedup must label every document")
    // the exactness invariant on every row — floor(1e6 / size), never a
    // float reciprocal
    rows.foreach { r =>
      assert(r.getAs[Long]("weight_ppm") ==
        1000000L / r.getAs[Long]("cluster_size"), r.toString)
    }
    // cluster_size is consistent: the sizes of each distinct cluster
    // must sum back to the corpus (a window/label drift would break it)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.values.map(_.length.toLong).sum == 50000L)
    byCluster.foreach { case (c, ms) =>
      assert(ms.forall(_.getAs[Long]("cluster_size") == ms.length.toLong),
        s"cluster $c size column disagrees with its row count")
    }
    // ≥90% of the planted verbatim pairs share a cluster and so carry
    // discounted mass
    val label = rows.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    val co = planted.count { case (a, b) => label(a) == label(b) }
    assert(co >= (planted.size * 9) / 10,
      s"only $co/${planted.size} planted pairs co-clustered")
  }

  test("q105 at 50k docs: one survivor per cluster, sizes conserve, copies never outlive their twin") {
    val rows = SparkEntry.queries("q105_quality_survivors")(spark, dir).collect()
    Caches.release(spark)
    val keep = rows.map(_.getAs[Long]("keep_id")).toSet
    assert(keep.size == rows.length, "one survivor row per cluster")
    assert(rows.map(_.getAs[Long]("cluster_size")).sum == 50000L,
      "cluster sizes must conserve the corpus")
    // a planted copy has IDENTICAL text ⇒ identical quality ⇒ it can
    // never beat its smaller-id twin (equal quality loses the doc_id
    // tie; a higher-quality third member beats both) — so a co-clustered
    // +1 copy never survives, and ≥90% of pairs co-cluster (q127 row)
    val copiesSurviving = planted.count { case (_, b) => keep.contains(b) }
    assert(copiesSurviving <= planted.size / 10,
      s"$copiesSurviving planted copies outlived their min-id twin")
  }

  test("q142 at 50k docs: admitted discounted mass stays within the half-corpus budget") {
    val out = SparkEntry.queries("q142_discounted_budget")(spark, dir).collect()
    Caches.release(spark)
    assert(out.nonEmpty, "discounted budget selected nothing at 50k docs")
    val admitted = out.map(_.getAs[Long]("eff_tokens")).sum
    // recompute the budget bound independently: per-doc effective mass =
    // whitespace tokens × the q127 ppm weight, floored — admission is a
    // prefix under HALF the corpus-wide effective mass
    val weights = SparkEntry.queries("q127_soft_dedup")(spark, dir)
      .select(col("doc_id"), col("weight_ppm"))
    val total = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"))
      .join(weights, Seq("doc_id"))
      .select(expr("CAST((n_tokens * weight_ppm) div 1000000 AS BIGINT)").as("eff"))
      .agg(sum("eff")).head.getLong(0)
    Caches.release(spark)
    assert(admitted <= total / 2,
      s"admitted $admitted exceeds the half-mass budget ${total / 2}")
    // the budget must actually be exercised — a near-empty selection
    // would vacuously pass the bound
    assert(admitted >= total / 4,
      s"admitted $admitted ≪ budget ${total / 2} — selection collapsed?")
  }

  test("q97 at 50k docs: the pipeline composes end-to-end and conserves its stages' arithmetic") {
    val out = SparkEntry.queries("q97_curation_pipeline")(spark, dir).collect()
    Caches.release(spark)
    assert(out.nonEmpty, "pipeline emitted no packed chunks at 50k docs")
    // stage arithmetic: the quality gate keeps the 50/60/70-token docs
    // (~3/5 of ~49.5k dedup survivors), the split keeps TrainPct, bench
    // and contaminated docs drop — ~1.2–1.6M train tokens into 512-token
    // chunks
    val chunks = out.length
    assert(chunks > 1500 && chunks < 6000,
      s"$chunks chunks — pipeline stage arithmetic off at 10× scale")
    // chunk occupancy: every chunk starts ≥ 1 doc and no document spans
    // an implausible number of 512-token chunks (docs are ≤ 70 tokens)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("max_span") <= 2L, r.toString)
    }
  }

  /** AQE wraps subtrees in leaf-like stage nodes TreeNode.collect does
    * not descend into — recurse explicitly and return every node.
    */
  private def collectNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: collectNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: collectNodes(q.plan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  /** The term-IN candidate cuts over a staged-index scan: FilterExec
    * nodes directly above a scan whose schema carries `marker`. The
    * scan's own numOutputRows is pre-filter (parquet only skips whole
    * row groups/buckets — a murmur-spread term set skips few at 8
    * buckets); the FILTER's output IS the candidate set every join and
    * aggregate above it pays for.
    */
  private def candidateCuts(p: org.apache.spark.sql.execution.SparkPlan,
      marker: String): Seq[org.apache.spark.sql.execution.FilterExec] =
    collectNodes(p).collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if collectNodes(f.child).forall(n =>
          !n.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]) &&
          collectNodes(f.child).exists {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              s.schema.fieldNames.contains(marker)
            case _ => false
          } => f
    }

  /** q166/q168's second 50k corpus: even docs pass the gate (62 alpha
    * words incl. the two required stopwords), odd docs fail it (40
    * words, no stopwords) — the shared fixture's random tokens carry
    * no stopwords, so ITS gate is all-fail (degenerate training). Body
    * tokens draw from `lo until hi` of a 2k vocabulary per class, so
    * the two regimes below differ ONLY in how concentrated the class
    * signal is.
    */
  private def nbCorpus(passRange: (Int, Int), failRange: (Int, Int)): String = {
    val d2 = java.nio.file.Files.createTempDirectory("graft-scale-nb").toString
    val rnd = new scala.util.Random(13)
    val vocab = (0 until 2000).map(i => s"w$i")
    def draw(r: (Int, Int)) = vocab(r._1 + rnd.nextInt(r._2 - r._1))
    val s = spark
    import s.implicits._
    (0 until 50000).map { i =>
      val t = if (i % 2 == 0)
        ("the" +: "with" +: Seq.fill(60)(draw(passRange))).mkString(" ")
      else Seq.fill(40)(draw(failRange)).mkString(" ")
      (i.toLong, t)
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    d2
  }

  private def nbVerdicts(q: String, dir: String): Map[Long, Boolean] = {
    val m = SparkEntry.queries(q)(spark, dir)
      .select("doc_id", "nb_pass").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    Caches.release(spark)
    m
  }

  private def nbVerdictsAtWidth(dir: String, width: Int): Map[Long, Boolean] = {
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val lab = graft.functions.QualityRules.annotate(docs)
      .select(col("doc_id"), col("pass"))
    val bt = graft.queries.TextAnalysis.nbBucketTokens(docs, width)
    val m = bt.join(broadcast(
        graft.queries.TextAnalysis.nbBucketWeights(bt, lab)), "b")
      .groupBy("doc_id").agg(sum("w").as("nb_score"))
      .select(col("doc_id"), (col("nb_score") > 0).as("nb_pass"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    Caches.release(spark)
    m
  }

  private def gateAgree(m: Map[Long, Boolean]): Int =
    m.count { case (id, p) => p == (id % 2 == 0) }

  test("q166/q168 at 50k docs, distributed signal: hashing costs nothing at either width") {
    // DISTRIBUTED class signal — the realistic quality-model regime:
    // pass bodies draw w0..w1199, fail bodies w800..w1999 (a 400-token
    // ambiguous overlap), so ~2/3 of every doc's tokens are strongly
    // class-informative and margins dwarf per-token perturbation.
    // MEASURED: exact, hashed@65536 AND hashed@1024 all read
    // 50000/50000 gate agreement — bucket mixing blurs individual
    // weights (62 token weights differ at the shipped width) but wide
    // margins absorb it completely. Bars at 49500 = seed-drift floor.
    val d2 = nbCorpus((0, 1200), (800, 2000))
    val exact = nbVerdicts("q166_nb_quality", d2)
    val hashed = nbVerdicts("q168_nb_hashed", d2)
    val h1024 = nbVerdictsAtWidth(d2, 1024)
    assert(exact.size == 50000 && hashed.size == 50000)
    assert(gateAgree(exact) >= 49500, s"exact ${gateAgree(exact)}")
    assert(gateAgree(hashed) >= 49500, s"hashed ${gateAgree(hashed)}")
    assert(gateAgree(h1024) >= 49500, s"hashed@1024 ${gateAgree(h1024)}")
  }

  test("q166/q168 at 50k docs, concentrated signal: hashing is exposed at any width — the documented limit") {
    // CONCENTRATED signal — both classes draw the SAME full vocabulary,
    // so the gate's two stopwords carry ALL the separation (+13 each)
    // and every other token is ~0-weight boundary noise. MEASURED:
    //   - exact/gate agreement 48363/50000 (the ~3% noise floor of a
    //     bag-of-tokens model on boundary-sitting fail docs);
    //   - at width 1024 the stopword buckets each absorb ~2 random
    //     tokens, their weights dilute toward the bulk, and the pass
    //     class COLLAPSES: 3118/25000 verdicts agree with exact;
    //   - at the shipped 65536, ONE collision ("with" hashed beside a
    //     random token; weight 13 → 4-5) still halves the margin and
    //     costs ~16k boundary verdicts (gate agreement 32272/50000) —
    //     a wider table lowers the PROBABILITY of that collision, it
    //     cannot remove it.
    // The operator-level conclusion this pins: hashed distillation
    // (q168 / the frozen streaming scorer) is safe when class signal is
    // distributed (test above) and must NOT be trusted when the signal
    // concentrates in a handful of features — there the exact q166 (or
    // a per-feature collision audit) is the correct tool. Bars are
    // regression floors/ceilings around the measurements.
    val d2 = nbCorpus((0, 2000), (0, 2000))
    val exact = nbVerdicts("q166_nb_quality", d2)
    assert(gateAgree(exact) >= 47500, s"exact ${gateAgree(exact)}")
    val h1024 = nbVerdictsAtWidth(d2, 1024)
    val agreePass1024 = exact.count { case (id, p) =>
      id % 2 == 0 && h1024(id) == p }
    assert(agreePass1024 <= 10000,
      s"width-1024 pass-class agreement $agreePass1024/25000 — the " +
        "dilution finding may be stale")
  }

  test("q148 at 50k docs: serve cost tracks the query terms' postings, never the corpus; cuts hold") {
    // the staged-index discipline AT SCALE: the ~8 sampled queries cap
    // at ≤ 16 terms each, so the candidate fetch may output only those
    // ≤ 128 terms' postings — a small fraction of the ~2.4M-row postings
    // table (candidate-count pin, not just a plan-shape pin); the
    // per-query top-k cut holds; and every query document (guaranteed
    // to match all its own capped terms at exact tf) ranks itself first
    val served = SparkEntry.queries("q148_bm25_topk")(spark, dir)
    val rows = served.collect()
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val totalPost = spark.table(s"graft_lex_postings_$tag").count()
    val cuts = candidateCuts(served.queryExecution.executedPlan, "tf")
    assert(cuts.nonEmpty, "no postings candidate cut found in the serve plan")
    cuts.foreach { f =>
      val n = f.metrics("numOutputRows").value
      assert(n > 0 && n < totalPost / 5,
        s"candidate cut emitted $n of $totalPost postings rows — " +
          "work above it must track the query terms, not the corpus")
    }
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 8, s"doc-modulus sample drifted: ${byQ.keys.toSeq.sorted}")
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 10, s"top-k cut failed for $qid: ${rs.length}")
      assert(rs.minBy(_.getAs[Long]("rnk")).getAs[Long]("doc_id") == qid,
        s"query $qid must retrieve itself first at this vocabulary")
    }
    Caches.release(spark)
  }

  test("q182 at 50k docs: the impact serve's candidate fetch is bounded by K·terms; un-truncated lists equal q148") {
    val served = SparkEntry.queries("q182_impact_bm25_topk")(spark, dir)
    val rows = served.collect()
    val k = TextAnalysis.impactKFor(spark, dir)
    // THE bound the sidecar exists for: the candidate cut above the
    // impact-table scan may emit at most K rows per capped query term
    // (8 queries × ≤16 terms) — where q148's cut is bounded only by the
    // terms' full postings (corpus-tracking when one term's df is).
    // Matched by TABLE (the pruned ReadSchema drops the imp column).
    val cuts = collectNodes(served.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if collectNodes(f.child).forall(n =>
          !n.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]) &&
          collectNodes(f.child).exists {
            case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
              sc.tableIdentifier.exists(_.table.startsWith("graft_lex_impact"))
            case _ => false
          } => f
    }
    assert(cuts.nonEmpty, "no impact candidate cut found in the serve plan")
    cuts.foreach { f =>
      val n = f.metrics("numOutputRows").value
      assert(n > 0 && n <= k * 8 * 16,
        s"impact candidate cut emitted $n rows — the serve's contract is " +
          s"≤ K·terms = ${k * 8 * 16}")
    }
    // at this corpus the derived K (16·⌈√50k⌉ = 3584) exceeds every
    // query term's df (~1250 at a 2k vocabulary), so the lists are
    // complete and the approximate serve must EQUAL the exact one —
    // truncation drift is a property of heavier-tailed dfs (the forced-K
    // fixture in RetrievalSpec pins that half)
    val exact = SparkEntry.queries("q148_bm25_topk")(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      exact.map(_.toString).sorted.toSeq,
      "un-truncated impact serve drifted from the exact serve")
    Caches.release(spark)
  }

  test("q154 at 50k docs: the phrase serve reads only the phrase terms' positions; self always present") {
    val served = SparkEntry.queries("q154_phrase_topk")(spark, dir)
    val rows = served.collect()
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val totalPos = spark.table(s"graft_lex_pos_$tag").count()
    val cuts = candidateCuts(served.queryExecution.executedPlan, "pos")
    assert(cuts.nonEmpty, "no positional candidate cut found in the serve plan")
    cuts.foreach { f =>
      val n = f.metrics("numOutputRows").value
      assert(n > 0 && n < totalPos / 5,
        s"candidate cut emitted $n of $totalPos position rows — " +
          "adjacency work must track the phrase terms, not the corpus")
    }
    // every query doc contains its own leading bigram; random bigram
    // collisions (~0.6 expected docs per phrase at this vocabulary)
    // cannot push it out of the top 10 — presence, not rank-1, is the
    // scale-stable assertion
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 8, s"doc-modulus sample drifted: ${byQ.keys.toSeq.sorted}")
    byQ.foreach { case (qid, rs) =>
      assert(rs.length <= 10, s"top-k cut failed for $qid: ${rs.length}")
      assert(rs.exists(_.getAs[Long]("doc_id") == qid),
        s"query $qid's own phrase occurrence must surface")
    }
    Caches.release(spark)
  }
}
