package graft.queries

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators — the decisions a training-data pipeline
  * makes AFTER per-document analysis: which split a document lands in,
  * whether it leaks an evaluation set, which documents fit a token
  * budget, and how to balance strata. North-star extension surface (the
  * reference has no corpus layer); each query is DuckDB-oracle-mirrored.
  *
  * Determinism contract: every selection here is a pure function of the
  * data — sha-derived [[portableHash]] assignment instead of `rand()`
  * (reproducible across runs, repartitions, and late-arriving rework),
  * integer arithmetic for every threshold, and IEEE doubles only as
  * per-row values computed identically in both engines.
  */
object Curation {

  /** q56 split fractions: bucket < 80 → train, < 90 → val, else test. */
  private[queries] val TrainPct = 80
  private[queries] val ValPct = 90

  /** q57's evaluation-set membership: every 97th doc_id. A stand-in for
    * the real pipeline's benchmark table; the operator shape (distinct
    * shingle semi-join) is what scales, not the membership rule.
    */
  private[queries] val BenchMod = 97

  /** q57 shingle width: word 8-grams — long enough that natural overlap
    * is rare, the standard contamination n-gram scale (Brown et al.'s
    * GPT-3 appendix uses 8–13-gram overlap for decontamination).
    */
  private[queries] val DecontamGram = 8

  /** q102's bloom geometry: the eval-gram filter is words·64 bits
    * (2048 words = 16 KiB broadcast) with [[TextAnalysis.BloomK]]
    * seeded hash probes — at the test corpora the false-positive rate
    * is ~2% at sf0.1's eval-gram mass; at 100 TB `words` is the ONE
    * knob (the filter stays a fixed-size broadcast while q57's exact
    * join pays a gram-keyed shuffle of the whole train side).
    */
  private[graft] val BloomDecontamWords = 2048

  /** The K seeded probe positions of a hashed gram into the
    * [[BloomDecontamWords]]·64-bit filter — ONE definition shared by the
    * batch builder/prober (q102) and the streaming dual
    * ([[graft.streaming.DocStream.bloomDecontaminated]]), so the two
    * paths cannot disagree on a bit position. Grams probe via their
    * decimal string (the cross-engine-portable rendering of the shared
    * 32-bit gram hash); [[graft.functions.TextFunctions.portableHash]]
    * is non-negative, so the modulus is too.
    */
  private[graft] def bloomProbes(g: Column): Seq[Column] =
    (0 until TextAnalysis.BloomK).map(j =>
      portableHash(g.cast("string"), j) % lit(BloomDecontamWords * 64L))

  /** Bit-test of probe position `p` against a filter ARRAY column (the
    * q102 agg output or a frozen literal) — shared with the streaming
    * dual. `p div 64` / `p mod 64` as shift/mask (p is non-negative).
    */
  private[graft] def bloomHit(bloom: Column, p: Column): Column =
    element_at(bloom, call_function("shiftright", p, lit(6)).cast("int") + 1)
      .bitwiseAND(call_function("shiftleft", lit(1L),
        p.bitwiseAND(lit(63L)).cast("int"))) =!= 0

  /** q58's bounded quality grid: quality ∈ [0,1] by construction, so it
    * quantizes onto this many integer cells. The cell-total collect the
    * distributed prefix sum performs is ≤ this many rows — a driver
    * accounting read with a hard bound, independent of corpus size.
    */
  private[queries] val QualityCells = 4096

  /** q58's boundary tie group is range-split over this many deterministic
    * doc_id buckets, so even a corpus whose quality collapses to one
    * value never pays a single-task row sort.
    */
  private[queries] val TieBuckets = 64

  /** q118's sample size: the eval/debug pick a pipeline draws
    * size-weighted. A k knob, not corpus-tracking.
    */
  private[queries] val PrioritySampleK = 100

  /** Driver half of a distributed prefix sum: exclusive running offsets
    * of per-partition totals — `offset(p) = Σ totals(p') for p' < p`.
    * Input is the collected (partition, total) rows (bounded: ≤
    * [[QualityCells]] or ≤ [[TieBuckets]]); output rejoins the plan as
    * one map literal.
    */
  private[queries] def exclusiveOffsets(totals: Seq[(Int, Long)]): Map[Int, Long] = {
    val sorted = totals.sortBy(_._1)
    sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
  }

  /** The distributed budgeted prefix selection — q58's machinery factored
    * over an arbitrary ranking column, so every "rank the corpus, admit
    * until a token budget" operator (q58 by quality, q107 by DSIR
    * importance) runs ONE audited implementation. Contract: `scored` is
    * a persisted (doc_id, n_tokens, rank) relation (rank non-null,
    * double); `cellOf` maps `rank` onto a bounded integer grid ascending
    * as rank DESCENDS (Spark-side machinery only — output semantics are
    * the oracle's single cumsum over (rank DESC, doc_id)); `budgetOf`
    * derives the token budget from the corpus token mass. Selected =
    * rows whose running total over (rank DESC, doc_id) ≤ budget.
    *
    * Shape (see the q58 Scaladoc history for the derivation): ONE
    * row-level aggregation carries per-rank-group token mass AND the
    * group's doc_id range; the cumsum runs per-CELL via a partitioned
    * window with driver-prefix-summed offsets ([[exclusiveOffsets]] —
    * ≤ [[QualityCells]] rows read); whole groups pass/fail on their
    * group-end cum; only the ONE boundary tie group pays a row-level
    * cumsum, itself distributed over [[TieBuckets]] doc_id ranges. No
    * unpartitioned window anywhere; driver reads are three bounded jobs.
    */
  private[queries] def budgetedPrefixSelect(scored: DataFrame,
      cellOf: Column, budgetOf: Long => Long): DataFrame = {
    val hist = scored.groupBy("rank")
      .agg(sum("n_tokens").as("gtok"),
        min("doc_id").as("lo_id"), max("doc_id").as("hi_id"))
      .withColumn("cell", cellOf).persist()
    val cellTotals = hist.groupBy("cell").agg(sum("gtok").as("ct"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toSeq
    // zero histogram rows ⇔ empty/untokenizable corpus: a defined empty
    // selection, not a driver NPE on a null aggregate
    if (cellTotals.isEmpty) {
      hist.unpersist()
      scored.unpersist()
      scored.limit(0)
    } else {
      // the cell histogram partitions the corpus, so its totals sum to
      // the corpus token mass — the budget needs no extra job
      val budget = budgetOf(cellTotals.map(_._2).sum)
      val cellOff = exclusiveOffsets(cellTotals)
      val cumW = Window.partitionBy("cell").orderBy(desc("rank"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the boundary GROUP lives in the first cell (ascending = global
      // rank-DESC order) whose end-of-cell running total crosses the
      // budget — already known DRIVER-SIDE from the collected histogram
      // totals (r22, guide §2.3): earlier cells end at ≤ budget, so no
      // group of theirs can cross, and the crossing cell's last group
      // provably does. The boundary probe therefore windows ONE cell's
      // rank groups (with that cell's literal offset) instead of
      // shuffling the whole rank histogram — at corpus scale the
      // histogram is one row per distinct rank value, corpus-tracking;
      // the probed cell is 1-of-QualityCells of it. A budget covering
      // every cell has no crossing cell and skips the probe job
      // entirely (the defined None road below).
      val cStar = cellTotals.sortBy(_._1)
        .find { case (c, ct) => cellOff(c) + ct > budget }.map(_._1)
      // first group whose running total crosses the budget: its rows
      // get the remaining budget, later groups are out entirely
      val boundary = cStar.flatMap { cs =>
        hist.filter(col("cell") === cs)
          .withColumn("cum", sum("gtok").over(cumW) + lit(cellOff(cs)))
          .filter(col("cum") > budget)
          .orderBy(desc("rank")).limit(1)
          .select("rank", "cum", "gtok", "lo_id", "hi_id")
          .collect().headOption
      }
      hist.unpersist()
      boundary match {
        case None =>
          // unreachable for any budget < total, but the budget is
          // data-derived — stay total-defined rather than assume
          scored.select("doc_id", "n_tokens", "rank")
        case Some(r) =>
          val qb = r.getAs[Double]("rank")
          val remaining =
            budget - (r.getAs[Long]("cum") - r.getAs[Long]("gtok"))
          val fullSel = scored.filter(col("rank") > qb)
            .select("doc_id", "n_tokens", "rank")
          // the boundary tie group, range-split on doc_id: integer
          // `div` (not a double floor — exact at any id magnitude)
          // into TieBuckets deterministic buckets, over the id range
          // the boundary row already carries
          val lo = r.getAs[Long]("lo_id")
          val bw = math.max(1L, (r.getAs[Long]("hi_id") - lo) / TieBuckets + 1)
          val tieB = scored.filter(col("rank") === qb)
            .withColumn("bkt",
              expr(s"CAST((doc_id - ${lo}L) div ${bw}L AS INT)"))
          val bktOff = exclusiveOffsets(
            tieB.groupBy("bkt").agg(sum("n_tokens").as("bt")).collect()
              .map(r => r.getInt(0) -> r.getLong(1)).toSeq)
          val tieW = Window.partitionBy("bkt").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          // bktOff holds every bucket tieB itself produced — same
          // cannot-miss argument as cellOff above
          val boundarySel = tieB.withColumn("c",
              sum("n_tokens").over(tieW) +
                element_at(typedLit(bktOff), col("bkt")))
            .filter(col("c") <= remaining)
            .select("doc_id", "n_tokens", "rank")
          fullSel.union(boundarySel)
      }
    }
  }

  /** q155/q156's mixture weights: relative sampling weights per source —
    * the mixture config a pipeline owner hands the engine (the Pile/
    * Dolma-style "upweight curated domains" knob). Sources not listed
    * weigh [[MixtureDefaultW]]; the operators are weight-agnostic. A
    * Seq (not a Map) so the SQL mirror's CASE chain has ONE defined
    * order.
    */
  private[queries] val MixtureWeights: Seq[(String, Long)] =
    Seq("src0" -> 4L, "src1" -> 2L)
  private[queries] val MixtureWeightsMap: Map[String, Long] =
    MixtureWeights.toMap
  private[queries] val MixtureDefaultW = 1L

  /** q155/q156's null-source sentinel: a NULL `source` coalesces to this
    * in BOTH engines before any grouping/quota lookup, so a null-source
    * stratum draws a quota under [[MixtureDefaultW]] like any other
    * instead of (a) poisoning the Spark quota-map lookup (typedLit maps
    * forbid null keys), (b) vanishing from the oracle's `JOIN … USING
    * (source)`, or (c) bypassing its quota through a NULL cumsum — the
    * degenerate-input discipline. A real source literally named this
    * merges with the null stratum; documented, not defended (same class
    * as any sentinel).
    */
  private[queries] val NullSrc = "(null)"

  /** q155's budget divisor: the mixture targets 1/this of the corpus
    * token mass (corpus-derived like q58's half — nothing hand-tuned to
    * a scale factor).
    */
  private[queries] val MixtureShare = 5L

  /** The q155/q156 quota table — largest-remainder (Hamilton)
    * apportionment of the mixture token budget across sources: per
    * source present in the scored corpus, quota = floor(B·w/W) plus one
    * of the R = B − Σfloor leftover tokens, awarded by remainder rank
    * (rem DESC, source ASC). Exact by construction: quotas are integers
    * and Σ quota = B EXACTLY (the property float proportional splits
    * lose) — cross-engine hash-identical. Apportionment runs over the
    * sources of the SCORED (tokenizable) relation, so a source with no
    * selectable mass draws no quota.
    *
    * Plan shape: the corpus pays one narrow score + ONE map-combined
    * aggregate per scalar; the scalars (corpus mass, weight total, floor
    * total) ride 1-row broadcasts (the q61 scalar pattern); the
    * remainder rank is a window over the ≤|sources| apportionment rows —
    * bounded by the source VALUE SPACE, never corpus-tracking (the q116
    * card discipline).
    */
  private[graft] def mixtureQuotas(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    mixtureQuotasOver(scoredTokens(docs)
      .join(docs.select(col("doc_id"),
        coalesce(col("source"), lit(NullSrc)).as("source")), "doc_id"))
  }

  /** [[mixtureQuotas]]' apportionment over an EXPLICIT scored relation
    * carrying (source, n_tokens) — factored (r22) so q156 can feed its
    * already-PERSISTED scored relation instead of re-executing the
    * scoring chain a second time inside the quota collect (the q97
    * lesson: exchange reuse never spans driver actions, a persist
    * does). q155 keeps the standalone road — same plan, same oracle.
    */
  private[graft] def mixtureQuotasOver(scored: DataFrame): DataFrame = {
    val tot = scored.agg(sum("n_tokens").as("t_total"))
    val srcs = scored.select("source").distinct()
      .select(col("source"),
        coalesce(try_element_at(typedLit(MixtureWeightsMap), col("source")),
          lit(MixtureDefaultW)).as("w"))
    val ww = srcs.agg(sum("w").as("ws"))
    val ap = srcs.crossJoin(broadcast(ww)).crossJoin(broadcast(tot))
      .withColumn("b", expr(s"t_total div $MixtureShare"))
      .withColumn("base", expr("(b * w) div ws"))
      .withColumn("rem", expr("b * w - ((b * w) div ws) * ws"))
    val sb = ap.agg(sum("base").as("sbase"))
    // source is non-null post-coalesce, so Spark's NULLS FIRST vs
    // DuckDB's NULLS LAST ASC defaults can never diverge on this window
    val wR = Window.orderBy(desc("rem"), asc("source"))
    ap.crossJoin(broadcast(sb))
      .withColumn("rnk", row_number().over(wR))
      .select(col("source"), col("w"),
        (col("base") +
          when(col("rnk") <= col("b") - col("sbase"), lit(1L))
            .otherwise(lit(0L))).as("quota_toks"))
  }

  /** [[budgetedPrefixSelect]] generalized to PER-STRATUM budgets — the
    * selection step of mixture building (q156): within each stratum,
    * admit rows in (rank DESC, doc_id) order while the stratum's running
    * token total stays ≤ its quota. The naive form — ONE window
    * partitioned by stratum — is the q58 defect class multiplied: a
    * stratum holding half the corpus is a one-task sort of half the
    * corpus. This runs the same distributed-prefix-sum machinery with
    * every driver artifact keyed by stratum instead:
    * (strat, rank)-histogram → (strat, cell)-partitioned cumsum with
    * driver offsets (≤ strata × [[QualityCells]] rows read) → whole rank
    * groups pass/fail per stratum → ONE boundary tie group PER STRATUM
    * pays row-level work, itself range-split over [[TieBuckets]]. Driver
    * reads stay bounded by strata × cells/buckets — value-space bounds,
    * never corpus-tracking. Contract mirrors the global form: `scored`
    * is a persisted (strat, doc_id, n_tokens, rank) relation, rank
    * non-null double; strata absent from `quotas` draw quota 0.
    */
  private[queries] def stratifiedPrefixSelect(scored: DataFrame,
      cellOf: Column, quotas: Map[String, Long]): DataFrame = {
    val hist = scored.groupBy("strat", "rank")
      .agg(sum("n_tokens").as("gtok"),
        min("doc_id").as("lo_id"), max("doc_id").as("hi_id"))
      .withColumn("cell", cellOf).persist()
    val cellTotals = hist.groupBy("strat", "cell").agg(sum("gtok").as("ct"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    if (cellTotals.isEmpty) {
      // empty/untokenizable corpus: a defined empty selection
      hist.unpersist()
      scored.unpersist()
      scored.select("strat", "doc_id", "n_tokens", "rank").limit(0)
    } else {
      // NESTED per-stratum maps, not a concat-string key: a stratum name
      // containing '#'+digits would collide under "st#cell" flattening
      // (strat "a#1" cell 2 vs strat "a" cell 12) and silently corrupt
      // one stratum's cumsum — the nested lookup is ambiguity-free for
      // ANY stratum value
      val offKey: Map[String, Map[Int, Long]] = cellTotals.groupBy(_._1).map {
        case (st, rows) =>
          st -> exclusiveOffsets(rows.map(t => t._2 -> t._3))
      }
      val cumW = Window.partitionBy("strat", "cell").orderBy(desc("rank"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // each stratum's boundary group lives in its first cell whose
      // end-of-cell running total crosses the stratum quota — known
      // driver-side from the collected (strat, cell) totals (r22, the
      // budgetedPrefixSelect argument per stratum): the probe windows
      // ≤ 1 cell's groups PER STRATUM instead of shuffling the whole
      // (strat, rank) histogram. Strata whose quota covers their mass
      // have no crossing cell, produce no boundary row (as before), and
      // an all-covered corpus skips the probe job entirely.
      val cStarM: Map[String, Int] = cellTotals.groupBy(_._1)
        .flatMap { case (st, rows) =>
          val off = offKey(st)
          val q = quotas.getOrElse(st, 0L)
          rows.map(t => (t._2, t._3)).sortBy(_._1)
            .find { case (c, ct) => off(c) + ct > q }
            .map(hit => st -> hit._1)
        }
      val quotaCol = coalesce(
        try_element_at(typedLit(quotas), col("strat")), lit(0L))
      // first over-quota group per stratum: ≤ |strata| boundary rows
      val wB = Window.partitionBy("strat").orderBy(desc("rank"))
      val bRows =
        if (cStarM.isEmpty) Array.empty[org.apache.spark.sql.Row]
        else hist
          .filter(try_element_at(typedLit(cStarM), col("strat")) ===
            col("cell"))
          .withColumn("cum", sum("gtok").over(cumW) +
            element_at(element_at(typedLit(offKey), col("strat")),
              col("cell")))
          .filter(col("cum") > quotaCol)
          .withColumn("rn", row_number().over(wB)).filter(col("rn") === 1)
          .select("strat", "rank", "cum", "gtok", "lo_id", "hi_id")
          .collect()
      hist.unpersist()
      if (bRows.isEmpty) {
        // every stratum's quota covers its whole mass
        scored.select("strat", "doc_id", "n_tokens", "rank")
      } else {
        val qbM = bRows.map(r => r.getString(0) -> r.getAs[Double]("rank")).toMap
        val remM = bRows.map { r =>
          val st = r.getString(0)
          st -> (quotas.getOrElse(st, 0L) -
            (r.getAs[Long]("cum") - r.getAs[Long]("gtok")))
        }.toMap
        val loM = bRows.map(r => r.getString(0) -> r.getAs[Long]("lo_id")).toMap
        val bwM = bRows.map { r =>
          val st = r.getString(0)
          st -> math.max(1L,
            (r.getAs[Long]("hi_id") - r.getAs[Long]("lo_id")) / TieBuckets + 1)
        }.toMap
        val qb = try_element_at(typedLit(qbM), col("strat"))
        // strata with no boundary row (quota ≥ stratum mass) keep
        // everything; bounded strata pass whole groups above the
        // boundary rank
        val fullSel = scored.filter(qb.isNull || col("rank") > qb)
          .select("strat", "doc_id", "n_tokens", "rank")
        // the per-stratum boundary tie groups, range-split on doc_id
        // (loM/bwM/remM hold exactly the tie strata — cannot miss)
        val tieB = scored.filter(qb.isNotNull && col("rank") === qb)
          .withColumn("lo_v", element_at(typedLit(loM), col("strat")))
          .withColumn("bw_v", element_at(typedLit(bwM), col("strat")))
          .withColumn("bkt", expr("CAST((doc_id - lo_v) div bw_v AS INT)"))
        // nested per-stratum bucket offsets — same collision-free
        // lookup discipline as offKey above
        val tieOff: Map[String, Map[Int, Long]] = tieB
          .groupBy("strat", "bkt").agg(sum("n_tokens").as("bt"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
          .groupBy(_._1).map { case (st, rows) =>
            st -> exclusiveOffsets(rows.map(t => t._2 -> t._3).toSeq)
          }
        val tieW = Window.partitionBy("strat", "bkt").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val boundarySel = tieB.withColumn("c", sum("n_tokens").over(tieW) +
            element_at(element_at(typedLit(tieOff), col("strat")), col("bkt")))
          .filter(col("c") <= element_at(typedLit(remM), col("strat")))
          .select("strat", "doc_id", "n_tokens", "rank")
        fullSel.union(boundarySel)
      }
    }
  }

  /** q72's training-sequence capacity in tokens: the context-window size
    * documents are concatenated into. 512 keeps sf0.001 chunks plural;
    * the operator is capacity-agnostic.
    */
  private[queries] val PackCapacity = 512L

  /** q72's doc_id key space is range-split over this many deterministic
    * buckets for the distributed prefix sum — same bound class as
    * [[TieBuckets]]: the only driver reads are the 1-row id range and
    * the ≤ this-many bucket totals, at any corpus size.
    */
  private[queries] val PackBuckets = 64

  /** q171's padding-batch width: sequences per padded batch. */
  private[queries] val BatchSeqs = 8L

  /** q81's epoch seed: a different seed is a different (reproducible)
    * permutation — the per-epoch reshuffle knob.
    */
  private[queries] val ShuffleSeed = 7

  /** q123's output-shard fan-out: how many parallel files the packed
    * corpus writes to. A writer-parallelism knob, not corpus-tracking —
    * at 100 TB this is the number of output partitions per epoch dir.
    */
  private[queries] val ShardCount = 8L

  /** q130's exemplar count: how many top-quality documents the dataset
    * card shows per source. A presentation knob, not corpus-tracking.
    */
  private[queries] val ExemplarK = 3

  /** q133's per-stratum sample size. A fixed-budget knob (eval sets,
    * human-review batches), not corpus-tracking.
    */
  private[queries] val StratumK = 25

  /** q129's checksum modulus (2^61 − 1, a Mersenne prime) and hash-seed.
    * The per-row 60-bit hashes accumulate in decimal(38,0) — exact to
    * ~10^20 rows — and reduce mod P to one comparable BIGINT.
    */
  private[queries] val ChecksumMod = 2305843009213693951L
  private[queries] val ChecksumSeed = 11

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // deterministic train/val/test split: bucket = portable hash of the
    // document KEY mod 100 — not rand() (irreproducible), not row order
    // (repartition-dependent). Zero shuffles, trivially parallel at any
    // corpus size; the split of a document never changes when the corpus
    // around it grows, which is what makes downstream eval sets stable.
    "q56_hash_split" -> ((s, dir) => {
      val bucket = bucketCol(col("doc_id"))
      Tables(s, dir, "documents").select(
        col("doc_id"),
        bucket.as("bucket"),
        splitCol(bucket).as("split"))
    }),

    // benchmark decontamination: flag training documents sharing any word
    // 8-gram with the evaluation set — the leak check every pipeline runs
    // before training. Shape: distinct hashed shingles on both sides, ONE
    // equi-join keyed on the shingle hash (work ∝ true collisions, the
    // q22 candidate-generation shape), then a per-doc count and a left
    // join to keep clean documents with n_overlap = 0. The eval side is
    // benchmark-sized, so AQE broadcasts it at any training-corpus scale;
    // nothing corpus-sized is ever collected or broadcast by hand.
    "q57_decontaminate" -> ((s, dir) => {
      // the gram relation is staged ONCE: it feeds the bench side, the
      // train-side overlap explode, AND the clean-doc left join below —
      // unpersisted, Catalyst would recompute the tokenize→shingle→hash
      // map (the costliest stage of this query) up to 3×. Default
      // MEMORY_AND_DISK storage spills rather than evicts at cluster
      // scale; the consumer's [[graft.Caches.release]] completion hook
      // frees it (Verify/Bench call it after every query).
      val docs = gramStage(Tables.wide(s, dir, "documents"), Seq("doc_id"))
        .persist()
      val benchGrams = docs.filter(col("doc_id") % BenchMod === 0)
        .select(explode(col("g8")).as("g")).distinct()
      val train = docs.filter(col("doc_id") % BenchMod =!= 0)
      // per-doc grams are distinct, so the join emits one row per
      // (doc, overlapping gram) and the count IS the overlap cardinality
      val overlap = train.select(col("doc_id"), explode(col("g8")).as("g"))
        .join(benchGrams, Seq("g"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
      train.select(col("doc_id")).join(overlap, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
        .withColumn("contaminated", col("n_overlap") > 0)
    }),

    // bloom-filter decontamination — q57's semantics behind a
    // fixed-size broadcast sketch, the shape that scales where the
    // exact join cannot: q57 shuffles every train gram against the
    // eval-gram relation; here the eval set collapses into ONE
    // [[BloomDecontamWords]]·64-bit filter (a map-combined
    // [[graft.functions.BloomBitsAgg]] — fixed state however large the
    // eval set) broadcast to every executor, and the train side is a
    // NARROW pass: per gram, K seeded bit-probes against the local
    // filter, no shuffle until the per-doc count agg. One-sided error
    // by construction — a doc q57 flags is ALWAYS flagged here (no
    // false negatives, the decontamination direction that matters);
    // `n_maybe ≥ n_overlap` with excess = bloom false positives,
    // bounded by the words knob. Grams hash to positions via their
    // decimal string (the one cross-engine-portable rendering of the
    // shared 32-bit gram hash).
    "q102_bloom_decontaminate" -> ((s, dir) => {
      val docs = gramStage(Tables.wide(s, dir, "documents"), Seq("doc_id"))
        .persist() // feeds the eval bloom + the train probe + clean docs
      val bloom = docs.filter(col("doc_id") % BenchMod === 0)
        .select(explode(col("g8")).as("g")).distinct()
        .select(array(bloomProbes(col("g")): _*).as("ps"))
        .agg(graft.functions.SketchFunctions
          .bloomBits(col("ps"), BloomDecontamWords).as("bloom"))
      val train = docs.filter(col("doc_id") % BenchMod =!= 0)
      val probes = train.select(col("doc_id"), explode(col("g8")).as("g"))
        .select(col("doc_id") +: bloomProbes(col("g")).zipWithIndex
          .map { case (p, j) => p.as(s"p$j") }: _*)
        .join(broadcast(bloom)) // 1-row filter — the q61 scalar shape
      // a gram is maybe-present iff ALL K probe bits are set (the
      // SHARED bit-test — [[bloomHit]] — the streaming dual also runs)
      val hit = (0 until TextAnalysis.BloomK).map(j =>
        bloomHit(col("bloom"), col(s"p$j"))).reduce(_ && _)
      val perDoc = probes.groupBy("doc_id")
        .agg(sum(when(hit, 1L).otherwise(0L)).as("n_maybe0"))
      train.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_maybe0"), lit(0L)).as("n_maybe"))
        .withColumn("maybe_contaminated", col("n_maybe") > 0)
    }),

    // DSIR-selection: the resampling step q106's importance weights
    // exist for — rank the corpus by mean importance bits (how much
    // more target-like than corpus-like a document reads) and admit
    // documents in rank order until a quarter of the corpus token mass:
    // the "select a target-distribution-matched training subset" move
    // (Xie et al.), run through the SAME audited distributed prefix
    // selection as q58 ([[budgetedPrefixSelect]] — one implementation,
    // two ranking keys, no drift). Mean importance ∈ [−63, 63] by
    // construction (each per-token weight is a difference of two
    // floor-log2 values < 64), so it quantizes onto the same bounded
    // cell grid; the oracle is the single cumsum over (importance DESC,
    // doc_id).
    "q107_dsir_select" -> ((s, dir) => {
      val scored = TextAnalysis.queries("q106_dsir_weights")(s, dir)
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("n_tokens"),
          col("mean_importance_bits").as("rank"))
        .persist()
      val cell = least(lit(QualityCells - 1), greatest(lit(0),
        floor((lit(64.0) - col("rank")) / 128.0 * QualityCells).cast("int")))
      budgetedPrefixSelect(scored, cell, _ / 4)
        .withColumnRenamed("rank", "importance")
    }),

    // size-weighted priority sample — the weighted member of the
    // sampling family (q59/q66 sample uniformly by key hash, q101
    // balances clusters, q107 selects by score): k documents drawn with
    // probability ~ token count, deterministically. Integer priority =
    // seeded 60-bit hash `div` n_tokens (the exponential-race shape of
    // A-ES priority sampling with the float pow replaced by an
    // integer-exact division — both engines agree bit-for-bit), sample
    // = the k smallest (priority, doc_id). A big document divides its
    // hash by a bigger weight, so it races to the front ~ its mass.
    // TakeOrdered top-k — per-partition cuts, never a global sort.
    "q118_priority_sample" -> ((s, dir) => {
      scoredTokens(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"),
          portableHash60(col("doc_id").cast("string"), 13).as("h"))
        .select(col("doc_id"), col("n_tokens"),
          expr("h div n_tokens").as("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(PrioritySampleK)
    }),

    // token-budget selection billed in TRAINED-tokenizer tokens — q58's
    // ranking (quality) with q90's token unit as the mass: training
    // budgets are set in tokenizer tokens, not whitespace words, so the
    // production form of "keep the best docs up to N tokens" charges
    // each document its encoded length. With q93 (packing) and q103
    // (chunking) this completes the token-unit-agnostic proof for the
    // THIRD sequence operator: the SAME [[budgetedPrefixSelect]] runs
    // unchanged — only the (doc_id, n_tokens, rank) projection swaps
    // its mass column. The q90 encode stays vocabulary-first (each
    // distinct word pays the merge chain once); the stitch is one
    // doc_id equi-join.
    // calibration-fair budget selection — q58's "best docs up to half
    // the token mass" admits by RAW quality, which silently tilts the
    // budget toward whichever source's scorer runs hot (a crawl whose
    // boilerplate inflates stopword ratios outbids a cleaner source for
    // every slot). q124 admits by [[sourceCalibrated]]'s within-source
    // percentile instead: each source's k-th-best documents tie across
    // sources, so the budget drains strata evenly by RANK — the
    // cross-source fairness policy (quantile normalization) a mixture
    // owner applies before a global cut. The SAME audited
    // `budgetedPrefixSelect` runs unchanged over the calibrated rank
    // (the third ranking key after q58's quality and q107's DSIR
    // importance); global semantics = the oracle's one cumsum over
    // (cal_pm DESC, doc_id) ≤ half the corpus token mass. Calibrated
    // ties across sources are REAL here (every source's best doc scores
    // exactly 1e6), so the boundary tie group machinery earns its keep.
    "q124_calibrated_select" -> ((s, dir) => {
      val scored = sourceCalibrated(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"),
          col("cal_pm").cast("double").as("rank"))
        .persist()
      // cal_pm ∈ (0, 1e6]; rank DESC ⇒ cell 0 holds the top percentile
      val cell = least(lit(QualityCells - 1), greatest(lit(0),
        floor((lit(1000000.0) - col("rank")) / lit(1000000.0)
          * QualityCells).cast("int")))
      budgetedPrefixSelect(scored, cell, _ / 2)
        .select(col("doc_id"), col("n_tokens"),
          col("rank").cast("long").as("cal_pm"))
    }),

    "q113_trained_budget" -> ((s, dir) => {
      val q = scoredTokens(Tables(s, dir, "documents"))
        .select(col("doc_id"), col("quality").as("rank"))
      val bpe = TextAnalysis.queries("q90_bpe_encode")(s, dir)
        .filter(col("n_bpe_tokens") > 0)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
      val scored = q.join(bpe, Seq("doc_id"))
        .select("doc_id", "n_tokens", "rank").persist()
      val cell = least(lit(QualityCells - 1), greatest(lit(0),
        floor((lit(1.0) - col("rank")) * QualityCells).cast("int")))
      budgetedPrefixSelect(scored, cell, _ / 2)
        .withColumnRenamed("rank", "quality")
        .withColumnRenamed("n_tokens", "n_bpe_tokens")
    }),

    // token-budget selection: keep the highest-quality documents whose
    // running token total fits a budget (half the corpus's token mass,
    // derived from the data — nothing hand-tuned). Global semantics:
    // doc selected iff its cumulative n_tokens over (quality DESC,
    // doc_id) ≤ budget — exactly the oracle's single window cumsum.
    //
    // Shape: a DISTRIBUTED prefix sum — no unpartitioned window (= a
    // one-task sort of its whole input) anywhere in the plan:
    //   1. rows shuffle ONCE (map-side combined) into a per-quality
    //      histogram, width = distinct quality values ≪ rows;
    //   2. quality ∈ [0,1] quantizes onto a bounded grid of
    //      [[QualityCells]] integer cells (deterministic arithmetic, no
    //      sampled range bounds), and the cumsum runs per-CELL via a
    //      window PARTITIONED on the cell — parallel histogram slices;
    //   3. the ≤[[QualityCells]] per-cell totals collect to the driver,
    //      which prefix-sums them ([[exclusiveOffsets]]) and rejoins the
    //      offsets as ONE map literal — cum = in-cell cumsum + offset;
    //   4. whole quality groups pass/fail on their group-end cum; only
    //      the ONE boundary tie group pays a row-level cumsum, itself
    //      distributed over [[TieBuckets]] deterministic doc_id ranges
    //      with the same per-bucket-offset discipline — so even a corpus
    //      whose quality collapses to a single value (the adversarial
    //      tie case) never sorts rows in one task.
    // Driver reads are all bounded AND collapsed to three jobs: cell
    // totals (≤QualityCells rows — their sum IS the corpus token mass, so
    // no separate total-mass job), the boundary row (1 row — the
    // histogram aggregate carries each quality group's doc_id range, so
    // no separate tie id-range job), and the tie-bucket totals
    // (≤TieBuckets+1). `scored` persists for the selections (released by
    // the consumer's Caches.release hook); `hist` is construction-only
    // and released before return.
    "q58_token_budget" -> ((s, dir) => {
      val scored = scoredTokens(Tables(s, dir, "documents"))
        .withColumnRenamed("quality", "rank").persist()
      // quality ∈ [0,1]; rank DESC order ⇒ cell 0 holds the highest
      val cell = least(lit(QualityCells - 1), greatest(lit(0),
        floor((lit(1.0) - col("rank")) * QualityCells).cast("int")))
      budgetedPrefixSelect(scored, cell, _ / 2)
        .withColumnRenamed("rank", "quality")
    }),

    // mixture apportionment plan — the quota table a mixture build runs
    // against: largest-remainder apportionment of the corpus-derived
    // token budget across sources under the configured weights. All
    // semantics and the exactness argument in [[mixtureQuotas]].
    "q155_mixture_quotas" -> ((s, dir) => mixtureQuotas(s, dir)),

    // mixture selection — q155's quotas APPLIED: within each source,
    // the highest-quality documents whose running token total fits the
    // source's quota (global semantics = the oracle's per-source cumsum
    // over (quality DESC, doc_id) ≤ quota). The per-source form of
    // q58 under the SAME scoring; the selection machinery is
    // [[stratifiedPrefixSelect]] — the audited distributed prefix sum
    // with every stage partitioned by (stratum, cell/bucket), because
    // one window partitioned only by source would hand a
    // half-the-corpus stratum to a single task. The quota table is a
    // ≤|sources| driver read (value-space bounded).
    "q156_mixture_select" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // ONE scoring-chain materialization (r22): the persisted scored
      // relation feeds BOTH the quota apportionment's collect and the
      // stratified selection — the old shape executed scoredTokens +
      // the source join twice per call (once inside mixtureQuotas'
      // collect, again materializing this persist). Quota values are
      // identical by construction: same rows, same apportionment.
      val scored = scoredTokens(docs)
        .join(docs.select(col("doc_id"),
          coalesce(col("source"), lit(NullSrc)).as("source")), "doc_id")
        .select(col("source").as("strat"), col("doc_id"),
          col("n_tokens"), col("quality").as("rank"))
        .persist()
      val quotas: Map[String, Long] = mixtureQuotasOver(
          scored.select(col("strat").as("source"), col("n_tokens")))
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val cell = least(lit(QualityCells - 1), greatest(lit(0),
        floor((lit(1.0) - col("rank")) * QualityCells).cast("int")))
      stratifiedPrefixSelect(scored, cell, quotas)
        .select(col("strat").as("source"), col("doc_id"),
          col("n_tokens"), col("rank").as("quality"))
    }),

    // temperature-scaled mixture: downsample each SOURCE stratum to the
    // geometric mean of its size and the smallest stratum's size —
    // τ=0.5 multilingual-style sampling (UNIMAX/mT5 temperature
    // mixing), sitting exactly between proportional (keep n_s) and
    // equal (keep n_min): the smallest source is kept whole, a source
    // 100× larger is downsampled 10×. Deterministic cross-engine: the
    // only non-integer steps are exact long→double converts, ONE
    // rounding multiply, sqrt (IEEE-correctly-rounded in both engines —
    // unlike ln/exp, sqrt has a single legal result), and floor.
    // Admission is the q59 per-row hash-mod discipline; counts join
    // back broadcast, nothing corpus-sized moves.
    "q62_temperature_mix" -> ((s, dir) => {
      val counts = Tables(s, dir, "documents")
        .groupBy("source").agg(count(lit(1)).as("n_s"))
      val nMin = counts.agg(min("n_s").as("n_min"))
      val target = floor(sqrt(col("n_s").cast("double") *
        col("n_min").cast("double"))).cast("long")
      // 60-bit hash: the 32-bit portableHash saturates on a stratum
      // past 2^32 rows (hash % n_s == hash ⇒ rate target/2^32, not
      // target/n_s) — real at the design scale, and oracle parity
      // could never catch it (both engines would compute the same
      // saturated rate)
      Tables(s, dir, "documents").join(counts, "source")
        .crossJoin(broadcast(nMin)) // 1-row scalar, as in q61
        .filter(portableHash60(col("doc_id").cast("string"), 3) % col("n_s")
          < target)
        .select("doc_id", "source")
    }),

    // balanced stratified sample: downsample every language stratum to
    // the SMALLEST stratum's size (expected), membership by seeded hash —
    // deterministic, per-row, and rate-exact (kept iff hash mod n_l <
    // target, so P = target/n_l with integer arithmetic only). The
    // stratum counts are an adaptive count(*) aggregate joined back
    // (|langs| rows — broadcast); the target is a one-row driver read.
    "q59_stratified_sample" -> ((s, dir) => {
      val counts = Tables(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_l"))
      // min over zero groups is NULL: an empty corpus must yield an empty
      // sample (target 0 admits nothing), not a driver NPE
      val target = Option(counts.agg(min("n_l")).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
      Tables(s, dir, "documents").join(counts, "lang")
        .filter(stratifiedAdmit(col("doc_id"), col("n_l"), lit(target)))
        .select("doc_id", "lang")
    }),

    // sequence packing — the concat-and-chunk step that turns a curated
    // corpus into fixed-capacity training sequences (GPT-style: documents
    // concatenated in a deterministic order, the stream cut every
    // [[PackCapacity]] tokens): per chunk, how many documents START in
    // it, their token mass, how many straddle into the next chunk, and
    // the longest span — the packing-efficiency profile a data loader is
    // built against. A document's chunk is a pure function of the
    // corpus-order prefix sum, so the assignment is reproducible across
    // runs and repartitions. Plan shape at 100 TB: the q58 distributed
    // prefix-sum discipline over [[PackBuckets]] deterministic doc_id
    // ranges (per-bucket window cumsum + driver exclusive offsets over
    // the BOUNDED bucket totals — never a global single-partition sort),
    // then ONE map-side-combined aggregation on the chunk id. Driver
    // reads: the 1-row id range and the ≤[[PackBuckets]] bucket totals.
    "q72_sequence_pack" -> ((s, dir) => {
      // materialize (doc_id, n_tokens) once: it feeds the range read,
      // the bucket totals, and the final plan — unpersisted via the
      // consumer's Caches.release hook (CacheHygieneSpec)
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist()
      packProfile(packAssignments(toks, 0L))
    }),

    // length-bucketed padding batches — the OTHER packing mode beside
    // q72's concat-and-chunk: SFT-style training pads each batch to its
    // longest member instead of concatenating, so the assembler's job
    // is minimizing padding waste by batching like-length documents.
    // Docs bucket by ceil-power-of-two token length (integer-exact:
    // binary-digit-count, never libm log2), batch within a bucket in
    // doc_id order at [[BatchSeqs]] sequences per batch, and the card
    // reports per (len_bucket, batch): sequence count, the max (= the
    // padded width), total real tokens, and the padding waste per
    // mille. Plan: the within-bucket order uses the q58/q81 static
    // id-range decomposition — in-(len_bucket × id-range) partitioned
    // ROW_NUMBER + driver exclusive offsets over the bounded cell
    // counts (≤ ~20 length buckets × [[PackBuckets]] ranges), never a
    // per-bucket single-task sort; then ONE map-combined aggregate.
    "q171_length_batches" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .withColumn("bits",
          (length(conv(col("n_tokens"), 10, 2)) - 1).cast("int"))
        .withColumn("len_bucket", expr(
          "CAST(CASE WHEN n_tokens = shiftleft(1L, bits) THEN n_tokens" +
            " ELSE shiftleft(1L, bits + 1) END AS BIGINT)"))
        .persist() // feeds the range read, cell counts, and the plan
      val rng = toks.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
        .collect().headOption.filter(!_.isNullAt(0))
      rng match {
        case None =>
          toks.select(col("len_bucket"), lit(0L).as("batch_id"),
            lit(0L).as("n_seqs"), lit(0L).as("max_tokens"),
            lit(0L).as("total_tokens"), lit(0L).as("pad_pm")).limit(0)
        case Some(r) =>
          val lo = r.getAs[Long]("lo")
          val bw = math.max(1L, (r.getAs[Long]("hi") - lo) / PackBuckets + 1)
          val b = toks.withColumn("bkt",
            expr(s"CAST((doc_id - ${lo}L) div ${bw}L AS INT)"))
          // bounded driver read: per-(len_bucket, id-range) counts;
          // offsets cumulate ranges WITHIN a length bucket (numeric
          // composite key — the stratifiedPrefixSelect '#'-collision
          // lesson applied preemptively)
          val cells = b.groupBy("len_bucket", "bkt")
            .agg(count(lit(1)).as("n")).collect()
            .map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSeq
          val off: Map[Long, Long] = cells.groupBy(_._1).flatMap {
            case (lb, cs) =>
              exclusiveOffsets(cs.map(c => (c._2, c._3)))
                .map { case (bkt, o) => (lb * (PackBuckets + 1) + bkt, o) }
          }
          val w = Window.partitionBy("len_bucket", "bkt").orderBy("doc_id")
          b.withColumn("rn", row_number().over(w).cast("long"))
            .withColumn("pos", col("rn") + element_at(typedLit(off),
              col("len_bucket") * (PackBuckets + 1) + col("bkt")))
            .withColumn("batch_id", expr(s"(pos - 1L) div ${BatchSeqs}L"))
            .groupBy("len_bucket", "batch_id")
            .agg(count(lit(1)).as("n_seqs"),
              max("n_tokens").as("max_tokens"),
              sum("n_tokens").as("total_tokens"))
            // n_seqs·max ≥ total ≥ 1, so the div is safe and the share
            // non-negative; floor ≡ truncate on both engines
            .withColumn("pad_pm", expr(
              "((n_seqs * max_tokens - total_tokens) * 1000)" +
                " div (n_seqs * max_tokens)"))
      }
    }),

    // chunk-level curriculum — the loader-facing composition of the
    // pack manifest and the quality gate: training schedulers order
    // CHUNKS (the unit a loader fetches), not documents, so the
    // document-level curriculum (q85) needs this final projection. Per
    // chunk: span-token mass from gate-passing docs as an integer
    // per-mille share (the q45 gate — ONE definition, referenced), and
    // the global easy-first position (pass_pm DESC, chunk_id). Plan
    // shape: the shared manifest explode + ONE map-combined chunk
    // aggregate; the GLOBAL rank rides the q85 cell decomposition with
    // pass_pm ITSELF as the cell (≤ 1001 values — a bounded driver
    // read of the cell counts + in-cell partitioned ROW_NUMBER), never
    // a corpus-wide single-partition sort.
    "q169_chunk_curriculum" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist() // released by the consumer's Caches.release hook
      val lab = graft.functions.QualityRules.annotate(
          Tables(s, dir, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("pass"))
      val ch = manifestRows(packAssignments(toks, 0L))
        .join(lab, Seq("doc_id"))
        .groupBy("chunk_id").agg(
          count(lit(1)).as("n_docs"),
          sum("n_span_tokens").as("chunk_tokens"),
          sum(when(col("pass"), col("n_span_tokens")).otherwise(0L))
            .as("pass_tokens"))
        // chunks exist only where spans do, so chunk_tokens ≥ 1 and the
        // ANSI div is safe; non-negative operands, floor ≡ truncate
        .withColumn("pass_pm", expr("(pass_tokens * 1000) div chunk_tokens"))
        .persist() // feeds the cell counts AND the final plan
      val cells = ch.groupBy("pass_pm").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toSeq
      if (cells.isEmpty)
        ch.select(col("chunk_id"), col("n_docs"), col("chunk_tokens"),
          col("pass_tokens"), col("pass_pm"),
          lit(0L).as("curriculum_pos")).limit(0)
      else {
        // easy-first: offsets cumulate over cells DESCENDING in pass_pm
        // (negate the key so the shared ascending-offsets helper walks
        // the intended direction)
        val off = exclusiveOffsets(cells.map { case (c, n) => (-c, n) })
          .map { case (nc, o) => (-nc, o) }
        val w = Window.partitionBy("pass_pm").orderBy("chunk_id")
        ch.withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("curriculum_pos",
            col("rn") + element_at(typedLit(off), col("pass_pm").cast("int")))
          .select("chunk_id", "n_docs", "chunk_tokens", "pass_tokens",
            "pass_pm", "curriculum_pos")
      }
    }),

    // source × split dataset-card matrix — the table a data statement
    // publishes (q80 profiles sources, q112 audits the pipeline funnel;
    // this is the final composition card): per (source, q56 split),
    // document count and token mass. Shared split Column + the shared
    // whitespace tokenizer (null text → 0 tokens, still counted as a
    // document — cards report every row); ONE map-combined aggregate,
    // ≤ |sources|·3 rows.
    "q120_source_split_card" -> ((s, dir) => {
      Tables.wide(s, dir, "documents")
        .select(col("source"),
          splitCol(bucketCol(col("doc_id"))).as("split"),
          coalesce(size(tokens(col("text"))).cast("long"), lit(0L))
            .as("n_tokens"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
    }),

    // pack MANIFEST — the artifact a dataloader actually consumes:
    // q72's profile says how full each chunk is; the manifest says, for
    // every (chunk, document) incidence, WHERE in the chunk the doc's
    // token span sits (chunk_offset), where in the DOC it resumes
    // (doc_offset — nonzero for straddler continuations), and how many
    // tokens the span carries. A doc spanning chunks yields one row per
    // touched chunk (a per-doc-bounded sequence explode over the shared
    // [[packAssignments]] arithmetic — same cum, same chunk ids, so
    // manifest and profile cannot disagree). Spans tile each chunk
    // exactly (Σ n_span = 512 for every full chunk — spec-pinned).
    "q119_pack_manifest" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist() // released by the consumer's Caches.release hook
      manifestRows(packAssignments(toks, 0L))
    }),

    // balanced output-shard plan — how a writer deals the packed corpus
    // across [[ShardCount]] parallel output files: chunks (q72's
    // uniform [[PackCapacity]]-token units) go round-robin,
    // shard = chunk_id mod K. Dealing CHUNKS instead of documents is
    // what makes the balance a property of the construction, not of the
    // data: every shard receives ⌈C/K⌉ or ⌊C/K⌋ full chunks, so shard
    // token masses differ by at most one chunk's capacity even under
    // adversarial document-length skew (a doc-level deal inherits the
    // corpus's length distribution; a greedy bin-pack is inherently
    // sequential). The report a shard writer plans from: per shard, the
    // chunk count, the distinct documents it must fetch, and the exact
    // token mass. Plan shape: the shared [[packAssignments]] prefix sum
    // + the per-doc-bounded [[manifestRows]] explode, then ONE
    // map-combined aggregate to ≤ K rows (the distinct-counts expand on
    // the manifest relation, already doc×chunk-bounded).
    "q123_shard_plan" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist() // released by the consumer's Caches.release hook
      manifestRows(packAssignments(toks, 0L))
        .withColumn("shard", col("chunk_id") % ShardCount)
        .groupBy("shard")
        .agg(countDistinct("chunk_id").as("n_chunks"),
          countDistinct("doc_id").as("n_docs"),
          sum("n_span_tokens").as("token_mass"))
    }),

    // the SHUFFLED-order manifest — the one a training loader actually
    // reads (epochs consume q81's shuffled stream, so the chunks it
    // slices are q82's): the same [[manifestRows]] tail over the
    // position-keyed assignment, then ONE equi-join back through the
    // position map so every row carries the REAL doc_id a loader must
    // fetch (positions are an order key, not an address).
    "q121_shuffled_manifest" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      val posMap = queries("q81_epoch_shuffle")(s, dir)
        .join(toks, "doc_id")
        .persist() // feeds the assignment AND the id re-key
      val shuffled = posMap.select(col("pos").as("doc_id"), col("n_tokens"))
      manifestRows(packAssignments(shuffled, 0L))
        .withColumnRenamed("doc_id", "pos")
        .join(posMap.select(col("pos"), col("doc_id")), "pos")
        .select("chunk_id", "doc_id", "pos", "chunk_offset", "doc_offset",
          "n_span_tokens")
    }),

    // fixed-K uniform sample per stratum — the fourth member of the
    // sampling family and the one an EVAL-SET builder wants: exactly
    // [[StratumK]] docs from every source (q59 rate-matches strata to
    // the smallest, q62 tempers rates, q118 weights globally by size —
    // none delivers a fixed per-stratum count), uniform because the
    // rank key is the seeded 60-bit hash (reproducible across runs,
    // repartitions, and corpus growth ONLY adds candidates — no rand()).
    // Same scale shape as q130: rank ≤ K under a source-partitioned
    // window plans as WindowGroupLimit, so each input partition keeps a
    // running K per source before the exchange — a fixed-K sample of a
    // 100 TB stratum shuffles K rows per partition, never the stratum.
    "q133_stratum_sample_k" -> ((s, dir) => {
      val h = portableHash60(col("doc_id").cast("string"), 5)
      val w = Window.partitionBy("source").orderBy("h", "doc_id")
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), h.as("h"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= StratumK)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"))
    }),

    // per-source exemplars — the "show me your best documents" rows a
    // dataset card publishes per stratum ([[ExemplarK]] highest-quality
    // docs, ties by doc_id): the human-inspection counterpart of q80's
    // aggregate profile (numbers say a source LOOKS fine; exemplars are
    // what a reviewer actually reads). Scale shape: rank ≤ K under a
    // source-partitioned window plans as WindowGroupLimit — each input
    // partition keeps a running top-K per source BEFORE the exchange,
    // so the shuffle carries ≤ K rows per (partition, source), never
    // the corpus (the per-group TakeOrdered; a global sort or a
    // full-corpus window would both be scale bugs here — pinned).
    "q130_source_exemplars" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val w = Window.partitionBy("source")
        .orderBy(desc("quality"), asc("doc_id"))
      scoredTokens(docs)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= ExemplarK)
        .select(col("source"), col("rk").cast("long").as("rk"),
          col("doc_id"), col("n_tokens"), col("quality"))
    }),

    // chunk source-mixing card — how many SOURCES each packed training
    // sequence interleaves (q119's manifest × provenance): packing
    // concatenates corpus-order neighbors, so a chunk can splice
    // documents from different crawls into one context window — the
    // in-context mixing that attention-contamination analyses audit and
    // that q82's shuffle deliberately randomizes. Report = the
    // histogram of chunks by distinct-source count (≤ |sources| rows):
    // the shared manifest explode, one doc_id equi-join to provenance,
    // a per-chunk distinct count, then the q137 double-agg shape.
    "q147_chunk_mixing" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist() // released by the consumer's Caches.release hook
      manifestRows(packAssignments(toks, 0L))
        .join(Tables(s, dir, "documents").select(col("doc_id"), col("source")),
          Seq("doc_id"))
        .groupBy("chunk_id")
        .agg(countDistinct("source").as("n_sources"))
        .groupBy("n_sources")
        .agg(count(lit(1)).as("n_chunks"))
    }),

    // corpus shape card — the joint (length-octave × quality-decile)
    // histogram: where the corpus mass actually sits in the 2-D space
    // every curation threshold cuts through (a q58 bar or a q45 rule
    // moves along ONE axis; this shows what each cut would sweep away
    // on the other). Axes are deterministic bounded grids: length in
    // log2 octaves (the q61/q88 integer bit-length — no float log) and
    // quality in deciles (per-row double, floored identically on both
    // engines); output ≤ 64·10 cells via ONE map-combined aggregate.
    "q146_length_quality_grid" -> ((s, dir) => {
      scoredTokens(Tables(s, dir, "documents"))
        .select(
          (length(conv(col("n_tokens"), 10, 2)) - 1).cast("long")
            .as("len_log2"),
          least(lit(9L), floor(col("quality") * 10).cast("long"))
            .as("quality_decile"))
        .groupBy("len_log2", "quality_decile")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // soft-dedup-discounted budget selection — q58 × q127, the budget a
    // pipeline runs when duplicates are DOWN-WEIGHTED rather than
    // dropped: each document's budget cost is its token mass scaled by
    // its q127 sampling weight (effective = n_tokens·weight_ppm div
    // 1e6 — a k-duplicated doc costs ~1/k, so admitting a whole
    // near-dup cluster spends one document's budget, which is exactly
    // the policy's point), admission by quality against half the
    // EFFECTIVE corpus mass. The SAME audited `budgetedPrefixSelect`
    // runs unchanged — the fourth ranking/mass combination on one
    // implementation (q58 raw, q107 DSIR, q113 trained-token, q124
    // calibrated); zero-cost rows (small docs in huge clusters) admit
    // free, exactly as the oracle's cumsum treats them.
    "q142_discounted_budget" -> ((s, dir) => {
      val weights = Dedup.queries("q127_soft_dedup")(s, dir)
        .select(col("doc_id"), col("weight_ppm"))
      val scored = scoredTokens(Tables(s, dir, "documents"))
        .join(weights, Seq("doc_id"))
        .select(col("doc_id"),
          expr("CAST((n_tokens * weight_ppm) div 1000000 AS BIGINT)")
            .as("n_tokens"),
          col("quality").as("rank"))
        .persist()
      val cell = least(lit(QualityCells - 1), greatest(lit(0),
        floor((lit(1.0) - col("rank")) * QualityCells).cast("int")))
      budgetedPrefixSelect(scored, cell, _ / 2)
        .withColumnRenamed("rank", "quality")
        .withColumnRenamed("n_tokens", "eff_tokens")
    }),

    // contamination attribution — the forensics behind q57's verdicts:
    // q57 says a train document is contaminated; this says BY WHICH
    // benchmark document (the argmax bench doc by shared distinct
    // 8-gram count, ties to the lowest id). The read an eval owner does
    // before excising content: is one bench item leaking everywhere, or
    // is every flag a different item? The same [[gramStage]] chain and
    // the same gram-keyed equi-join as q57 (work ∝ shared grams, never
    // train×bench), ONE map-combined (train, bench) count, and the
    // rank-1 cut under a train-doc-partitioned window — WindowGroupLimit
    // at scale, never a global sort. Rows only for contaminated docs
    // (q57's flagged set, exactly).
    "q139_contam_attribution" -> ((s, dir) => {
      val grams = gramStage(Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")), Seq("doc_id")).persist()
      val bench = grams.filter(col("doc_id") % BenchMod === 0)
        .select(col("doc_id").as("bench_doc"), explode(col("g8")).as("g"))
      val train = grams.filter(col("doc_id") % BenchMod =!= 0)
        .select(col("doc_id"), explode(col("g8")).as("g"))
      val w = Window.partitionBy("doc_id")
        .orderBy(desc("n_shared"), asc("bench_doc"))
      train.join(bench, Seq("g"))
        .groupBy("doc_id", "bench_doc")
        .agg(count(lit(1)).as("n_shared"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("doc_id", "bench_doc", "n_shared")
    }),

    // manifest integrity checksum — the one-row receipt a loader fleet
    // verifies before an epoch starts: n_rows plus an ORDER-INDEPENDENT
    // modular sum of per-row 60-bit hashes over the q121 manifest (any
    // shard, any partition order, any fetch schedule folds to the same
    // value — a positional checksum would force a global sort to verify).
    // A manifest corrupted in transit, truncated by a partial write, or
    // regenerated under a drifted seed changes the checksum; the planner
    // publishes this row beside the manifest and every consumer re-folds
    // it locally. Accumulation in decimal(38,0) (exact to ~10^20 rows),
    // ONE map-combined aggregate past the shared manifest build; the
    // cross-engine match of the checksum itself doubles as a row-exact
    // equality proof of the two engines' manifests.
    "q129_manifest_checksum" -> ((s, dir) => {
      val row = concat_ws("#", col("chunk_id"), col("doc_id"), col("pos"),
        col("chunk_offset"), col("doc_offset"), col("n_span_tokens"))
      queries("q121_shuffled_manifest")(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          (sum(portableHash60(row, ChecksumSeed).cast("decimal(38,0)"))
            % lit(ChecksumMod)).cast("long").as("checksum"))
    }),

    // deterministic epoch shuffle — the training-order primitive: every
    // document gets a stable pseudo-random POSITION (rank of its seeded
    // 60-bit hash), so a data loader reads the corpus in a shuffled
    // order that is reproducible across runs, repartitions, and
    // restarts, and changing the seed is a fresh epoch permutation.
    // rand() cannot do this (irreproducible); a global ORDER BY hash is
    // a single-task sort. Plan shape: the q72 prefix-sum discipline
    // keyed on the HASH — the hash space [0, 2^60) splits into
    // [[PackBuckets]] STATIC ranges (h div 2^54, a constant divide: no
    // id-range driver read at all), per-bucket counts collect (≤64
    // rows), in-bucket ROW_NUMBER under a partitioned window, position
    // = in-bucket rank + driver exclusive offset. ONE bounded driver
    // read; composes with q72 (pack the corpus in shuffled order by
    // feeding positions as the pack key).
    "q81_epoch_shuffle" -> ((s, dir) =>
      shufflePositions(Tables(s, dir, "documents").select(col("doc_id")))),

    // epoch-shuffled packing — q81 ∘ q72, the actual training-data
    // layout step: concatenate the corpus in the epoch's shuffled order
    // and cut every [[PackCapacity]] tokens (packing in CORPUS order
    // correlates adjacent training sequences with ingest order; packing
    // the shuffled order is what a data loader ships). The pack key is
    // q81's POSITION — dense pseudo-random ranks — so the composed
    // operator inherits both pinned plan shapes: q81's static-range
    // bucketed rank and q72's bucketed prefix sum, never a
    // single-partition window, driver reads still the bounded bucket
    // totals. A different [[ShuffleSeed]] is a different (reproducible)
    // epoch layout over the same chunk arithmetic.
    "q82_shuffled_pack" -> ((s, dir) => {
      val toks = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      // positions re-key the pack: pos becomes the doc_id-shaped order
      // key packAssignments buckets and prefix-sums over (its id-range
      // bucketing is uniform by construction on dense ranks)
      val shuffled = queries("q81_epoch_shuffle")(s, dir)
        .join(toks, "doc_id")
        .select(col("pos").as("doc_id"), col("n_tokens"))
        .persist()
      packProfile(packAssignments(shuffled, 0L))
    }),

    // trained-token packing — q90 ∘ q72: identical pack arithmetic, but
    // the unit is the token count under q87's LEARNED merge table
    // instead of whitespace tokens — the unit a data loader actually
    // bills sequences in once a tokenizer is trained. The token source
    // is the ONLY difference (the shared packAssignments/packProfile
    // pair is token-unit-agnostic by construction), so the composed
    // operator inherits q72's pinned plan shape: bucketed prefix sum
    // over static id ranges, bounded driver reads, one map-side-combined
    // chunk aggregation — plus q90's vocabulary-side encode (each
    // distinct word pays the replace chain once).
    "q93_pack_trained" -> ((s, dir) => {
      val toks = graft.queries.TextAnalysis.queries("q90_bpe_encode")(s, dir)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"))
        .filter(col("n_tokens") > 0)
        .persist()
      packProfile(packAssignments(toks, 0L))
    }),

    // the end-to-end curation composite — the publish path a training
    // corpus actually takes, as ONE operator over the SHARED stage
    // definitions (none can drift from its standalone twin): q36's prep
    // stage verbatim (sha-dedup keeping each group's min id, then the
    // lang/quality-score gate — prepScore), q57's gram machinery
    // against the modulus eval set (whose docs never train), the q56
    // train bucket, then the survivor set is epoch-shuffled (shared
    // shufflePositions) and packed (shared packAssignments /
    // packProfile) — q82's composition over the curated corpus. Plan:
    // every filter is a key equi-join (semi/anti) or a narrow
    // predicate; the only windows are the sha-partitioned dedup rank,
    // the bucketed shuffle rank, and the bucketed prefix sum; driver
    // reads stay the bounded bucket totals.
    "q97_curation_pipeline" -> ((s, dir) => {
      val base = Tables.wide(s, dir, "documents")
      val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
      val deduped = base.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("doc_id", "text")
      val prepped = TextAnalysis.prepScore(deduped)
      val grams = gramStage(base, Seq("doc_id")).persist()
      val benchGrams = grams.filter(col("doc_id") % BenchMod === 0)
        .select(explode(col("g8")).as("g")).distinct()
      val contaminated = grams.filter(col("doc_id") % BenchMod =!= 0)
        .select(col("doc_id"), explode(col("g8")).as("g"))
        .join(benchGrams, Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val survivors = prepped
        .filter(bucketCol(col("doc_id")) < TrainPct)
        .filter(col("doc_id") % BenchMod =!= 0) // eval docs never train
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_tokens"))
        // two construction actions consume this chain (shufflePositions'
        // bucket counts, then the shuffled join under packAssignments'
        // id-range read); without the persist the dedup-window +
        // prepScore subtree re-executes once PER ACTION — exchange reuse
        // never spans driver actions, only persisted data does (r21)
        .persist()
      val shuffled = shufflePositions(survivors.select(col("doc_id")))
        .join(survivors, Seq("doc_id"))
        .select(col("pos").as("doc_id"), col("n_tokens"))
        .persist()
      packProfile(packAssignments(shuffled, 0L))
    }),

    // per-source pipeline yield funnel — the dataset-card stat a
    // curation run publishes beside q80's profile: of each source's
    // documents, how many survive each q97 stage (exact dedup → quality
    // gate → bench/contamination scrub → train split). Every stage is
    // the SHARED definition (q97's dedup window, [[TextAnalysis
    // .prepScore]], [[gramStage]]/[[BenchMod]] decontamination, q56's
    // split Column), so the funnel audits THE pipeline, not a
    // reimplementation that could drift. Stage flags assemble via
    // doc_id equi-joins against two-column projections; the report is
    // ONE map-combined aggregate, |sources| rows out.
    "q112_source_yield" -> ((s, dir) => {
      val base = Tables.wide(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val w = Window.partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
      val dd = base.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("doc_id", "text")
      val pp = TextAnalysis.prepScore(dd).select("doc_id")
      val grams = gramStage(base.select(col("doc_id"), col("text")),
        Seq("doc_id")).persist() // released by the consumer's hook
      val benchGrams = grams.filter(col("doc_id") % BenchMod === 0)
        .select(explode(col("g8")).as("g")).distinct()
      val contam = grams.filter(col("doc_id") % BenchMod =!= 0)
        .select(col("doc_id"), explode(col("g8")).as("g"))
        .join(benchGrams, Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val clean = col("fq") === 1 && col("doc_id") % BenchMod =!= 0 &&
        col("fc").isNull
      base.select(col("doc_id"), col("source"))
        .join(dd.select(col("doc_id"), lit(1).as("fd")), Seq("doc_id"), "left")
        .join(pp.select(col("doc_id"), lit(1).as("fq")), Seq("doc_id"), "left")
        .join(contam.select(col("doc_id"), lit(1).as("fc")), Seq("doc_id"), "left")
        .select(col("source"),
          coalesce(col("fd"), lit(0)).as("fd"),
          coalesce(col("fq"), lit(0)).as("fq"),
          when(clean, 1).otherwise(0).as("fl"),
          when(clean && bucketCol(col("doc_id")) < TrainPct, 1)
            .otherwise(0).as("ft"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_raw"),
          sum("fd").as("n_dedup"), sum("fq").as("n_quality"),
          sum("fl").as("n_clean"), sum("ft").as("n_train"))
    }),

    // cross-split leakage audit — the NEAR-dup counterpart of q57's
    // exact 8-gram decontamination: how many q27 near-dup pairs straddle
    // a q56 split boundary (a test document with a train near-duplicate
    // inflates eval scores even when no 8-gram is shared verbatim).
    // Per ordered (split_a, split_b) boundary, the pair count — the
    // audit a curation pipeline runs BEFORE publishing a split. Both
    // inputs are the shared definitions (q27's pair semantics, q56's
    // key-pure split Column), so this can never drift from the operators
    // it audits; the joins are doc_id equi-joins against a two-column
    // projection, and the final aggregate is ≤ |splits|² rows.
    "q79_split_leakage" -> ((s, dir) => {
      val split = Tables(s, dir, "documents")
        .select(col("doc_id"), splitCol(bucketCol(col("doc_id"))).as("split"))
      Similarity.queries("q27_simhash_pairs")(s, dir)
        .select("doc_a", "doc_b")
        .join(split.select(col("doc_id").as("doc_a"),
          col("split").as("split_a")), "doc_a")
        .join(split.select(col("doc_id").as("doc_b"),
          col("split").as("split_b")), "doc_b")
        .filter(col("split_a") =!= col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // cross-source near-dup matrix — q79's recomposition at SOURCE
    // granularity: how many q27 near-dup pairs straddle each source
    // boundary. The provenance audit behind mixture decisions (two
    // crawls sharing near-dup content shouldn't both be up-weighted as
    // independent), giving exact pair counts where q86's minhash gives
    // a sketch estimate. Shared definitions only (q27's pair semantics
    // verbatim), doc_id equi-joins against a two-column projection, the
    // pair normalized (least/greatest) so each unordered source pair
    // accumulates one row; output ≤ |sources|² rows.
    "q89_source_leakage" -> ((s, dir) => {
      val src = Tables(s, dir, "documents").select(col("doc_id"), col("source"))
      Similarity.queries("q27_simhash_pairs")(s, dir)
        .select("doc_a", "doc_b")
        .join(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb")), "doc_b")
        .filter(col("sa") =!= col("sb"))
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // per-source corpus profile — the dataset-card numbers a curation
    // run publishes per stratum: document count, exact token mass, how
    // many documents clear the quality bar, and the quality envelope.
    // ONE shuffle on the source key over per-row metrics; every output
    // column is either integer-exact (counts, long sums) or
    // order-independent (min/max) — a float MEAN would be an unordered
    // double sum and could never hash-match cross-engine, so the profile
    // deliberately reports threshold counts and envelopes instead.
    "q80_source_profile" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val scored = scoredTokens(docs)
      docs.select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("n_tokens"), lit(0L))).as("n_tokens"),
          sum(when(col("quality") >= 0.5, 1L).otherwise(0L))
            .as("n_quality_ok"),
          min("quality").as("min_quality"),
          max("quality").as("max_quality"))
    }),

    // curriculum ordering — every tokenizable document's stable training
    // position under easy-first order (quality DESC, doc_id): the
    // counterpart of q81's uniform shuffle when the loader wants a
    // difficulty ramp instead of a permutation; like q81 the position is
    // reproducible across runs/repartitions and composes with q72
    // (positions as the pack key = curriculum-ordered sequences). Plan
    // shape: the SAME bucketed-rank discipline, keyed on q58's
    // deterministic [[QualityCells]] quality-grid cell — quality is
    // monotone-descending across ascending cells, so cells are a prefix
    // decomposition of the global order: in-cell ROW_NUMBER under a
    // PARTITIONED window + driver exclusive offsets over the ≤64 cell
    // counts. ONE bounded driver read, never a single-task sort.
    "q85_curriculum_order" -> ((s, dir) =>
      curriculumPositions(
        scoredTokens(Tables(s, dir, "documents")).persist(), 0L)._1))

  /** q85's position builder, shared with the streaming per-epoch dual
    * ([[graft.streaming.DocStream.processCurriculumBatch]], which feeds
    * the running position cursor as `offset`): easy-first (quality DESC,
    * doc_id) positions via the bucketed-rank discipline keyed on the
    * [[QualityCells]] quality-grid cell — quality is monotone-descending
    * across ascending cells, so cells are a prefix decomposition of the
    * global order; in-cell partitioned ROW_NUMBER + driver exclusive
    * offsets over the ≤[[QualityCells]] cell counts (ONE bounded driver
    * read). Returns (positions DataFrame offset by `offset`, ranked row
    * count — the cursor advance).
    */
  /** q124's per-source calibrated quality: each tokenizable document's
    * within-source rank under (quality DESC, doc_id), rescaled to an
    * integer per-million of its source — cal_pm = ((n_s − r)·1e6) div
    * n_s ∈ (0, 1e6], so a document's score states "I beat this fraction
    * of MY stratum" and scores compare across sources whose raw quality
    * distributions are shifted against each other. Plan shape: the q85
    * bucketed-rank discipline PER STRATUM — rank keyed on
    * (source, quality-grid cell), in-cell partitioned ROW_NUMBER +
    * driver exclusive offsets over the per-(source, cell) counts (ONE
    * bounded driver read, ≤ |sources|·[[QualityCells]] rows — strata
    * are a bounded dimension, the corpus is not), never a per-source
    * single-task sort. Returns (doc_id, n_tokens, cal_pm); `base`
    * persists for the two passes and is released by the consumer's
    * Caches.release hook.
    */
  private[graft] def sourceCalibrated(docs: DataFrame): DataFrame = {
    val cell = least(lit(QualityCells - 1), greatest(lit(0),
      floor((lit(1.0) - col("quality")) * QualityCells).cast("int")))
    val base = scoredTokens(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .withColumn("cell", cell).persist()
    val totals = base.groupBy("source", "cell").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    if (totals.isEmpty)
      base.select(col("doc_id"), col("n_tokens"), lit(0L).as("cal_pm"))
        .limit(0)
    else {
      // per-source exclusive offsets over the cell decomposition, keyed
      // "source#cell" for the one map-literal rejoin; source sizes ride
      // the same collected rows — no extra job
      val off: Map[String, Long] = totals.groupBy(_._1).flatMap {
        case (src, cs) =>
          exclusiveOffsets(cs.map(c => c._2 -> c._3))
            .map { case (cellId, o) => s"$src#$cellId" -> o }
      }
      val nS: Map[String, Long] = totals.groupBy(_._1)
        .map { case (src, cs) => src -> cs.map(_._3).sum }
      val w = Window.partitionBy("source", "cell")
        .orderBy(desc("quality"), asc("doc_id"))
      base.select(col("doc_id"), col("n_tokens"), col("source"), col("cell"),
          (row_number().over(w) - 1).cast("long").as("r0"))
        .withColumn("r", col("r0") + element_at(typedLit(off),
          concat(col("source"), lit("#"), col("cell").cast("string"))))
        .withColumn("n_s", element_at(typedLit(nS), col("source")))
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST(((n_s - r) * 1000000) div n_s AS BIGINT)").as("cal_pm"))
    }
  }

  private[graft] def curriculumPositions(scored: DataFrame, offset: Long)
      : (DataFrame, Long) = {
    val cell = least(lit(QualityCells - 1), greatest(lit(0),
      floor((lit(1.0) - col("quality")) * QualityCells).cast("int")))
    val docs = scored.withColumn("cell", cell)
    val totals = docs.groupBy("cell").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSeq
    val off = exclusiveOffsets(totals)
    if (off.isEmpty)
      (docs.select(col("doc_id"), col("quality"), lit(0L).as("pos")).limit(0), 0L)
    else {
      val w = Window.partitionBy("cell").orderBy(desc("quality"), asc("doc_id"))
      val df = docs.select(col("doc_id"), col("quality"), col("cell"),
          (row_number().over(w) - 1).cast("long").as("r"))
        .select(col("doc_id"), col("quality"),
          (col("r") + element_at(typedLit(off), col("cell")) + lit(offset))
            .as("pos"))
      (df, totals.map(_._2).sum)
    }
  }

  /** Shared per-document chunk assignment behind q72 and its streaming
    * dual ([[graft.streaming.PackStream]]) — one definition of the
    * packing arithmetic, so the batch profile and the stream's cursor
    * continuation cannot drift. `toks` is a pre-materialized
    * (doc_id, n_tokens) relation (n_tokens > 0); `offset` is the token
    * cursor already consumed BEFORE these documents (0 for the batch
    * corpus; the committed cursor for a micro-batch). Returns
    * (doc_id, n_tokens, chunk_id, last_chunk) via the q58 distributed
    * prefix-sum discipline over [[PackBuckets]] deterministic doc_id
    * ranges; driver reads are the 1-row id range and the ≤PackBuckets
    * bucket totals.
    */
  /** q81's dense pseudo-random positions over an arbitrary (doc_id)
    * relation — rank of the seeded 60-bit hash, derived with the q72
    * prefix-sum discipline keyed on the HASH: the hash space [0, 2^60)
    * splits into [[PackBuckets]] STATIC ranges (h div 2^54, a constant
    * divide — no id-range driver read at all), per-bucket counts collect
    * (≤64 rows), in-bucket ROW_NUMBER under a partitioned window,
    * position = in-bucket rank + driver exclusive offset. ONE bounded
    * driver read; shared by q81 (full corpus) and q97 (the curated
    * survivor set), so the shuffle order cannot drift between them.
    * Persists its hashed projection; the consumer's Caches.release hook
    * frees it.
    */
  private[graft] def shufflePositions(docs0: DataFrame): DataFrame = {
    val h = portableHash60(col("doc_id").cast("string"), ShuffleSeed)
    val docs = docs0
      .select(col("doc_id"), h.as("h"))
      // 2^60 / PackBuckets(64) = 2^54 — static ranges, uniform under
      // the hash, no data-dependent bounds needed
      .withColumn("bkt", expr("CAST(h div 18014398509481984L AS INT)"))
      .persist()
    val off = exclusiveOffsets(
      docs.groupBy("bkt").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toSeq)
    if (off.isEmpty)
      docs.select(col("doc_id"), lit(0L).as("pos")).limit(0)
    else {
      val w = Window.partitionBy("bkt").orderBy("h", "doc_id")
      docs.select(col("doc_id"), col("bkt"),
          (row_number().over(w) - 1).cast("long").as("r"))
        .select(col("doc_id"),
          (col("r") + element_at(typedLit(off), col("bkt"))).as("pos"))
    }
  }

  private[graft] def packAssignments(toks: DataFrame, offset: Long): DataFrame = {
    val rng = toks.agg(min("doc_id").as("lo"), max("doc_id").as("hi"))
      .collect().headOption.filter(!_.isNullAt(0))
    rng match {
      case None =>
        // empty/untokenizable input: a defined empty assignment
        toks.select(col("doc_id"), col("n_tokens"),
          lit(0L).as("chunk_id"), lit(0L).as("last_chunk"),
          lit(0L).as("cum")).limit(0)
      case Some(r) =>
        val lo = r.getAs[Long]("lo")
        // integer `div` bucketing over the id range (exact at any id
        // magnitude — the q58 tie-split discipline)
        val bw = math.max(1L, (r.getAs[Long]("hi") - lo) / PackBuckets + 1)
        val b = toks.withColumn("bkt",
          expr(s"CAST((doc_id - ${lo}L) div ${bw}L AS INT)"))
        val off = exclusiveOffsets(
          b.groupBy("bkt").agg(sum("n_tokens").as("bt")).collect()
            .map(r => r.getInt(0) -> r.getLong(1)).toSeq)
        val w = Window.partitionBy("bkt").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // off holds every bucket b itself produced — the ANSI-mode
        // element_at cannot miss (q58's cannot-miss argument)
        val cum = b.withColumn("cum",
          sum("n_tokens").over(w) + element_at(typedLit(off), col("bkt"))
            + lit(offset))
        // first/last chunk of each doc's [cum-n, cum) token interval;
        // all values non-negative, so `div` ≡ floor division in both
        // engines. `cum` rides along for the manifest (q119) — profile
        // consumers aggregate named columns and ignore it.
        cum.select(col("doc_id"), col("n_tokens"),
          expr(s"(cum - n_tokens) div ${PackCapacity}L").as("chunk_id"),
          expr(s"(cum - 1L) div ${PackCapacity}L").as("last_chunk"),
          col("cum"))
    }
  }

  /** The manifest tail over [[packAssignments]] rows: each doc's
    * [cum−n, cum) interval exploded over its touched chunks (per-doc
    * bounded), per-row interval intersection for the in-chunk offset,
    * in-doc resume offset, and span length. Shared by the corpus-order
    * (q119) and shuffled-order (q121) manifests.
    */
  private[graft] def manifestRows(assigned: DataFrame): DataFrame =
    assigned
      .select(col("doc_id"), (col("cum") - col("n_tokens")).as("ds"),
        col("cum").as("de"),
        explode(sequence(col("chunk_id"), col("last_chunk"))).as("chunk_id"))
      .select(col("chunk_id"), col("doc_id"),
        (greatest(col("ds"), col("chunk_id") * PackCapacity) -
          col("chunk_id") * PackCapacity).as("chunk_offset"),
        (greatest(col("ds"), col("chunk_id") * PackCapacity) - col("ds"))
          .as("doc_offset"),
        (least(col("de"), (col("chunk_id") + 1) * PackCapacity) -
          greatest(col("ds"), col("chunk_id") * PackCapacity))
          .as("n_span_tokens"))

  /** The q72 per-chunk profile over [[packAssignments]] rows — shared
    * with the streaming parity spec (stream epochs re-aggregate to the
    * batch profile through the SAME definition).
    */
  private[graft] def packProfile(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("tokens_started"),
        sum(when(col("last_chunk") > col("chunk_id"), 1L)
          .otherwise(0L)).as("n_straddlers"),
        max(col("last_chunk") - col("chunk_id") + 1).as("max_span"))

  /** q57's hashed shingle space: stages `g8` — the distinct 64-bit
    * hashes of the word-[[DecontamGram]]-grams of `text` — as LAYERED
    * projections: tokens, grams, and hashes each become a named column
    * before any lambda references them. Inlining instead (one nested
    * expression) would re-run tokenization once PER GRAM, because
    * Spark's subexpression elimination skips `transform()` lambda bodies
    * (the measured quadratic blowup in PERF.md "what the 14× came
    * from" #2). Shared with the streaming dual
    * ([[graft.streaming.DocStream.decontaminated]]) so the two paths
    * cannot diverge on tokenization or hashing.
    */
  private[graft] def gramStage(df: DataFrame, keep: Seq[String]): DataFrame = {
    val cols = keep.map(col)
    df.select(cols :+ tokens(col("text")).as("tk"): _*)
      .select(cols :+ array_distinct(wordNgrams(col("tk"), DecontamGram)).as("g8s"): _*)
      .select(cols :+ transform(col("g8s"), g => portableHash(g)).as("g8"): _*)
  }

  /** The q56 bucket assignment — a pure function of the document KEY, so
    * the same Column works unchanged over a stream
    * ([[graft.streaming.DocStream.split]]): a document's split can never
    * depend on what else has arrived.
    */
  private[graft] def bucketCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    portableHash(docId.cast("string")) % 100

  /** The q56 split thresholds over a [[bucketCol]] value (shared with the
    * streaming dual for the same reason).
    */
  private[graft] def splitCol(bucket: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(bucket < TrainPct, "train")
      .when(bucket < ValPct, "val")
      .otherwise("test")

  /** q59's admission rule — keep a document iff its seeded 60-bit hash
    * mod its stratum count clears the target (P = target/n_l with integer
    * arithmetic only; 60-bit so the rate stays exact past 2^32-row
    * strata, see q62). A pure function of (document key, stratum count,
    * target), shared with the streaming per-epoch dual
    * ([[graft.streaming.DocStream.processStratifiedBatch]]), which feeds
    * it per-EPOCH counts instead of corpus-global ones.
    */
  private[graft] def stratifiedAdmit(docId: org.apache.spark.sql.Column,
      nL: org.apache.spark.sql.Column,
      target: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    portableHash60(docId.cast("string"), 1) % nL < target

  /** q58's per-document scoring: q18's quality formula (stopword ratio
    * and length score — the shared corpus-quality signal) restricted to
    * tokenizable documents. Narrow, zero-shuffle — which is also why the
    * streaming budget admission ([[graft.streaming.DocStream
    * .budgetAdmitted]]) reuses it verbatim.
    */
  private[graft] def scoredTokens(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val stops = stopwordHits(toks, stopwordsByLang.head._2)
    docs
      .select(col("doc_id"), nTok.as("n_tokens"), stops.as("stops"))
      .filter(col("n_tokens") > 0)
      .withColumn("quality",
        (col("stops").cast("double") / col("n_tokens").cast("double")) * 0.4 +
          least(lit(1.0), col("n_tokens").cast("double") / 50.0) * 0.6)
      .select("doc_id", "n_tokens", "quality")
  }

  // DuckDB mirrors — the hex-prefix definition is the SHARED one
  // (TextAnalysis.sqlHashPrefix, mirroring TextFunctions.hashPrefix).
  private val Hash = TextAnalysis.SqlHash
  // 60-bit mirror of portableHash60 (rate-exact admission past 2^32)
  private val Hash60 = TextAnalysis.SqlHash60

  /** q57/q97's tokenize → 8-gram → hash → bench-overlap chain through
    * `contam` (the contaminated train doc_ids) — factored so the
    * pipeline composite (q97) and the per-source yield funnel (q112)
    * share one SQL definition of "contaminated".
    */
  private def sqlContamCtes: String =
    s"""tt AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
       |gs AS (SELECT doc_id,
       |  list_distinct(CASE WHEN len(tk) < $DecontamGram THEN []
       |    ELSE [${(0 until DecontamGram).map(k => s"tk[i+$k]")
              .mkString("||' '||")}
       |          for i in range(1, len(tk)-${DecontamGram - 1}+1)] END) AS g8s
       |  FROM tt),
       |g AS (SELECT doc_id,
       |  list_transform(g8s, x -> ${Hash("x")}) AS g8 FROM gs),
       |bg AS (SELECT DISTINCT unnest(g8) AS gg FROM g
       |  WHERE doc_id % $BenchMod = 0),
       |contam AS (SELECT DISTINCT tr.doc_id FROM
       |  (SELECT doc_id, unnest(g8) AS gg FROM g
       |   WHERE doc_id % $BenchMod <> 0) tr JOIN bg USING (gg))""".stripMargin

  /** The mixture weight as SQL — ONE CASE chain generated from the SAME
    * [[MixtureWeights]] Seq the Spark side reads, so the config cannot
    * drift between engines.
    */
  private def sqlMixtureW: String =
    "CASE " + MixtureWeights.map { case (src, w) =>
      s"WHEN source = '$src' THEN $w" }.mkString(" ") +
      s" ELSE $MixtureDefaultW END"

  /** The q155 apportionment chain through `qt` (source, w, quota_toks),
    * over q58's quality/token CTEs — factored so the plan card (q155)
    * and the selection (q156) share one SQL definition of the quotas.
    * Every step is integer (floor-div base, exact integer remainder,
    * ROW_NUMBER award of the R leftover tokens), so Σ quota_toks = B
    * exactly on both engines.
    */
  private def sqlMixtureQuotaCtes: String =
    s"""tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
       |m AS (SELECT doc_id, len(tk) AS n_tokens,
       |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
       |  FROM tk),
       |t AS (SELECT doc_id, n_tokens,
       |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
       |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
       |  FROM m WHERE n_tokens > 0),
       |sc AS (SELECT t.doc_id, COALESCE(d.source, '$NullSrc') AS source,
       |  t.n_tokens, t.quality
       |  FROM t JOIN documents d USING (doc_id)),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // $MixtureShare AS b
       |  FROM sc),
       |srcs AS (SELECT source, CAST($sqlMixtureW AS BIGINT) AS w
       |  FROM sc GROUP BY source),
       |ww AS (SELECT CAST(SUM(w) AS BIGINT) AS ws FROM srcs),
       |ap AS (SELECT source, w, (b * w) // ws AS base,
       |  b * w - ((b * w) // ws) * ws AS rem FROM srcs, ww, tot),
       |sb AS (SELECT CAST(SUM(base) AS BIGINT) AS sbase FROM ap),
       |rk AS (SELECT source, w, base, rem,
       |  ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk FROM ap),
       |qt AS (SELECT source, w,
       |  CAST(base + CASE WHEN rnk <= b - sbase THEN 1 ELSE 0 END AS BIGINT)
       |    AS quota_toks FROM rk, sb, tot)""".stripMargin

  /** The pack-profile SQL tail over a `t(doc_id, n_tokens)` CTE — the
    * corpus-order prefix sum cut every [[PackCapacity]] tokens, then the
    * per-chunk profile. ONE text shared by q72 (whitespace tokens) and
    * q93 (trained tokens): the mirrors differ only in the token source,
    * exactly like the Spark side's shared [[packAssignments]] /
    * [[packProfile]].
    */
  private def sqlPackTail(src: String = "t"): String =
    s"""c AS (SELECT doc_id, n_tokens,
       |  SUM(n_tokens) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM $src)
       |SELECT CAST((cum - n_tokens) // $PackCapacity AS BIGINT) AS chunk_id,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
       |  CAST(SUM(CASE WHEN (cum - 1) // $PackCapacity
       |      > (cum - n_tokens) // $PackCapacity THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_straddlers,
       |  CAST(MAX((cum - 1) // $PackCapacity
       |    - (cum - n_tokens) // $PackCapacity + 1) AS BIGINT) AS max_span
       |FROM c GROUP BY 1""".stripMargin

  /** The manifest interval-explode CTE `x` over a cum relation `c`
    * (doc_id[, extras], n_tokens, cum) — each doc's [ds, de) token
    * interval exploded over its touched chunks, the SQL mirror of
    * [[manifestRows]]' explode. `extra` carries pass-through columns
    * (q121's pos). Shared by the corpus-order manifest (q119), the
    * shuffled manifest (q121), and the shard plan (q123).
    */
  private def sqlManifestX(extra: String = ""): String =
    s"""x AS (SELECT doc_id,$extra cum - n_tokens AS ds, cum AS de,
       |  unnest(range((cum - n_tokens) // $PackCapacity,
       |    (cum - 1) // $PackCapacity + 1)) AS chunk_id
       |  FROM c)""".stripMargin

  /** The per-row interval-intersection span columns over `x` rows — the
    * SQL mirror of [[manifestRows]]' arithmetic, shared by q119/q121.
    */
  private val sqlSpanCols: String =
    s"""CAST(GREATEST(ds, chunk_id*$PackCapacity)
       |    - chunk_id*$PackCapacity AS BIGINT) AS chunk_offset,
       |  CAST(GREATEST(ds, chunk_id*$PackCapacity) - ds AS BIGINT) AS doc_offset,
       |  CAST(LEAST(de, (chunk_id+1)*$PackCapacity)
       |    - GREATEST(ds, chunk_id*$PackCapacity) AS BIGINT) AS n_span_tokens""".stripMargin

  /** The full q121 oracle (q82's position-ordered cumsum, the shared
    * [[sqlManifestX]] explode, doc ids re-keyed through the position
    * map) — a val so the checksum oracle (q129) wraps the IDENTICAL
    * text as a CTE.
    */
  private lazy val sqlShuffledManifest: String =
    s"""WITH h AS (SELECT doc_id,
       |  ${Hash60(s"CAST(doc_id AS VARCHAR)||'#$ShuffleSeed'")} AS h
       |  FROM documents),
       |p AS (SELECT doc_id,
       |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
       |  FROM h),
       |tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
       |  FROM documents),
       |t AS (SELECT doc_id, n_tokens FROM tk WHERE n_tokens > 0),
       |c AS (SELECT t.doc_id, p.pos, t.n_tokens,
       |  CAST(SUM(t.n_tokens) OVER (ORDER BY p.pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM t JOIN p USING (doc_id)),
       |${sqlManifestX(" pos,")}
       |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id, pos,
       |  $sqlSpanCols
       |FROM x""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q56_hash_split" ->
      s"""WITH b AS (SELECT doc_id,
         |  ${Hash("CAST(doc_id AS VARCHAR)")} % 100 AS bucket FROM documents)
         |SELECT doc_id, bucket,
         |  CASE WHEN bucket < $TrainPct THEN 'train'
         |       WHEN bucket < $ValPct THEN 'val'
         |       ELSE 'test' END AS split
         |FROM b""".stripMargin,

    "q57_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |gs AS (SELECT doc_id,
         |  list_distinct(CASE WHEN len(tk) < $DecontamGram THEN []
         |    ELSE [${(0 until DecontamGram).map(k => s"tk[i+$k]")
                .mkString("||' '||")}
         |          for i in range(1, len(tk)-${DecontamGram - 1}+1)] END) AS g8s
         |  FROM t),
         |g AS (SELECT doc_id,
         |  list_transform(g8s, x -> ${Hash("x")}) AS g8 FROM gs),
         |bg AS (SELECT DISTINCT unnest(g8) AS gg FROM g
         |  WHERE doc_id % $BenchMod = 0),
         |tr AS (SELECT doc_id, unnest(g8) AS gg FROM g
         |  WHERE doc_id % $BenchMod <> 0),
         |ov AS (SELECT doc_id, COUNT(*) AS n_overlap
         |  FROM tr JOIN bg USING (gg) GROUP BY doc_id)
         |SELECT g.doc_id, COALESCE(ov.n_overlap, 0) AS n_overlap,
         |  COALESCE(ov.n_overlap, 0) > 0 AS contaminated
         |FROM g LEFT JOIN ov ON ov.doc_id = g.doc_id
         |WHERE g.doc_id % $BenchMod <> 0""".stripMargin,

    // q57's gram chain + q55's sparse-words bloom mirror: eval grams
    // set words·64 bits, each train gram probes its K seeded positions
    // (HUGEINT shift parity note at q55 — only hit BOOLEANS are
    // compared, never the register words)
    "q102_bloom_decontaminate" -> {
      val bits = BloomDecontamWords * 64
      def pos(e: String, j: Int) =
        s"${Hash(if (j == 0) e else s"$e||'#$j'")} % $bits"
      s"""WITH t AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |gs AS (SELECT doc_id,
         |  list_distinct(CASE WHEN len(tk) < $DecontamGram THEN []
         |    ELSE [${(0 until DecontamGram).map(k => s"tk[i+$k]")
                .mkString("||' '||")}
         |          for i in range(1, len(tk)-${DecontamGram - 1}+1)] END) AS g8s
         |  FROM t),
         |g AS (SELECT doc_id,
         |  list_transform(g8s, x -> ${Hash("x")}) AS g8 FROM gs),
         |bg AS (SELECT DISTINCT unnest(g8) AS gg FROM g
         |  WHERE doc_id % $BenchMod = 0),
         |ep AS (SELECT ${Hash(
                  "CASE WHEN j = 0 THEN CAST(gg AS VARCHAR) " +
                    "ELSE CAST(gg AS VARCHAR)||'#'||j END")}
         |    % $bits AS p
         |  FROM bg, range(0, ${TextAnalysis.BloomK}) rj(j)),
         |words AS (SELECT p // 64 AS w,
         |    bit_or(CAST(1 AS HUGEINT) << CAST(p % 64 AS INTEGER)) AS bits
         |  FROM ep GROUP BY 1),
         |tr AS (SELECT doc_id, unnest(g8) AS gg FROM g
         |  WHERE doc_id % $BenchMod <> 0),
         |pp AS (SELECT doc_id,
         |  ${(0 until TextAnalysis.BloomK).map(j =>
                s"${pos("CAST(gg AS VARCHAR)", j)} AS p$j").mkString(",\n|  ")}
         |  FROM tr),
         |probe AS (SELECT pp.doc_id,
         |  ${(0 until TextAnalysis.BloomK).map(j =>
                s"COALESCE((w$j.bits & (CAST(1 AS HUGEINT) << " +
                  s"CAST(pp.p$j % 64 AS INTEGER))) != 0, false)")
                .mkString("\n|  AND ")} AS hit
         |  FROM pp ${(0 until TextAnalysis.BloomK).map(j =>
                s"LEFT JOIN words w$j ON w$j.w = pp.p$j // 64")
                .mkString("\n|    ")}),
         |h AS (SELECT doc_id,
         |  CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe
         |  FROM probe GROUP BY doc_id)
         |SELECT g.doc_id, COALESCE(h.n_maybe, 0) AS n_maybe,
         |  COALESCE(h.n_maybe, 0) > 0 AS maybe_contaminated
         |FROM g LEFT JOIN h ON h.doc_id = g.doc_id
         |WHERE g.doc_id % $BenchMod <> 0""".stripMargin
    },

    // the q106 weighting CTEs verbatim ([[TextAnalysis.dsirCtes]]), then
    // the q58 budget/cumsum tail over (importance DESC, doc_id)
    "q107_dsir_select" ->
      s"""WITH ${TextAnalysis.dsirCtes},
         |sel AS (SELECT doc_id, n_tokens,
         |  CAST(sum_bits AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS importance
         |  FROM pd WHERE n_tokens > 0),
         |b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 4 AS budget FROM sel),
         |c AS (SELECT doc_id, n_tokens, importance,
         |  SUM(n_tokens) OVER (ORDER BY importance DESC, doc_id) AS cum FROM sel)
         |SELECT doc_id, n_tokens, importance FROM c, b WHERE cum <= budget""".stripMargin,

    // the q90 encode CTEs verbatim (n_bpe_tokens as the mass), q58's
    // quality rank over the SAME tk relation, the shared cumsum tail
    "q113_trained_budget" ->
      s"""WITH ${TextAnalysis.bpeEncodedCtes},
         |qm AS (SELECT doc_id, len(tk) AS n_ws,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |qt AS (SELECT qm.doc_id, pd.n_bpe_tokens AS n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_ws AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_ws AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM qm JOIN pd ON pd.doc_id = qm.doc_id
         |  WHERE n_ws > 0 AND pd.n_bpe_tokens > 0),
         |b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM qt),
         |c AS (SELECT doc_id, n_tokens, quality,
         |  SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum FROM qt)
         |SELECT doc_id, n_tokens AS n_bpe_tokens, quality
         |FROM c, b WHERE cum <= budget""".stripMargin,

    // seeded-hash integer priority race, k smallest (priority, doc_id)
    "q118_priority_sample" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM tk
         |  WHERE len(tk) > 0),
         |p AS (SELECT doc_id, n_tokens,
         |  ${Hash60("CAST(doc_id AS VARCHAR)||'#13'")} // n_tokens AS priority
         |  FROM m)
         |SELECT doc_id, n_tokens, priority FROM p
         |ORDER BY priority, doc_id LIMIT $PrioritySampleK""".stripMargin,

    "q58_token_budget" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0),
         |b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM t),
         |c AS (SELECT doc_id, n_tokens, quality,
         |  SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum FROM t)
         |SELECT doc_id, n_tokens, quality FROM c, b WHERE cum <= budget""".stripMargin,

    "q155_mixture_quotas" ->
      s"""WITH $sqlMixtureQuotaCtes
         |SELECT source, w, quota_toks FROM qt""".stripMargin,

    // the quotas applied: one cumsum per source over (quality DESC,
    // doc_id) against the SAME qt chain
    "q156_mixture_select" ->
      s"""WITH $sqlMixtureQuotaCtes,
         |cum AS (SELECT sc.*, SUM(n_tokens) OVER (PARTITION BY source
         |  ORDER BY quality DESC, doc_id
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM sc)
         |SELECT source, doc_id, n_tokens, quality
         |FROM cum JOIN qt USING (source) WHERE cum <= quota_toks""".stripMargin,

    // the seeded hash rank per source, the K cut
    "q133_stratum_sample_k" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  ${Hash60("CAST(doc_id AS VARCHAR)||'#5'")} AS h FROM documents),
         |r AS (SELECT source, doc_id,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
         |  FROM h)
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id
         |FROM r WHERE rk <= $StratumK""".stripMargin,

    // q58's quality chain joined to source, the per-source rank window,
    // the K cut
    "q130_source_exemplars" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0),
         |r AS (SELECT d.source, t.doc_id, t.n_tokens, t.quality,
         |  ROW_NUMBER() OVER (PARTITION BY d.source
         |    ORDER BY t.quality DESC, t.doc_id) AS rk
         |  FROM t JOIN documents d USING (doc_id))
         |SELECT source, CAST(rk AS BIGINT) AS rk, doc_id, n_tokens, quality
         |FROM r WHERE rk <= $ExemplarK""".stripMargin,

    // q58's quality chain joined to source, the within-source window
    // rank rescaled to integer per-million, ONE global cumsum over
    // (cal_pm DESC, doc_id) against half the corpus token mass — the
    // rank windows are per-source semantics (the Spark side distributes
    // them over the (source, cell) grid exactly as q58/q85 do)
    "q124_calibrated_select" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0),
         |s AS (SELECT t.doc_id, d.source, t.n_tokens, t.quality
         |  FROM t JOIN documents d USING (doc_id)),
         |r AS (SELECT doc_id, n_tokens,
         |  CAST(((COUNT(*) OVER (PARTITION BY source)
         |      - (ROW_NUMBER() OVER (PARTITION BY source
         |          ORDER BY quality DESC, doc_id) - 1)) * 1000000)
         |    // COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS cal_pm
         |  FROM s),
         |b AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 2 AS budget FROM r),
         |c AS (SELECT doc_id, n_tokens, cal_pm,
         |  SUM(n_tokens) OVER (ORDER BY cal_pm DESC, doc_id) AS cum FROM r)
         |SELECT doc_id, n_tokens, cal_pm FROM c, b WHERE cum <= budget""".stripMargin,

    "q59_stratified_sample" ->
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
         |t AS (SELECT MIN(n_l) AS target FROM c)
         |SELECT d.doc_id, d.lang
         |FROM documents d JOIN c USING (lang), t
         |WHERE ${Hash60("CAST(d.doc_id AS VARCHAR)||'#1'")} % n_l < target""".stripMargin,

    "q62_temperature_mix" ->
      s"""WITH c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source),
         |m AS (SELECT MIN(n_s) AS n_min FROM c)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN c USING (source), m
         |WHERE ${Hash60("CAST(d.doc_id AS VARCHAR)||'#3'")} % n_s
         |  < CAST(FLOOR(SQRT(CAST(n_s AS DOUBLE) * CAST(n_min AS DOUBLE))) AS BIGINT)""".stripMargin,

    "q72_sequence_pack" ->
      s"""WITH tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |t AS (SELECT doc_id, n_tokens FROM tk WHERE n_tokens > 0),
         |${sqlPackTail()}""".stripMargin,

    // ceil-power-of-two buckets via binary digit count (the q61 bin()
    // idiom); the oracle may single-sort within a bucket — the engine's
    // rank is range-decomposed
    "q171_length_batches" ->
      s"""WITH tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |t AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM tk
         |  WHERE n_tokens > 0),
         |lb AS (SELECT doc_id, n_tokens,
         |  CAST(CASE WHEN n_tokens = (1::BIGINT << (length(bin(n_tokens)) - 1))
         |    THEN n_tokens
         |    ELSE (1::BIGINT << length(bin(n_tokens))) END AS BIGINT)
         |    AS len_bucket FROM t),
         |pos AS (SELECT len_bucket, n_tokens,
         |  ROW_NUMBER() OVER (PARTITION BY len_bucket ORDER BY doc_id) AS rn
         |  FROM lb)
         |SELECT len_bucket,
         |  CAST((rn - 1) // $BatchSeqs AS BIGINT) AS batch_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_seqs,
         |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST(((COUNT(*) * MAX(n_tokens) - SUM(n_tokens)) * 1000)
         |    // (COUNT(*) * MAX(n_tokens)) AS BIGINT) AS pad_pm
         |FROM pos GROUP BY 1, 2""".stripMargin,

    // the quality gate chain + the shared manifest explode composed:
    // per-chunk pass-token share and the naive global easy-first rank
    // (the oracle may single-sort; the engine's rank is cell-bucketed)
    "q169_chunk_curriculum" ->
      s"""WITH ${TextAnalysis.sqlQualityCtes},
         |ptk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |pt AS (SELECT doc_id, n_tokens FROM ptk WHERE n_tokens > 0),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM pt),
         |${sqlManifestX()},
         |chz AS (SELECT x.chunk_id,
         |  LEAST(de, (chunk_id+1)*$PackCapacity)
         |    - GREATEST(ds, chunk_id*$PackCapacity) AS sp, qp.pass
         |  FROM x JOIN qp USING (doc_id)),
         |chq AS (SELECT chunk_id, COUNT(*) AS n_docs,
         |  CAST(SUM(sp) AS BIGINT) AS chunk_tokens,
         |  CAST(SUM(CASE WHEN pass THEN sp ELSE 0 END) AS BIGINT)
         |    AS pass_tokens
         |  FROM chz GROUP BY chunk_id),
         |pmv AS (SELECT chunk_id, n_docs, chunk_tokens, pass_tokens,
         |  CAST((pass_tokens * 1000) // chunk_tokens AS BIGINT) AS pass_pm
         |  FROM chq)
         |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, n_docs, chunk_tokens,
         |  pass_tokens, pass_pm,
         |  CAST(ROW_NUMBER() OVER (ORDER BY pass_pm DESC, chunk_id)
         |    AS BIGINT) AS curriculum_pos
         |FROM pmv""".stripMargin,

    // shared split thresholds inline, null text folds to 0 tokens
    "q120_source_split_card" ->
      s"""WITH t AS (SELECT source,
         |  CASE WHEN ${Hash("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct THEN 'train'
         |       WHEN ${Hash("CAST(doc_id AS VARCHAR)")} % 100 < $ValPct THEN 'val'
         |       ELSE 'test' END AS split,
         |  COALESCE(len(${TextAnalysis.Toks}), 0) AS n_tokens
         |  FROM documents)
         |SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM t GROUP BY source, split""".stripMargin,

    // the q72 cumsum, each doc's [ds, de) interval exploded over its
    // touched chunks, per-row interval intersection arithmetic
    "q119_pack_manifest" ->
      s"""WITH tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |t AS (SELECT doc_id, n_tokens FROM tk WHERE n_tokens > 0),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM t),
         |${sqlManifestX()}
         |SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
         |  $sqlSpanCols
         |FROM x""".stripMargin,

    // the shared manifest chain dealt round-robin across ShardCount
    // shards — per-shard chunk count, fetch set, and exact token mass
    "q123_shard_plan" ->
      s"""WITH tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |t AS (SELECT doc_id, n_tokens FROM tk WHERE n_tokens > 0),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM t),
         |${sqlManifestX()}
         |SELECT CAST(chunk_id % $ShardCount AS BIGINT) AS shard,
         |  CAST(COUNT(DISTINCT chunk_id) AS BIGINT) AS n_chunks,
         |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  CAST(SUM(LEAST(de, (chunk_id+1)*$PackCapacity)
         |    - GREATEST(ds, chunk_id*$PackCapacity)) AS BIGINT) AS token_mass
         |FROM x GROUP BY 1""".stripMargin,

    // q82's position-ordered cumsum, q119's manifest tail, doc ids
    // carried through the position map
    "q121_shuffled_manifest" -> sqlShuffledManifest,

    // the q121 manifest verbatim, folded to ONE integrity row: the same
    // per-row hash + modular sum the Spark side computes
    "q129_manifest_checksum" ->
      s"""WITH mf AS ($sqlShuffledManifest)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(${Hash60("CAST(chunk_id AS VARCHAR)||'#'||" +
            "CAST(doc_id AS VARCHAR)||'#'||CAST(pos AS VARCHAR)||'#'||" +
            "CAST(chunk_offset AS VARCHAR)||'#'||" +
            "CAST(doc_offset AS VARCHAR)||'#'||" +
            s"CAST(n_span_tokens AS VARCHAR)||'#$ChecksumSeed'")})
         |    % $ChecksumMod AS BIGINT) AS checksum
         |FROM mf""".stripMargin,

    // q72's pack tail over q90's per-doc TRAINED-token counts — the
    // token source swaps, the pack SQL is byte-identical (sqlPackTail)
    "q93_pack_trained" ->
      s"""WITH ${TextAnalysis.bpeEncodedCtes},
         |t AS (SELECT doc_id, n_bpe_tokens AS n_tokens FROM pd
         |  WHERE n_bpe_tokens > 0),
         |${sqlPackTail()}""".stripMargin,

    // every stage is its standalone oracle's fragment: q36's dedup CTE
    // + prep-score chain (sqlPrepScore), q57's gram CTEs, q56's bucket
    // predicate, q81's global rank semantics over the survivor set,
    // q72's pack tail — chained
    "q97_curation_pipeline" ->
      s"""WITH dd AS (SELECT doc_id, text FROM (
         |  SELECT doc_id, text, ROW_NUMBER() OVER (
         |    PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM documents) t0
         |  WHERE rn = 1),
         |${TextAnalysis.sqlPrepScore("dd")},
         |pp AS (SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM f
         |  WHERE lang_guess = 'en' AND quality >= 0.5),
         |$sqlContamCtes,
         |surv AS (SELECT doc_id, n_tokens FROM pp
         |  WHERE ${Hash("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |    AND doc_id % $BenchMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
         |pos AS (SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |  FROM (SELECT doc_id,
         |    ${Hash60(s"CAST(doc_id AS VARCHAR)||'#$ShuffleSeed'")} AS h
         |    FROM surv) z),
         |packin AS (SELECT pos.pos AS doc_id, surv.n_tokens
         |  FROM pos JOIN surv USING (doc_id)),
         |${sqlPackTail("packin")}""".stripMargin,

    // the shared manifest chain × provenance, per-chunk distinct
    // sources, the double agg
    "q147_chunk_mixing" ->
      s"""WITH tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |t AS (SELECT doc_id, n_tokens FROM tk WHERE n_tokens > 0),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         |  FROM t),
         |${sqlManifestX()},
         |pc AS (SELECT x.chunk_id,
         |  CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources
         |  FROM x JOIN documents d ON d.doc_id = x.doc_id
         |  GROUP BY x.chunk_id)
         |SELECT n_sources, COUNT(*) AS n_chunks
         |FROM pc GROUP BY n_sources""".stripMargin,

    // q58's quality chain, the bin() bit-length octave, the floored
    // decile, one grouped count
    "q146_length_quality_grid" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0)
         |SELECT CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS len_log2,
         |  CAST(least(9, floor(quality * 10)) AS BIGINT) AS quality_decile,
         |  COUNT(*) AS n_docs
         |FROM t GROUP BY 1, 2""".stripMargin,

    // the shared cluster chain → ppm weights → q58's quality chain →
    // discounted mass → the one cumsum against half the effective total
    "q142_discounted_budget" ->
      s"""${Dedup.sqlClusters},
         |w2 AS (SELECT doc_id,
         |  CAST(1000000 // COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
         |    AS weight_ppm
         |  FROM clusters),
         |tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t2 AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0),
         |e AS (SELECT t2.doc_id,
         |  CAST((t2.n_tokens * w2.weight_ppm) // 1000000 AS BIGINT)
         |    AS eff_tokens,
         |  t2.quality FROM t2 JOIN w2 USING (doc_id)),
         |b AS (SELECT CAST(SUM(eff_tokens) AS BIGINT) // 2 AS budget FROM e),
         |c AS (SELECT doc_id, eff_tokens, quality,
         |  SUM(eff_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum FROM e)
         |SELECT doc_id, eff_tokens, quality FROM c, b WHERE cum <= budget""".stripMargin,

    // the q57 gram chain (sqlContamCtes' g relation), the (train, bench)
    // shared-gram counts, the rank-1 cut
    "q139_contam_attribution" ->
      s"""WITH $sqlContamCtes,
         |bgd AS (SELECT doc_id AS bench_doc, unnest(g8) AS gg FROM g
         |  WHERE doc_id % $BenchMod = 0),
         |trd AS (SELECT doc_id, unnest(g8) AS gg FROM g
         |  WHERE doc_id % $BenchMod <> 0),
         |pc AS (SELECT trd.doc_id, bgd.bench_doc,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |  FROM trd JOIN bgd USING (gg) GROUP BY 1, 2),
         |rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |  ORDER BY n_shared DESC, bench_doc) AS rk FROM pc)
         |SELECT doc_id, bench_doc, n_shared FROM rr WHERE rk = 1""".stripMargin,

    // q97's dedup/quality/contamination CTEs verbatim, stage flags per
    // document, ONE grouped report per source
    "q112_source_yield" ->
      s"""WITH dd AS (SELECT doc_id, text FROM (
         |  SELECT doc_id, text, ROW_NUMBER() OVER (
         |    PARTITION BY sha256(text) ORDER BY doc_id) AS rn FROM documents) t0
         |  WHERE rn = 1),
         |${TextAnalysis.sqlPrepScore("dd")},
         |pp AS (SELECT doc_id FROM f
         |  WHERE lang_guess = 'en' AND quality >= 0.5),
         |$sqlContamCtes,
         |st AS (SELECT d.doc_id, d.source,
         |  CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS fd,
         |  CASE WHEN pp.doc_id IS NOT NULL THEN 1 ELSE 0 END AS fq,
         |  CASE WHEN pp.doc_id IS NOT NULL AND d.doc_id % $BenchMod <> 0
         |    AND c.doc_id IS NULL THEN 1 ELSE 0 END AS fl
         |  FROM documents d LEFT JOIN dd ON dd.doc_id = d.doc_id
         |    LEFT JOIN pp ON pp.doc_id = d.doc_id
         |    LEFT JOIN contam c ON c.doc_id = d.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw,
         |  CAST(SUM(fd) AS BIGINT) AS n_dedup,
         |  CAST(SUM(fq) AS BIGINT) AS n_quality,
         |  CAST(SUM(fl) AS BIGINT) AS n_clean,
         |  CAST(SUM(CASE WHEN fl = 1
         |    AND ${Hash("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_train
         |FROM st GROUP BY source""".stripMargin,

    // the shared q27 pair CTEs × the source column — q79's shape at
    // source granularity, pair-normalized with least/greatest
    "q89_source_leakage" ->
      s"""WITH ${Similarity.SqlSimhashPairCtes},
         |lpairs AS (${Similarity.SqlSimhashPairSelect.replace("\n", " ")}),
         |sp AS (SELECT doc_id, source FROM documents)
         |SELECT least(a.source, b.source) AS source_a,
         |  greatest(a.source, b.source) AS source_b, COUNT(*) AS n_pairs
         |FROM lpairs p JOIN sp a ON a.doc_id = p.doc_a
         |  JOIN sp b ON b.doc_id = p.doc_b
         |WHERE a.source <> b.source
         |GROUP BY 1, 2""".stripMargin,

    // the shared q27 pair CTEs × the q56 split rule — the two audited
    // definitions, recomposed
    "q79_split_leakage" ->
      s"""WITH ${Similarity.SqlSimhashPairCtes},
         |lpairs AS (${Similarity.SqlSimhashPairSelect.replace("\n", " ")}),
         |sp AS (SELECT doc_id,
         |  CASE WHEN ${Hash("CAST(doc_id AS VARCHAR)")} % 100 < $TrainPct THEN 'train'
         |       WHEN ${Hash("CAST(doc_id AS VARCHAR)")} % 100 < $ValPct THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT a.split AS split_a, b.split AS split_b, COUNT(*) AS n_pairs
         |FROM lpairs p JOIN sp a ON a.doc_id = p.doc_a
         |  JOIN sp b ON b.doc_id = p.doc_b
         |WHERE a.split <> b.split
         |GROUP BY a.split, b.split""".stripMargin,

    "q81_epoch_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${Hash60(s"CAST(doc_id AS VARCHAR)||'#$ShuffleSeed'")} AS h
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |FROM h""".stripMargin,

    // q81's ROW_NUMBER CTE feeding q72's window chain — the literal
    // composition the Spark side performs
    "q82_shuffled_pack" ->
      s"""WITH h AS (SELECT doc_id,
         |  ${Hash60(s"CAST(doc_id AS VARCHAR)||'#$ShuffleSeed'")} AS h
         |  FROM documents),
         |p AS (SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
         |  FROM h),
         |tk AS (SELECT doc_id, len(${TextAnalysis.Toks}) AS n_tokens
         |  FROM documents),
         |t AS (SELECT doc_id, n_tokens FROM tk WHERE n_tokens > 0),
         |c AS (SELECT t.doc_id, t.n_tokens,
         |  SUM(t.n_tokens) OVER (ORDER BY p.pos
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t JOIN p USING (doc_id))
         |SELECT CAST((cum - n_tokens) // $PackCapacity AS BIGINT) AS chunk_id,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
         |  CAST(SUM(CASE WHEN (cum - 1) // $PackCapacity
         |      > (cum - n_tokens) // $PackCapacity THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_straddlers,
         |  CAST(MAX((cum - 1) // $PackCapacity
         |    - (cum - n_tokens) // $PackCapacity + 1) AS BIGINT) AS max_span
         |FROM c GROUP BY 1""".stripMargin,

    "q80_source_profile" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0)
         |SELECT d.source, COUNT(*) AS n_docs,
         |  CAST(SUM(COALESCE(t.n_tokens, 0)) AS BIGINT) AS n_tokens,
         |  CAST(SUM(CASE WHEN t.quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality_ok,
         |  MIN(t.quality) AS min_quality, MAX(t.quality) AS max_quality
         |FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
         |GROUP BY d.source""".stripMargin,

    // the quality-cell bucketing is an implementation detail of the
    // Spark plan; the semantics are the one global easy-first rank
    "q85_curriculum_order" ->
      s"""WITH tk AS (SELECT doc_id, ${TextAnalysis.Toks} AS tk FROM documents),
         |m AS (SELECT doc_id, len(tk) AS n_tokens,
         |  len(list_filter(tk, x -> x IN ${TextAnalysis.sqlStops("en")})) AS stops
         |  FROM tk),
         |t AS (SELECT doc_id, n_tokens,
         |  (CAST(stops AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.4
         |    + least(1.0, CAST(n_tokens AS DOUBLE)/50.0)*0.6 AS quality
         |  FROM m WHERE n_tokens > 0)
         |SELECT doc_id, quality,
         |  CAST(ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) - 1 AS BIGINT)
         |    AS pos
         |FROM t""".stripMargin)
}
