package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import graft.functions.TextFunctions
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Behavior contracts for the corpus-curation operators (q56–q59) — the
  * properties their code comments claim, pinned as tests:
  *
  *   - q56: the split is STABLE under corpus growth (a doc's assignment
  *     is a pure function of its key, so downstream eval sets never
  *     churn when new data arrives) and respects the bucket thresholds.
  *   - q57: a planted shared 8-gram flags a training doc; a 7-word
  *     shared run does NOT (the shingle width is the contract).
  *   - q58: boundary semantics equal the reference cumsum (quality DESC,
  *     doc_id) ≤ budget — verified against an independently computed
  *     expectation; the adversarial all-one-quality corpus (the entire
  *     selection is one tie group) is exact and still runs with no
  *     single-partition stage.
  *   - q56–q59: an EMPTY corpus yields a defined empty result, never a
  *     driver NPE on a one-row accounting read (sum/min of zero rows is
  *     NULL — the r7 verdict's standing crash class).
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Writes a (doc_id, text, lang) corpus to a temp dir in the testdata
    * layout and returns the dir.
    */
  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-curation").toString
    rows.toDF("doc_id", "text", "lang").write.parquet(s"$d/documents.parquet")
    d
  }

  /** Like [[corpus]] but with a source column (q62 strata). */
  private def corpusWithSource(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-curation-src").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  // ---------------------------------------------------------------- empty

  for (q <- Seq("q56_hash_split", "q57_decontaminate",
      "q58_token_budget", "q59_stratified_sample", "q72_sequence_pack",
      "q79_split_leakage", "q81_epoch_shuffle", "q82_shuffled_pack",
      "q85_curriculum_order", "q123_shard_plan", "q165_multimodal_pack",
      "q169_chunk_curriculum", "q171_length_batches"))
    test(s"$q yields a defined empty result on an empty corpus") {
      val dir = corpus(Seq.empty)
      assert(SparkEntry.queries(q)(spark, dir).count() === 0L)
      Caches.release(spark)
    }

  test("q86 yields a defined empty result on an empty corpus") {
    assert(SparkEntry.queries("q86_source_minhash")(
      spark, corpusWithSource(Seq.empty)).count() === 0L)
  }

  test("q89 yields a defined empty result on an empty corpus") {
    assert(SparkEntry.queries("q89_source_leakage")(
      spark, corpusWithSource(Seq.empty)).count() === 0L)
    Caches.release(spark)
  }

  test("q89 counts only CROSS-source near-dup pairs, normalized per pair") {
    // docs 0 (A) and 1 (B) are identical -> one cross-boundary pair,
    // accumulated under the ordered key (A, B) regardless of doc order;
    // docs 2 and 3 are identical WITHIN A -> excluded; doc 4 (C) shares
    // nothing -> absent
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten eleven"
    val dir = corpusWithSource(Seq(
      (0L, t1, "en", "A"), (1L, t1, "en", "B"),
      (2L, t2, "en", "A"), (3L, t2, "en", "A"),
      (4L, "completely different words entirely unrelated here", "en", "C")))
    val got = SparkEntry.queries("q89_source_leakage")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_pairs")).toMap
    Caches.release(spark)
    assert(got === Map(("A", "B") -> 1L), got)
  }

  test("q62 yields a defined empty result on an empty corpus") {
    assert(SparkEntry.queries("q62_temperature_mix")(
      spark, corpusWithSource(Seq.empty)).count() === 0L)
  }

  test("q80 yields a defined empty result on an empty corpus") {
    assert(SparkEntry.queries("q80_source_profile")(
      spark, corpusWithSource(Seq.empty)).count() === 0L)
  }

  // ----------------------------------------------------------------- q62

  test("q62 temperature mixing sits between proportional and equal") {
    // skewed sources 64/16/4: targets are the geometric means
    // isqrt(64·4)=16, isqrt(16·4)=8, isqrt(4·4)=4 — so the smallest
    // source is kept WHOLE (hash % 4 < 4 always), the others are strict
    // subsets at rates 0.25 and 0.5: more small-source representation
    // than proportional, more large-source than equal
    val rows = (0L until 84L).map { i =>
      val src = if (i < 64) "big" else if (i < 80) "mid" else "tiny"
      (i, s"text $i", "en", src)
    }
    val dir = corpusWithSource(rows)
    val got = SparkEntry.queries("q62_temperature_mix")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("tiny", 0) === 4, s"smallest source kept whole: $bySrc")
    assert(bySrc.getOrElse("big", 0) < 64 && bySrc.getOrElse("mid", 0) < 16,
      s"larger sources must downsample: $bySrc")
    // deterministic: the admitted set is identical on a second run
    val again = SparkEntry.queries("q62_temperature_mix")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  // ----------------------------------------------------------------- q56

  test("q56 split stability: growing the corpus never moves an existing doc") {
    def docs(r: Range) = r.map(i => (i.toLong, s"document number $i body", "en"))
    val small = corpus(docs(0 until 40))
    val big = corpus(docs(0 until 40) ++ docs(1000 until 1100))
    def splits(dir: String): Map[Long, String] =
      SparkEntry.queries("q56_hash_split")(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = splits(small)
    val b = splits(big)
    assert(a.keySet.subsetOf(b.keySet))
    a.foreach { case (id, s) => assert(b(id) === s, s"doc $id moved") }
  }

  test("q56 buckets are in [0,100) and splits follow the thresholds") {
    val dir = corpus((0L until 200L).map(i => (i, s"text $i", "en")))
    SparkEntry.queries("q56_hash_split")(spark, dir).collect().foreach { r =>
      val bucket = r.getLong(1)
      assert(bucket >= 0 && bucket < 100, r.toString)
      val expect = if (bucket < Curation.TrainPct) "train"
        else if (bucket < Curation.ValPct) "val" else "test"
      assert(r.getString(2) === expect, r.toString)
    }
  }

  // ----------------------------------------------------------------- q57

  test("q57 planted contamination: a shared 8-gram flags, 7 shared words do not") {
    val gram8 = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val dir = corpus(Seq(
      // doc 0 % 97 == 0 → the benchmark side
      (0L, s"benchmark prompt says $gram8 and stops", "en"),
      // shares the full 8-gram with the benchmark → contaminated
      (1L, s"training document copies $gram8 verbatim today", "en"),
      // shares only a 7-word run (8th word differs) → clean
      (2L, "training alpha beta gamma delta epsilon zeta eta OMEGA", "en"),
      // no shared words at all → clean
      (3L, "completely unrelated training text about nothing much", "en")))
    val out = SparkEntry.queries("q57_decontaminate")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(!out.contains(0L), "benchmark docs must not appear in the output")
    assert(out(1L)._2 && out(1L)._1 >= 1L, s"planted leak missed: $out")
    assert(out(2L) === ((0L, false)), s"7-gram overlap must not flag: $out")
    assert(out(3L) === ((0L, false)), out.toString)
    Caches.release(spark)
  }

  test("q57 at a 10x corpus still broadcasts the eval side — no corpus-sized shuffle join") {
    // the eval side is benchmark-sized BY CONSTRUCTION (every 97th doc),
    // so growing the training corpus must never flip the overlap join to
    // shuffling the corpus against it — the BandScaleSpec discipline
    // (scale properties hold with NO constant retuning), applied to
    // decontamination. 5000 docs = 10× the sf0.001 documents table.
    val rows = (0L until 5000L).map { i =>
      (i, s"document $i covers topic ${i % 37} " +
        (0 until 12).map(k => s"tok${(i * 7 + k) % 997}").mkString(" "), "en")
    }
    val dir = corpus(rows)
    val df = SparkEntry.queries("q57_decontaminate")(spark, dir)
    df.collect() // materialize THIS QueryExecution so AQE finalizes ITS plan (count() would execute a separate one, leaving this plan isFinalPlan=false)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1500))
    Caches.release(spark)
  }

  // ---------------------------------------------------------------- q112

  test("q112 funnel is monotone per source and its train total is q97's corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q112_source_yield")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    Caches.release(spark)
    assert(rows.nonEmpty)
    rows.foreach { case (src, raw, dd, q, cl, tr) =>
      assert(raw >= dd && dd >= q && q >= cl && cl >= tr,
        s"funnel not monotone for $src: $raw $dd $q $cl $tr")
    }
    // the funnel's terminal stage IS q97's survivor set: the packed
    // chunks' doc total must equal the summed per-source train yield
    val packedDocs = SparkEntry.queries("q97_curation_pipeline")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
    Caches.release(spark)
    assert(rows.map(_._6).sum === packedDocs,
      "sum(n_train) over sources must equal q97's packed document count")
  }

  test("q112 counts an exact duplicate against dedup, not quality") {
    // one source, three docs: two byte-identical (the later one falls at
    // the dedup stage) and one distinct; all pass quality (English
    // stopwords + >=50 tokens => quality >= 0.5 regardless of stops)
    val good = ("the a of to and in is it you that " * 6).trim // 60 tokens
    val dir = corpusWithSource(Seq(
      (1L, good, "en", "web"),
      (2L, good, "en", "web"),
      (3L, good + " extra", "en", "web")))
    val m = SparkEntry.queries("q112_source_yield")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Caches.release(spark)
    // raw 3, dedup keeps doc 1 (min id of the identical pair) + doc 3,
    // both pass quality
    assert(m === Map("web" -> ((3L, 2L, 2L))))
  }

  // ----------------------------------------------------------------- q58

  /** The oracle's per-doc scoring, computed independently in Scala: the
    * same IEEE op sequence as [[Curation.scoredTokens]], so doubles are
    * bit-identical and tie groups form identically.
    */
  private def score(text: String): Option[(Long, Double)] = {
    val toks = text.trim.toLowerCase.split("\\s+").toSeq
    val stopwords = TextFunctions.stopwordsByLang.head._2.toSet
    val n = toks.length.toLong
    if (n == 0) None
    else {
      val stops = toks.count(stopwords.contains).toLong
      Some((n, (stops.toDouble / n.toDouble) * 0.4 +
        math.min(1.0, n.toDouble / 50.0) * 0.6))
    }
  }

  /** Reference selection: cumsum of n_tokens over (quality DESC, doc_id)
    * ≤ total/2 — the oracle's single global window, evaluated locally.
    */
  private def referenceSelection(rows: Seq[(Long, String)]): Set[Long] = {
    val scored = rows.flatMap { case (id, t) => score(t).map(s => (id, s._1, s._2)) }
    val budget = scored.map(_._2).sum / 2
    var cum = 0L
    scored.sortBy { case (id, _, q) => (-q, id) }.flatMap { case (id, n, _) =>
      cum += n
      if (cum <= budget) Some(id) else None
    }.toSet
  }

  test("q58 matches the reference cumsum on a mixed-quality corpus with tie groups") {
    // distinct (stops, n_tokens) pairs → several quality groups; the i%4 ×
    // i%5 construction repeats pairs, so groups hold multiple docs and the
    // budget boundary lands inside a tie group for this corpus
    val rows = (0 until 30).map { i =>
      val text = ("the " * (i % 4)) + (s"word$i " * (3 + i % 5))
      (i.toLong, text.trim)
    }
    val dir = corpus(rows.map { case (id, t) => (id, t, "en") })
    val got = SparkEntry.queries("q58_token_budget")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(got === referenceSelection(rows))
    Caches.release(spark)
  }

  test("q58 adversarial tie: quality collapses to ONE value — exact and distributed") {
    // every doc identical → one quality group; the whole selection is the
    // boundary tie group. 7 tokens × 20 docs = 140, budget 70 → exactly
    // doc_ids 0..9. The plan must still contain no single-partition stage
    // (the tie cumsum is range-split over doc_id buckets).
    val dir = corpus((0L until 20L).map(i =>
      (i, "uniform text of exactly seven small tokens", "en")))
    val df = SparkEntry.queries("q58_token_budget")(spark, dir)
    assert(!df.queryExecution.executedPlan.toString.contains("SinglePartition"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (0L until 10L))
    Caches.release(spark)
  }

  test("q120 card cells reconcile with q56 splits and conserve the corpus") {
    val dir = "/root/testdata/sf0.001"
    val card = SparkEntry.queries("q120_source_split_card")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    Caches.release(spark)
    // every document lands in exactly one cell
    assert(card.map(_._3).sum === 500L)
    // split marginals equal the q56 assignment's (shared Column — but
    // the card must aggregate it faithfully)
    val bySplit = card.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val q56 = SparkEntry.queries("q56_hash_split")(spark, dir)
      .collect().groupBy(_.getString(2)).view.mapValues(_.length.toLong).toMap
    Caches.release(spark)
    assert(bySplit === q56)
    // token mass is non-negative and positive wherever docs tokenize
    card.foreach { case (s, sp, nd, tt) =>
      assert(tt >= 0L && nd > 0L, s"cell ($s, $sp)")
    }
  }

  test("q171 length batches: pow2 buckets incl. the exact-power boundary; waste is hand-exact") {
    // docs 0-4 are 3 tokens, docs 5-9 are 4 (the EXACT power — must
    // stay in bucket 4, not promote to 8), docs 10-19 alternate 5/7
    // tokens (bucket 8). Within bucket 4, batch 0 = docs 0-7 (max 4,
    // 27 real tokens -> waste (32-27)/32 = 156 pm), batch 1 = docs 8-9
    // (all 4s, 0 pm). Bucket 8 batches pad 7-max over 5/7 mixes:
    // (56-48)/56 = 142 pm and (14-12)/14 = 142 pm.
    val dir = corpus((0L until 20L).map { i =>
      val n = if (i < 5) 3 else if (i < 10) 4 else if (i % 2 == 0) 5 else 7
      (i, Seq.fill(n)("tok").mkString(" "), "en")
    })
    val got = SparkEntry.queries("q171_length_batches")(spark, dir)
      .collect().map(r => (r.getAs[Long]("len_bucket"),
        r.getAs[Long]("batch_id")) ->
        ((r.getAs[Long]("n_seqs"), r.getAs[Long]("max_tokens"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("pad_pm")))).toMap
    Caches.release(spark)
    assert(got == Map(
      (4L, 0L) -> ((8L, 4L, 27L, 156L)),
      (4L, 1L) -> ((2L, 4L, 8L, 0L)),
      (8L, 0L) -> ((8L, 7L, 48L, 142L)),
      (8L, 1L) -> ((2L, 7L, 12L, 142L))), got.toString)
  }

  test("q169 chunk curriculum: pass shares and positions are hand-exact; clean chunks schedule first") {
    // docs 0-4 pass the gate (62 alpha words incl. the/with), docs 5-9
    // fail it (62 numeric tokens — alpha rule). All docs are 62 tokens,
    // so the cumsum is 620 over two chunks: chunk 0 = docs 0-7 full +
    // 16 of doc 8 (512 tokens, 310 of them from pass docs -> 605 pm),
    // chunk 1 = doc 8's 46-token remainder + doc 9 (108 tokens, 0 pm).
    // The clean chunk takes curriculum position 1.
    val passT = "the with " + Seq.fill(60)("data").mkString(" ")
    val failT = Seq.fill(62)("12345").mkString(" ")
    val dir = corpus((0L until 10L).map(i =>
      (i, if (i < 5) passT else failT, "en")))
    val got = SparkEntry.queries("q169_chunk_curriculum")(spark, dir)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("chunk_tokens"),
          r.getAs[Long]("pass_tokens"), r.getAs[Long]("pass_pm"),
          r.getAs[Long]("curriculum_pos")))).toMap
    Caches.release(spark)
    assert(got == Map(
      0L -> ((9L, 512L, 310L, 605L, 1L)),
      1L -> ((2L, 108L, 0L, 0L, 2L))), got.toString)
  }

  test("q165 interleaved pack: media-only docs occupy sequence space; the split sums are hand-exact") {
    // kinds cycle image(64)/audio(128)/video(256) by doc_id % 3. Doc 1
    // is NULL text (0 text tokens) and doc 4 empty text (one "" token —
    // the tokenizer convention): both are media-only-ish and must still
    // pack — the case the text-only q72 drops. Hand cumsum over costs
    // 67,128,257,66,129,257: docs 0-3 start in chunk 0 (doc 3 straddles
    // at 452+66=518 > 512), docs 4-5 start in chunk 1.
    val dir = corpus(Seq(
      (0L, "a b c", "en"), (1L, null, "en"),
      (2L, "x", "en"), (3L, "one two", "en"),
      (4L, "", "en"), (5L, "w", "en")))
    val got = SparkEntry.queries("q165_multimodal_pack")(spark, dir)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_started"),
          r.getAs[Long]("text_tokens"), r.getAs[Long]("media_tokens"),
          r.getAs[Long]("n_straddlers")))).toMap
    Caches.release(spark)
    assert(got == Map(
      0L -> ((4L, 518L, 6L, 512L, 1L)),
      1L -> ((2L, 386L, 2L, 384L, 0L))), got.toString)
  }

  test("q119 manifest tiles every chunk exactly and reassembles every doc") {
    // 200 docs x 7 tokens = 1400 tokens over 512-token chunks: two full
    // chunks plus a 376-token tail, with straddlers at both boundaries
    val dir = corpus((0L until 200L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta", "en")))
    val rows = SparkEntry.queries("q119_pack_manifest")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    Caches.release(spark)
    // every doc's spans cover exactly its tokens, in doc order
    rows.groupBy(_._2).foreach { case (doc, sp) =>
      assert(sp.map(_._5).sum === 7L, s"doc $doc coverage")
      val ordered = sp.sortBy(_._1)
      assert(ordered.head._4 === 0L, s"doc $doc first span doc_offset")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._4 === a._4 + a._5, s"doc $doc resume")
        case _ =>
      }
    }
    // every chunk tiles: contiguous spans from offset 0; full chunks
    // carry exactly the capacity
    val byChunk = rows.groupBy(_._1)
    assert(byChunk.keySet === Set(0L, 1L, 2L))
    byChunk.foreach { case (ch, sp) =>
      val ordered = sp.sortBy(_._3)
      assert(ordered.head._3 === 0L, s"chunk $ch starts at 0")
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._5, s"chunk $ch gap")
        case _ =>
      }
      val total = sp.map(_._5).sum
      assert(if (ch < 2L) total === 512L else total === 376L,
        s"chunk $ch mass $total")
    }
    // cross-pin against q72's profile: docs STARTING in a chunk
    // (doc_offset 0) are its n_docs / tokens_started
    val prof = SparkEntry.queries("q72_sequence_pack")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Caches.release(spark)
    byChunk.foreach { case (ch, sp) =>
      val starters = sp.filter(_._4 == 0L)
      assert(starters.length.toLong === prof(ch)._1, s"chunk $ch n_docs")
      assert(starters.map(_._2).map(_ => 7L).sum === prof(ch)._2,
        s"chunk $ch tokens_started")
    }
  }

  test("q121 shuffled manifest: real doc ids, a true permutation, tiles as q82") {
    val dir = corpus((0L until 200L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta", "en")))
    val rows = SparkEntry.queries("q121_shuffled_manifest")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    Caches.release(spark)
    // every document appears under its REAL id with full coverage
    assert(rows.map(_._2).toSet === (0L until 200L).toSet)
    rows.groupBy(_._2).foreach { case (d, sp) =>
      assert(sp.map(_._6).sum === 7L, s"doc $d coverage")
    }
    // positions are a permutation — and not the identity (it shuffles)
    val posByDoc = rows.map(r => (r._2, r._3)).distinct
    assert(posByDoc.map(_._2).toSet === (0L until 200L).toSet)
    assert(posByDoc.exists { case (d, p) => d != p })
    // chunks tile to capacity exactly as the corpus-order manifest
    val byChunk = rows.groupBy(_._1)
    assert(byChunk.keySet === Set(0L, 1L, 2L))
    byChunk.foreach { case (ch, sp) =>
      val total = sp.map(_._6).sum
      assert(if (ch < 2L) total === 512L else total === 376L,
        s"chunk $ch mass $total")
    }
    // cross-pin: rows starting in a chunk are q82's per-chunk n_docs
    val prof = SparkEntry.queries("q82_shuffled_pack")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.release(spark)
    byChunk.foreach { case (ch, sp) =>
      assert(sp.count(_._5 == 0L).toLong === prof(ch), s"chunk $ch starters")
    }
  }

  test("q124 yields a defined empty result on an empty corpus") {
    assert(SparkEntry.queries("q124_calibrated_select")(
      spark, corpusWithSource(Seq.empty)).count() === 0L)
    Caches.release(spark)
  }

  test("q124 calibrated selection drains strata by rank where q58 drains by raw score") {
    // source A: five 50-token docs (quality 0.6); source B: five 10-token
    // docs (quality 0.12). Budget = half of 300 = 150 tokens.
    // q58 (raw quality) lets A monopolize the budget: {0,2,4}, zero B.
    // q124 (within-source percentile): each source's k-th best documents
    // TIE at ((5-k)·1e6) div 5, so the cumsum over (cal_pm DESC, doc_id)
    // interleaves strata — two docs from EACH source fit the same budget.
    def words(i: Long, n: Int) =
      (0 until n).map(j => s"w${i}x$j").mkString(" ")
    val rows = (0L until 10L).map { i =>
      val n = if (i % 2 == 0) 50 else 10
      (i, words(i, n), "en", if (i % 2 == 0) "A" else "B")
    }
    val dir = corpusWithSource(rows)
    val got = SparkEntry.queries("q124_calibrated_select")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    Caches.release(spark)
    assert(got === Set((0L, 50L, 1000000L), (1L, 10L, 1000000L),
      (2L, 50L, 800000L), (3L, 10L, 800000L)), got)
    // the raw-quality baseline on the SAME corpus: all-A, the bias q124
    // exists to remove (if this drifts, the contrast claim is stale)
    val q58 = SparkEntry.queries("q58_token_budget")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    Caches.release(spark)
    assert(q58 === Set(0L, 2L, 4L), s"raw-quality baseline drifted: $q58")
  }

  test("q123 shard plan: the chunk deal balances token mass by construction") {
    // 1000 docs x 7 tokens = 7000 tokens -> 14 chunks over 8 shards:
    // shards 0..5 take 2 chunks, 6..7 take 1 — balance is a property of
    // the round-robin, not of the document length distribution
    val dir = corpus((0L until 1000L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta", "en")))
    val got = SparkEntry.queries("q123_shard_plan")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    Caches.release(spark)
    assert(got.keySet === (0L until 8L).toSet)
    assert(got.filter(_._2._1 == 2L).keySet === (0L until 6L).toSet,
      s"chunk deal: $got")
    // shard masses conserve the corpus and differ by at most one chunk
    val masses = got.values.map(_._3)
    assert(masses.sum === 7000L)
    assert(masses.max - masses.min <= 512L)
    // cross-pin: per-shard mass and fetch set equal the q119 manifest
    // grouped under the same deal
    val manifest = SparkEntry.queries("q119_pack_manifest")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    Caches.release(spark)
    val bySh = manifest.groupBy(_._1 % 8L)
    assert(got.map { case (k, v) => k -> v._3 } ===
      bySh.map { case (sh, rows) => sh -> rows.map(_._3).sum })
    assert(got.map { case (k, v) => k -> v._2 } ===
      bySh.map { case (sh, rows) => sh -> rows.map(_._2).distinct.length.toLong })
  }

  test("q133 fixed-K stratum sample: exactly min(K, stratum) rows, stable under growth") {
    // strata of 50 / 30 / 10 docs: the 10-doc stratum yields all 10
    // rows (ranks 1..10), the others exactly K = 25 — and because the
    // rank key is the seeded doc hash, growing ANOTHER stratum never
    // changes this stratum's picks
    val rows = (0L until 90L).map { i =>
      val src = if (i < 50) "big" else if (i < 80) "mid" else "small"
      (i, s"doc number $i content", "en", src)
    }
    val dir = corpusWithSource(rows)
    val got = SparkEntry.queries("q133_stratum_sample_k")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    Caches.release(spark)
    val bySrc = got.groupBy(_._1)
    assert(bySrc("big").length === 25 && bySrc("mid").length === 25 &&
      bySrc("small").length === 10, bySrc.view.mapValues(_.length).toMap)
    assert(bySrc("small").map(_._2).sorted.toSeq === (1L to 10L))
    // growth stability: doubling the big stratum leaves mid's pick set
    // identical (the hash rank is a pure function of the doc key)
    val dir2 = corpusWithSource(rows ++ (100L until 150L).map(i =>
      (i, s"doc number $i content", "en", "big")))
    val got2 = SparkEntry.queries("q133_stratum_sample_k")(spark, dir2)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    Caches.release(spark)
    assert(got2.filter(_._1 == "mid").map(_._2).toSet ===
      bySrc("mid").map(_._3).toSet)
  }

  test("q130 exemplars: the k best per stratum, quality-ordered, ties by id") {
    // reuse the q124 two-strata shape: A docs (even ids) all quality
    // 0.6, B docs (odd ids) all 0.12 — within-source ties resolve by
    // doc_id, so each source's exemplars are its three smallest ids
    def words(i: Long, n: Int) =
      (0 until n).map(j => s"w${i}x$j").mkString(" ")
    val rows = (0L until 10L).map { i =>
      val n = if (i % 2 == 0) 50 else 10
      (i, words(i, n), "en", if (i % 2 == 0) "A" else "B")
    }
    val dir = corpusWithSource(rows)
    val got = SparkEntry.queries("q130_source_exemplars")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    Caches.release(spark)
    assert(got === Set(
      ("A", 1L, 0L), ("A", 2L, 2L), ("A", 3L, 4L),
      ("B", 1L, 1L), ("B", 2L, 3L), ("B", 3L, 5L)), got)
  }

  test("q147 chunk mixing: interleaved sources read 2 per chunk, one source reads 1") {
    // q119's geometry (200 docs x 7 tokens = 3 chunks) with sources
    // alternating per doc: every chunk spans ~73 docs, so every chunk
    // mixes exactly the two sources
    val mixed = corpusWithSource((0L until 200L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta", "en",
        if (i % 2 == 0) "A" else "B")))
    val got = SparkEntry.queries("q147_chunk_mixing")(spark, mixed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.release(spark)
    assert(got === Map(2L -> 3L), got)
    // a single-source corpus can only ever read 1
    val mono = corpusWithSource((0L until 200L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta", "en", "A")))
    val got2 = SparkEntry.queries("q147_chunk_mixing")(spark, mono)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.release(spark)
    assert(got2 === Map(1L -> 3L), got2)
  }

  test("q146 shape grid: octave and decile cells land exactly, top decile clamps") {
    // 4 non-stop tokens: len_log2 2, quality 0.048 -> decile 0;
    // 50 non-stop tokens: len_log2 5, quality 0.6 -> decile 6;
    // 50 stopwords: quality exactly 1.0 -> floor(10) clamps to decile 9
    def words(tag: String, n: Int) =
      (0 until n).map(j => s"${tag}x$j").mkString(" ")
    val dir = corpus(Seq(
      (0L, words("a", 4), "en"),
      (1L, words("b", 50), "en"),
      (2L, Seq.fill(50)("the").mkString(" "), "en")))
    val got = SparkEntry.queries("q146_length_quality_grid")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    Caches.release(spark)
    assert(got === Map((2L, 0L) -> 1L, (5L, 6L) -> 1L, (5L, 9L) -> 1L), got)
  }

  test("q142 discounted budget: near-dup copies admit cheap, quality still orders") {
    // three verbatim 30-token docs (one cluster: weight 333333 ppm ->
    // effective 9 each), two unique 30-token docs (effective 30), one
    // 50-token top-quality doc (effective 50). Effective total 137,
    // budget 68. Order: id 9 (quality 0.6) first at cum 50, then the
    // 0.36 tie group by doc_id: 0 -> 59, 1 -> 68 (= budget, in),
    // 2 -> 77 (out) — the whole near-dup cluster nearly fits because
    // the discount makes copies cost ~a third of one document.
    def words(tag: String, n: Int) =
      (0 until n).map(j => s"${tag}x$j").mkString(" ")
    val dup = words("d", 30)
    val dir = corpus(Seq(
      (0L, dup, "en"), (1L, dup, "en"), (2L, dup, "en"),
      (3L, words("u", 30), "en"), (4L, words("v", 30), "en"),
      (9L, words("t", 50), "en")))
    val got = SparkEntry.queries("q142_discounted_budget")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    Caches.release(spark)
    assert(got.keySet === Set(9L, 0L, 1L), got)
    assert(got(9L) === ((50L, 0.6)))
    assert(got(0L)._1 === 9L && got(1L)._1 === 9L)
  }

  test("q139 attributes contamination to the max-overlap bench doc, ties low") {
    // doc ids divisible by 97 are the benchmark set: bench A (id 0)
    // shares THREE 8-grams with train doc 1, bench B (id 97) shares
    // ONE — attribution must name A; the clean train doc 2 is absent
    val aw = (1 to 10).map(i => s"aw$i").mkString(" ")
    val bw = (1 to 10).map(i => s"bw$i").mkString(" ")
    val train = aw + " " + (1 to 8).map(i => s"bw$i").mkString(" ")
    val dir = corpus(Seq(
      (0L, aw, "en"), (97L, bw, "en"),
      (1L, train, "en"),
      (2L, "totally unrelated clean content with no shared grams at all", "en")))
    val got = SparkEntry.queries("q139_contam_attribution")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    Caches.release(spark)
    assert(got === Map(1L -> ((0L, 3L))), got)
  }

  test("q129 checksum matches an independent reimplementation and counts the manifest") {
    // fold the collected q121 manifest through a from-scratch sha-256
    // 60-bit hash + modular sum — if the operator's hash keying, row
    // rendering, or modulus drifts, this breaks
    val dir = corpus((0L until 150L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta", "en")))
    val manifest = SparkEntry.queries("q121_shuffled_manifest")(spark, dir)
      .collect()
    Caches.release(spark)
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val p = BigInt(2305843009213693951L)
    val want = manifest.map { r =>
      BigInt(h60((0 to 5).map(r.getLong).mkString("#") +
        s"#${Curation.ChecksumSeed}"))
    }.sum.mod(p).toLong
    val got = SparkEntry.queries("q129_manifest_checksum")(spark, dir)
      .collect()
    Caches.release(spark)
    assert(got.length === 1)
    assert(got.head.getLong(0) === manifest.length.toLong, "n_rows")
    assert(got.head.getLong(1) === want, "checksum")
  }

  test("q118 priority sample favors heavy documents and is deterministic") {
    // 100 one-token docs vs 100 fifty-token docs: every heavy doc's
    // priority lands under 2^60/50 while a light doc only gets there
    // with probability 1/50 — the k=100 race should be nearly all heavy
    val rows = (0 until 200).map { i =>
      val t = if (i < 100) "solo" else ("w " * 50).trim
      (i.toLong, t, "en")
    }
    val dir = corpus(rows)
    val a = SparkEntry.queries("q118_priority_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.length === 100)
    val heavy = a.count(_._2 == 50L)
    assert(heavy > 70, s"size-weighted sample took only $heavy heavy docs")
    val b = SparkEntry.queries("q118_priority_sample")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
    Caches.release(spark)
  }

  test("q113 matches the reference cumsum with TRAINED tokens as the mass") {
    // q58's ranking, q90's unit: the reference selection ranks by the
    // same quality but charges each doc its ENCODED length (fetched
    // from the already-spec'd q90), so any drift between the mass
    // column and the trained unit breaks this equality
    val rows = (0 until 30).map { i =>
      val text = ("the " * (i % 4)) + (s"word$i " * (3 + i % 5))
      (i.toLong, text.trim)
    }
    val dir = corpus(rows.map { case (id, t) => (id, t, "en") })
    val bpe = SparkEntry.queries("q90_bpe_encode")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Caches.release(spark)
    val scored = rows.flatMap { case (id, t) => score(t).map(s => (id, s._2)) }
      .filter { case (id, _) => bpe.getOrElse(id, 0L) > 0 }
    val budget = scored.map(x => bpe(x._1)).sum / 2
    var cum = 0L
    val want = scored.sortBy { case (id, q) => (-q, id) }
      .flatMap { case (id, _) =>
        cum += bpe(id); if (cum <= budget) Some(id) else None }.toSet
    val out = SparkEntry.queries("q113_trained_budget")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === want)
    // the emitted mass IS the trained count, and the trained unit
    // genuinely differs from whitespace somewhere in the selection
    out.foreach { case (id, n) => assert(n === bpe(id)) }
    assert(out.exists { case (id, n) => n != score(rows(id.toInt)._2).get._1 },
      "trained and whitespace counts coincide everywhere — unit untested")
    Caches.release(spark)
  }

  test("q58 all-null corpus (zero tokenizable docs) selects nothing") {
    val dir = corpus(Seq((0L, null.asInstanceOf[String], "en"),
      (1L, null.asInstanceOf[String], "en")))
    assert(SparkEntry.queries("q58_token_budget")(spark, dir).count() === 0L)
    Caches.release(spark)
  }

  // ----------------------------------------------------------------- q72

  test("q72 packing conserves mass and matches the reference concat-and-chunk") {
    // 20 docs of 7 tokens in doc_id order = a 140-token stream cut every
    // 512 → one chunk holding everything; then a corpus big enough to
    // cross boundaries: 100 docs × 37 tokens = 3700 tokens → chunks
    // 0..7, verified against an independently computed reference fold.
    val small = corpus((0L until 20L).map(i =>
      (i, "uniform text of exactly seven small tokens", "en")))
    val one = SparkEntry.queries("q72_sequence_pack")(spark, small).collect()
    assert(one.length === 1)
    assert(one.head.getAs[Long]("chunk_id") === 0L)
    assert(one.head.getAs[Long]("n_docs") === 20L)
    assert(one.head.getAs[Long]("tokens_started") === 140L)
    Caches.release(spark)

    val big = corpus((0L until 100L).map(i =>
      (i, Seq.fill(37)("tok").mkString(" "), "en")))
    val got = SparkEntry.queries("q72_sequence_pack")(spark, big)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_started"),
          r.getAs[Long]("n_straddlers"), r.getAs[Long]("max_span")))
      .toMap
    // reference: sequential fold over doc_id order
    val cap = 512L
    var cum = 0L
    val ref = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    for (_ <- 0 until 100) {
      val start = cum; cum += 37
      val first = start / cap
      val span = (cum - 1) / cap - first + 1
      val (d, t, s, m) = ref.getOrElse(first, (0L, 0L, 0L, 0L))
      ref(first) = (d + 1, t + 37, s + (if (span > 1) 1L else 0L),
        math.max(m, span))
    }
    assert(got === ref.toMap)
    // conservation: every token is started exactly once
    assert(got.values.map(_._2).sum === 3700L)
    assert(got.values.map(_._1).sum === 100L)
    Caches.release(spark)
  }

  // ----------------------------------------------------------------- q81

  test("q81 positions are a permutation, deterministic, and hash-ordered") {
    val dir = corpus((0L until 50L).map(i => (i, s"doc $i", "en")))
    val got = SparkEntry.queries("q81_epoch_shuffle")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // a bijection onto 0..n-1 — no position dropped or doubled
    assert(got.map(_._2).sorted.toSeq === (0L until 50L))
    // not the identity order (the permutation actually shuffles)
    assert(got.sortBy(_._2).map(_._1).toSeq !== (0L until 50L).toSeq)
    // reproducible: a second run returns the identical permutation
    Caches.release(spark)
    val again = SparkEntry.queries("q81_epoch_shuffle")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    Caches.release(spark)
  }

  // ----------------------------------------------------------------- q82

  test("q82 packs the q81 permutation: matches the reference fold in shuffled order") {
    // variable-length docs so corpus order and shuffled order produce
    // DIFFERENT chunk profiles — the composition must follow the latter
    val rows = (0L until 100L).map(i =>
      (i, Seq.fill((i % 53 + 1).toInt)("tok").mkString(" "), "en"))
    val dir = corpus(rows)
    val pos = SparkEntry.queries("q81_epoch_shuffle")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.release(spark)
    // reference: sequential concat-and-chunk fold in POSITION order
    val nTok = rows.map { case (i, t, _) => i -> t.split(" ").length.toLong }.toMap
    val cap = 512L
    var cum = 0L
    val ref = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long)]
    for (i <- rows.map(_._1).sortBy(pos)) {
      val n = nTok(i)
      val start = cum; cum += n
      val first = start / cap
      val span = (cum - 1) / cap - first + 1
      val (d, t, s, m) = ref.getOrElse(first, (0L, 0L, 0L, 0L))
      ref(first) = (d + 1, t + n, s + (if (span > 1) 1L else 0L),
        math.max(m, span))
    }
    val got = SparkEntry.queries("q82_shuffled_pack")(spark, dir)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_started"),
          r.getAs[Long]("n_straddlers"), r.getAs[Long]("max_span")))
      .toMap
    assert(got === ref.toMap)
    // every token started exactly once, same mass as corpus-order packing
    assert(got.values.map(_._2).sum === nTok.values.sum)
    Caches.release(spark)
    // the shuffle is observable: the per-chunk profile differs from
    // corpus-order packing on this corpus (deterministic fixture+seed)
    val inOrder = SparkEntry.queries("q72_sequence_pack")(spark, dir)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_started"),
          r.getAs[Long]("n_straddlers"), r.getAs[Long]("max_span")))
      .toMap
    assert(got !== inOrder, "shuffled-order packing must not equal corpus order")
    Caches.release(spark)
  }

  // ----------------------------------------------------------------- q85

  test("q85 positions are a bijection in easy-first (quality DESC, doc_id) order") {
    // variable-length docs so quality actually varies (length score);
    // same-length docs tie on quality and exercise the doc_id tie-break.
    // (A whitespace-only doc still tokenizes to one empty token under the
    // shared tokenizer — the q58/q80 convention — so nothing drops here.)
    val rows = (0L until 60L).map(i =>
      (i, Seq.fill((i % 19 + 1).toInt)("the").mkString(" "), "en"))
    val dir = corpus(rows)
    val got = SparkEntry.queries("q85_curriculum_order")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"),
        r.getAs[Long]("pos")))
    Caches.release(spark)
    assert(got.length === 60, "every tokenizable doc gets a position")
    // a bijection onto 0..n-1
    assert(got.map(_._3).sorted.toSeq === (0L until got.length))
    // positions follow the global easy-first order exactly
    val expected = got.sortBy { case (id, q, _) => (-q, id) }.map(_._1).toSeq
    assert(got.sortBy(_._3).map(_._1).toSeq === expected)
    // reproducible across runs
    val again = SparkEntry.queries("q85_curriculum_order")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    assert(got.map(t => t._1 -> t._3).sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    Caches.release(spark)
  }

  // ----------------------------------------------------------------- q86

  test("q86 source minhash: identical sources estimate 1, disjoint near 0") {
    // sources A and B hold the same texts (signature equality is exact —
    // the union property collapses them to identical source signatures);
    // source C shares no vocabulary at all
    val rows =
      (0L until 20L).map(i => (i, s"alpha beta gamma delta w${i % 5} x y z", "en", "A")) ++
      (20L until 40L).map(i => (i, s"alpha beta gamma delta w${(i - 20) % 5} x y z", "en", "B")) ++
      (40L until 60L).map(i => (i, s"umber vermilion woad q${i % 5} k l m", "en", "C"))
    val dir = corpusWithSource(rows)
    val got = SparkEntry.queries("q86_source_minhash")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_match"), r.getAs[Double]("est_jaccard"))).toMap
    assert(got.keySet === Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) === ((12L, 1.0)), s"identical sources: ${got(("A", "B"))}")
    assert(got(("A", "C"))._1 < 12L && got(("B", "C"))._1 < 12L,
      s"disjoint-vocabulary sources must not fully match: $got")
  }

  // ----------------------------------------------------------------- q59

  test("q59 downsamples every stratum toward the smallest, keeping lang labels") {
    val rows = (0L until 90L).map(i =>
      (i, s"text $i", if (i < 60) "en" else if (i < 80) "de" else "fr"))
    val dir = corpus(rows)
    val got = SparkEntry.queries("q59_stratified_sample")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byLang = got.groupBy(_._2).view.mapValues(_.length).toMap
    // the smallest stratum (fr, 10 docs) is kept whole: hash % n_l < n_l
    assert(byLang.getOrElse("fr", 0) === 10)
    // larger strata are strict subsets (rate target/n_l < 1 admits fewer)
    assert(byLang.getOrElse("en", 0) < 60)
    assert(byLang.getOrElse("de", 0) < 20)
    // membership is deterministic: a second run returns the identical set
    val again = SparkEntry.queries("q59_stratified_sample")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }
}
