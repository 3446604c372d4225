package graft.streaming

import graft.SparkTestSession
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class DocStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // ~28 English stopword tokens → lang en, quality ≈ 0.4 + 0.6·(28/50) > 0.5
  private val goodEn = Seq.fill(4)("the and of to in is a").mkString(" ")
  private val spanish = Seq.fill(4)("el la de que y en un").mkString(" ")
  private val junk = "zzz"

  test("prep stream dedups on content hash, keeps quality English docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.prep(mem.toDF().toDF("doc_id", "ingest_ts", "text"))
      .writeStream.format("memory").queryName("prep").outputMode("append").start()
    try {
      mem.addData((0L, ts(1), goodEn), (1L, ts(2), spanish), (2L, ts(3), junk))
      q.processAllAvailable()
      mem.addData((10L, ts(4), goodEn), (11L, ts(5), goodEn + " extra"))
      q.processAllAvailable()
      val got = spark.table("prep").select("doc_id")
        .as[Long].collect().toSet
      // doc 0 passes; 1 is Spanish, 2 is junk-quality; 10 is a duplicate of
      // 0's content (dedup state holds its hash); 11 is new and passes
      assert(got == Set(0L, 11L))
      val row = spark.table("prep").filter($"doc_id" === 0L).head()
      assert(row.getAs[Long]("n_tokens") == 28L)
      assert(row.getAs[Double]("quality") > 0.5)
    } finally q.stop()
  }

  test("quantileSketch streams q66's admitted histogram (same admission, bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 1200 docs across two batches at modulus 3 — the hash really
    // rejects ~2/3, and a streamed histogram must equal the batch
    // operator's over the identical rows (streaming execution changes
    // nothing: admission is key-pure, the aggregation is the same)
    val rows = (0L until 1200L).map { i =>
      (i, ts(i % 60), if (i % 2 == 0) "en" else "de", (i * 2654435761L) % 300L)
    }
    val mem = MemoryStream[(Long, Timestamp, String, Long)]
    val q = DocStream.quantileSketch(
        mem.toDF().toDF("doc_id", "ingest_ts", "lang", "n_chars"), admissionMod = 3L)
      .writeStream.format("memory").queryName("qsketch")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(700))
      q.processAllAvailable()
      mem.addData(rows.drop(700))
      q.processAllAvailable()
      val got = spark.table("qsketch")
        .as[(String, Long, Long)].collect().toSet
      val want = graft.queries.TextAnalysis.sampledLengthHist(
          rows.toDF("doc_id", "ingest_ts", "lang", "n_chars"), 3L)
        .as[(String, Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty,
        "streamed histogram must equal the batch derivation on the same rows")
      // the admission hash really sampled: far fewer admitted than docs
      val admitted = got.toSeq.map(_._3).sum
      assert(admitted > 200 && admitted < 600, s"~1/3 expected, got $admitted")
      // state bound is the VALUE space: ≤ langs × distinct lengths
      assert(got.size <= 2 * 300)
    } finally q.stop()
  }

  test("vocabSketch streams q53's register table (same derivation, bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = DocStream.vocabSketch(
        mem.toDF().toDF("doc_id", "ingest_ts", "lang", "text"))
      .writeStream.format("memory").queryName("vocab")
      .outputMode("complete").start()
    try {
      val rows = Seq(
        (0L, ts(1), "en", goodEn), (1L, ts(2), "es", spanish),
        (2L, ts(3), "en", goodEn + " extra tokens here"))
      mem.addData(rows.take(2))
      q.processAllAvailable()
      mem.addData(rows.drop(2))
      q.processAllAvailable()
      val got = spark.table("vocab")
        .as[(String, Long, Long)].collect().toSet
      val want = graft.queries.TextAnalysis.hllRegisters(
          rows.toDF("doc_id", "ingest_ts", "lang", "text")
            .select($"lang", org.apache.spark.sql.functions.explode(
              graft.functions.TextFunctions.tokens($"text")).as("tok")))
        .as[(String, Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty,
        "streaming register table must equal the batch derivation on the same rows")
      // monotone-state contract: register count is bounded by langs × 64
      assert(got.size <= 2 * 64)
    } finally q.stop()
  }

  test("sourceMinhash streams q86's register table (minhash union property, bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = DocStream.sourceMinhash(
        mem.toDF().toDF("doc_id", "ingest_ts", "source", "text"))
      .writeStream.format("memory").queryName("srcmh")
      .outputMode("complete").start()
    try {
      // two sources, overlapping shingles, plus a gram-less short doc
      // (filtered by the null-signature guard on both paths); the
      // cross-batch-boundary rows must fold into the SAME registers
      val rows = Seq(
        (0L, ts(1), "crawlA", goodEn),
        (1L, ts(2), "crawlB", goodEn + " with different tail tokens"),
        (2L, ts(3), "crawlA", spanish),
        (3L, ts(4), "crawlB", "too short"),
        (4L, ts(5), "crawlA", goodEn + " more overlap in this batch"))
      mem.addData(rows.take(3))
      q.processAllAvailable()
      mem.addData(rows.drop(3))
      q.processAllAvailable()
      val got = spark.table("srcmh")
        .as[(String, Int, Long)].collect().toSet
      val want = graft.queries.Similarity.sourceSigRegisters(
          graft.queries.Similarity.sourceDocSigs(
            rows.toDF("doc_id", "ingest_ts", "source", "text")))
        .as[(String, Int, Long)].collect().toSet
      assert(got == want && got.nonEmpty,
        "streamed registers must equal the batch derivation on the same rows")
      // monotone-MIN state contract: exactly |sources| × 12 registers
      assert(got.size == 2 * 12)
    } finally q.stop()
  }

  test("bpeEncoded streams q90's counts under a batch-trained merge table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train on a static corpus (the batch job), then stream the SAME
    // docs through the frozen merges — counts must equal batch q90's,
    // including the partially-merged word and the null-text 0/0 row
    val texts = Seq("ab ab ab", "abc abc", "xy", "abx",
      null.asInstanceOf[String])
    val dir = java.nio.file.Files.createTempDirectory("graft-bpestream").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val merges = graft.SparkEntry.queries("q87_bpe_merges")(spark, dir)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.Caches.release(spark)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.bpeEncoded(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), merges)
      .writeStream.format("memory").queryName("bpeenc")
      .outputMode("append").start()
    try {
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, ts(i), t) }
      mem.addData(rows.take(2))
      q.processAllAvailable()
      mem.addData(rows.drop(2))
      q.processAllAvailable()
      val got = spark.table("bpeenc")
        .as[(Long, Long, Long)].collect().toSet
      val want = graft.SparkEntry.queries("q90_bpe_encode")(spark, dir)
        .as[(Long, Long, Long)].collect().toSet
      graft.Caches.release(spark)
      assert(got == want && got.size == texts.size,
        s"stream $got must equal batch q90 $want")
    } finally q.stop()
  }

  test("fertilityRegisters stream the batch q126 card under frozen merges") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train on the static corpus, stream the SAME docs across a batch
    // boundary: registers + the shared fertilityPm Column must equal the
    // batch card exactly, incl. dropping the null-text doc
    val rows = Seq((0L, "ab ab ab", "A"), (1L, "abc abc", "A"),
      (2L, "xy", "B"), (3L, "abx", "B"), (4L, null.asInstanceOf[String], "B"))
    val dir = java.nio.file.Files.createTempDirectory("graft-fert").toString
    rows.toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val merges = graft.SparkEntry.queries("q87_bpe_merges")(spark, dir)
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.Caches.release(spark)
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = DocStream.fertilityRegisters(
        mem.toDF().toDF("doc_id", "ingest_ts", "text", "source"), merges)
      .writeStream.format("memory").queryName("fertreg")
      .outputMode("complete").start()
    try {
      val data = rows.zipWithIndex.map { case ((id, t, s), i) =>
        (id, ts(i.toLong), t, s) }
      mem.addData(data.take(2))
      q.processAllAvailable()
      mem.addData(data.drop(2))
      q.processAllAvailable()
      val got = spark.table("fertreg")
        .withColumn("fertility_pm", graft.queries.TextAnalysis.fertilityPm)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      val want = graft.SparkEntry.queries("q126_tokenizer_fertility")(spark, dir)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      graft.Caches.release(spark)
      assert(got == want && got.size == 2,
        s"stream $got must equal batch q126 $want")
    } finally q.stop()
  }

  test("qualityFiltered streams the batch q45 verdicts (same rule Columns)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val passText = Seq.fill(10)("the data with more words here").mkString(" ")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.qualityFiltered(mem.toDF().toDF("doc_id", "ingest_ts", "text"))
      .writeStream.format("memory").queryName("qf").outputMode("append").start()
    try {
      mem.addData((0L, ts(1), passText), (1L, ts(2), "too short"),
        (2L, ts(3), Seq.fill(20)("data words code").mkString(" "))) // no stopwords
      q.processAllAvailable()
      val got = spark.table("qf").select("doc_id").as[Long].collect().toSet
      assert(got == Set(0L))
      // the surviving row keeps the stream's own columns, rules dropped
      assert(spark.table("qf").columns.toSeq == Seq("doc_id", "ingest_ts", "text"))
    } finally q.stop()
  }

  test("split streams q56's assignment (same Columns, stateless)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 60L).map(i => (i, ts(i), s"document body $i"))
    // batch expectation: q56 over the same doc_ids in the testdata layout
    val dir = java.nio.file.Files.createTempDirectory("graft-split").toString
    rows.map { case (id, _, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q56_hash_split")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.split(mem.toDF().toDF("doc_id", "ingest_ts", "text"))
      .writeStream.format("memory").queryName("split").outputMode("append").start()
    try {
      mem.addData(rows.take(30))
      q.processAllAvailable()
      mem.addData(rows.drop(30)) // a second batch must not move anything
      q.processAllAvailable()
      val got = spark.table("split")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(got == want, "stream and batch q56 must assign identical splits")
      // every stream column survives alongside the two assignments
      assert(spark.table("split").columns.toSeq ==
        Seq("doc_id", "ingest_ts", "text", "bucket", "split"))
    } finally q.stop()
  }

  test("budgetAdmitted: one shard, one batch == batch q58 at the same budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // CurationSpec's mixed-quality construction: repeated (stops, len)
    // pairs → multi-doc quality tie groups, boundary inside one
    val rows = (0 until 30).map { i =>
      val text = ("the " * (i % 4)) + (s"word$i " * (3 + i % 5))
      (i.toLong, ts(i), text.trim)
    }
    val docs = rows.map { case (id, _, t) => (id, t, "en") }
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft-budget").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q58_token_budget")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    graft.Caches.release(spark)
    // q58's own budget derivation: half the corpus token mass
    val budget = graft.queries.Curation.scoredTokens(docs)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0) / 2
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.budgetAdmitted(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), budget, shards = 1)
      .writeStream.format("memory").queryName("budget1").outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      val got = spark.table("budget1").select("doc_id").as[Long].collect().toSet
      assert(got == want,
        "single-shard single-batch admission must equal the batch q58 selection")
    } finally q.stop()
  }

  test("dsirAdmitted: one shard, one batch == batch q107 at the same budget") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a 4-word vocabulary that is COLLISION-FREE in the hashed buckets
    // (alpha/beta/gamma/delta land in buckets 345/142/780/905 — the
    // w0..w3 naming scheme collides: w1 and w3 share bucket 809), so
    // frozen-vector importance == q106's exact ranks and the stream can
    // match batch q107; several importance groups, repeated
    // (word, length) pairs
    val vocab = Seq("alpha", "beta", "gamma", "delta")
    val rows = (0 until 30).map { i =>
      val src = if (i % 3 == 0) "src0" else "web"
      (i.toLong, (s"${vocab(i % 4)} " * (3 + i % 5)).trim, src)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-dsiradmit").toString
    rows.toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q107_dsir_select")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    graft.Caches.release(spark)
    // q107's own budget derivation: a quarter of the tokenizable mass
    val budget = graft.SparkEntry.queries("q106_dsir_weights")(spark, dir)
      .filter($"n_tokens" > 0)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0) / 4
    graft.Caches.release(spark)
    val warr = DocStream.dsirWeightVector(rows.toDF("doc_id", "text", "source"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.dsirAdmitted(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), warr, budget, shards = 1)
      .writeStream.format("memory").queryName("dsira").outputMode("append").start()
    try {
      mem.addData(rows.map { case (id, t, _) => (id, ts(id), t) })
      q.processAllAvailable()
      val got = spark.table("dsira").select("doc_id").as[Long].collect().toSet
      assert(got == want,
        "single-shard single-batch DSIR admission must equal the batch q107 selection")
      assert(spark.table("dsira").columns.toSeq ==
        Seq("doc_id", "n_tokens", "importance"))
    } finally q.stop()
  }

  test("budgetAdmitted: sharded (default-path) admission keeps the global cap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 docs × 7 tokens over 4 shards, budget 100 → per-shard caps
    // sum exactly to 100 (integer split), so the global hard cap holds
    // no matter how the hash spreads arrivals over shards
    val rows = (0L until 40L).map(i =>
      (i, ts(i), "alpha beta gamma delta epsilon zeta eta"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.budgetAdmitted(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), 100L, shards = 4)
      .writeStream.format("memory").queryName("budget4").outputMode("append").start()
    try {
      mem.addData(rows)
      q.processAllAvailable()
      val got = spark.table("budget4")
        .select("doc_id", "n_tokens").as[(Long, Long)].collect()
      assert(got.map(_._2).sum <= 100L, s"global cap: ${got.toSeq}")
      assert(got.nonEmpty, "some shard must admit")
      // deterministic: replaying the same stream admits the same set
      val mem2 = MemoryStream[(Long, Timestamp, String)]
      val q2 = DocStream.budgetAdmitted(
          mem2.toDF().toDF("doc_id", "ingest_ts", "text"), 100L, shards = 4)
        .writeStream.format("memory").queryName("budget4b").outputMode("append").start()
      try {
        mem2.addData(rows)
        q2.processAllAvailable()
        val again = spark.table("budget4b")
          .select("doc_id", "n_tokens").as[(Long, Long)].collect()
        assert(got.map(_._1).toSet == again.map(_._1).toSet)
      } finally q2.stop()
    } finally q.stop()
  }

  test("budgetAdmitted: the budget is a hard cap and exhaustion is permanent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val seven = "alpha beta gamma delta epsilon zeta eta" // 7 tokens each
    val tiny = "tiny doc here"                            // 3 tokens
    val mem = MemoryStream[(Long, Timestamp, String)]
    // budget 20: docs 0,1 admit (14), doc 2 overflows (21) and closes the
    // shard; the later 3-token doc WOULD fit (17 ≤ 20) but q58 semantics
    // admit a prefix, never a tail-biased backfill
    val q = DocStream.budgetAdmitted(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), 20L, shards = 1)
      .writeStream.format("memory").queryName("budget2").outputMode("append").start()
    try {
      mem.addData((0L, ts(1), seven), (1L, ts(2), seven), (2L, ts(3), seven))
      q.processAllAvailable()
      mem.addData((3L, ts(4), tiny))
      q.processAllAvailable()
      val got = spark.table("budget2")
        .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
      assert(got.keySet == Set(0L, 1L), s"admitted: $got")
      assert(got.values.sum <= 20L, "the cap is hard")
    } finally q.stop()
  }

  test("decontaminated streams q57's verdicts against a static eval set") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gram8 = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    // CurationSpec's planted-contamination corpus: doc 0 is the eval
    // side (doc_id % 97 == 0), doc 1 copies the full 8-gram, doc 2
    // shares only a 7-word run, doc 3 nothing, doc 4 is null text
    val all = Seq(
      (0L, s"benchmark prompt says $gram8 and stops"),
      (1L, s"training document copies $gram8 verbatim today"),
      (2L, "training alpha beta gamma delta epsilon zeta eta OMEGA"),
      (3L, "completely unrelated training text about nothing much"),
      (4L, null.asInstanceOf[String]))
    // batch expectation: q57 over the same corpus in the testdata layout
    val dir = java.nio.file.Files.createTempDirectory("graft-decon").toString
    all.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q57_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    graft.Caches.release(spark)
    // static eval-set gram relation, built with the SAME shared stage
    val benchGrams = graft.queries.Curation.gramStage(
        all.take(1).toDF("doc_id", "text"), Seq.empty)
      .select(org.apache.spark.sql.functions.explode($"g8").as("g"))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.decontaminated(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), benchGrams)
      .writeStream.format("memory").queryName("decon").outputMode("append").start()
    try {
      mem.addData(all.drop(1).map { case (id, t) => (id, ts(id), t) })
      q.processAllAvailable()
      val got = spark.table("decon")
        .select("doc_id", "n_overlap", "contaminated")
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want + (4L -> ((0L, false))),
        s"stream verdicts must match batch q57 (plus the null-text doc): got $got want $want")
      // every stream column survives beside the two verdict columns
      assert(spark.table("decon").columns.toSeq ==
        Seq("doc_id", "ingest_ts", "n_overlap", "contaminated"))
    } finally q.stop()
  }

  test("bloomDecontaminated streams q102's verdicts against the frozen filter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gram8 = "alpha beta gamma delta epsilon zeta eta theta" // 8 words
    val all = Seq(
      (0L, s"benchmark prompt says $gram8 and stops"),
      (1L, s"training document copies $gram8 verbatim today"),
      (2L, "training alpha beta gamma delta epsilon zeta eta OMEGA"),
      (3L, "completely unrelated training text about nothing much"),
      (4L, null.asInstanceOf[String]))
    // batch expectation: q102 over the same corpus in the testdata layout
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomd").toString
    all.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q102_bloom_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    graft.Caches.release(spark)
    // frozen filter from the eval side, via the SAME shared stage
    val bloom = DocStream.benchBloom(
      graft.queries.Curation.gramStage(all.take(1).toDF("doc_id", "text"), Seq.empty)
        .select(org.apache.spark.sql.functions.explode($"g8").as("g")).distinct())
    assert(bloom.length == 2048 && bloom.exists(_ != 0L))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.bloomDecontaminated(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), bloom)
      .writeStream.format("memory").queryName("bloomd").outputMode("append").start()
    try {
      mem.addData(all.drop(1).map { case (id, t) => (id, ts(id), t) })
      q.processAllAvailable()
      val got = spark.table("bloomd")
        .select("doc_id", "n_maybe", "maybe_contaminated")
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want + (4L -> ((0L, false))),
        s"stream verdicts must match batch q102 (plus the null-text doc): got $got want $want")
      assert(spark.table("bloomd").columns.toSeq ==
        Seq("doc_id", "ingest_ts", "n_maybe", "maybe_contaminated"))
    } finally q.stop()
  }

  test("bloomScrubbed streams q108's scrub against the frozen shared-gram filter") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // SpanScrubSpec's planted corpus: a shared phrase that must cut, a
    // doc it fully covers, an untouched doc, a null payload
    val rows = Seq(
      (1L, "x1 x2 p q r s t u y1"),
      (2L, "p q r s t u z1 z2 z3"),
      (3L, "totally different words here now"),
      (4L, null.asInstanceOf[String]))
    val dir = java.nio.file.Files.createTempDirectory("graft-bscrub").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q108_scrub_apply")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getString(2))))).toMap
    graft.Caches.release(spark)
    val bloom = DocStream.sharedGramBloom(rows.toDF("doc_id", "text"))
    assert(bloom.exists(_ != 0L))
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.bloomScrubbed(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), bloom)
      .writeStream.format("memory").queryName("bscrub").outputMode("append").start()
    try {
      mem.addData(rows.take(2).map { case (id, t) => (id, ts(id), t) })
      q.processAllAvailable()
      mem.addData(rows.drop(2).map { case (id, t) => (id, ts(id), t) })
      q.processAllAvailable()
      val got = spark.table("bscrub")
        .select("doc_id", "retained_tokens", "scrubbed_text")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), Option(r.getString(2))))).toMap
      // one-sided dominance always holds: the filter has no false
      // negatives, so the stream can only scrub MORE
      got.foreach { case (id, (ret, _)) =>
        assert(ret <= want(id)._1, s"doc $id: stream retained $ret > batch")
      }
      // and on this corpus (no false positive in the probe set) the
      // scrub is exactly batch q108's
      assert(got == want,
        s"stream scrub must match batch q108: got $got want $want")
      assert(spark.table("bscrub").columns.toSeq ==
        Seq("doc_id", "ingest_ts", "retained_tokens", "scrubbed_text"))
    } finally q.stop()
  }

  test("dsirScored streams q109's importance against the frozen weight vector") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "alpha alpha beta gamma", "src0"),
      (2L, "beta gamma delta delta", "web"),
      (3L, "omega psi chi phi", "web"),
      (4L, null.asInstanceOf[String], "web"))
    // batch expectation: q109 over the same corpus in the testdata layout
    val dir = java.nio.file.Files.createTempDirectory("graft-dsirstream").toString
    rows.toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q109_dsir_hashed")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    graft.Caches.release(spark)
    // frozen vector from the reference corpus, via the SAME bucket stage
    val warr = DocStream.dsirWeightVector(
      rows.toDF("doc_id", "text", "source"))
    assert(warr.length == graft.queries.TextAnalysis.DsirBuckets)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.dsirScored(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), warr)
      .writeStream.format("memory").queryName("dsirs").outputMode("append").start()
    try {
      // two micro-batches: scores must not depend on the boundary
      mem.addData(rows.take(2).map { case (id, t, _) => (id, ts(id), t) })
      q.processAllAvailable()
      mem.addData(rows.drop(2).map { case (id, t, _) => (id, ts(id), t) })
      q.processAllAvailable()
      val got = spark.table("dsirs")
        .select("doc_id", "n_tokens", "sum_bits", "mean_importance_bits")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      assert(got == want,
        s"stream scores must match batch q109: got $got want $want")
      assert(spark.table("dsirs").columns.toSeq ==
        Seq("doc_id", "ingest_ts", "n_tokens", "sum_bits",
          "mean_importance_bits"))
    } finally q.stop()
  }

  test("nbScored streams q168's verdicts against the frozen model vector") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the QualityFilterSpec rule corpus: doc 0 passes the gate, docs
    // 1-4 fail it in four different ways, doc 5 is null text
    val passText = Seq.fill(10)("the data with more words here").mkString(" ")
    val rows = Seq(
      (0L, passText),
      (1L, "the data with more"),
      (2L, "the with " + Seq.fill(50)("a").mkString(" ")),
      (3L, "the with " + Seq.fill(60)("12345").mkString(" ")),
      (4L, Seq.fill(20)("data words code").mkString(" ")),
      (5L, null.asInstanceOf[String]))
    val dir = java.nio.file.Files.createTempDirectory("graft-nbstream").toString
    rows.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q168_nb_hashed")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) 0L else r.getLong(2),
          if (r.isNullAt(3)) 0L else r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getBoolean(4))))).toMap
    graft.Caches.release(spark)
    val warr = DocStream.nbWeightVector(rows.toDF("doc_id", "text"))
    assert(warr.length == graft.queries.TextAnalysis.NbBuckets)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = DocStream.nbScored(
        mem.toDF().toDF("doc_id", "ingest_ts", "text"), warr)
      .writeStream.format("memory").queryName("nbs").outputMode("append").start()
    try {
      // two micro-batches: verdicts must not depend on the boundary
      mem.addData(rows.take(3).map { case (id, t) => (id, ts(id), t) })
      q.processAllAvailable()
      mem.addData(rows.drop(3).map { case (id, t) => (id, ts(id), t) })
      q.processAllAvailable()
      val got = spark.table("nbs")
        .select("doc_id", "n_tokens", "nb_score", "nb_pass")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getBoolean(3))))).toMap
      assert(got == want,
        s"stream verdicts must match batch q168: got $got want $want")
      assert(spark.table("nbs").columns.toSeq ==
        Seq("doc_id", "ingest_ts", "n_tokens", "nb_score", "nb_pass"))
    } finally q.stop()
  }

  test("sourceTokenCounts streams q100's count state; driftFromCounts replays the report") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "the of and to in the of and to in", "web"),
      (2L, "the of and to in common words too", "web"),
      (3L, "zxqv wmbr kjpl zxqv wmbr kjpl zxqv", "ocr"),
      (4L, "the of zxqv mixed bag of sources here", "ocr"))
    val dir = java.nio.file.Files.createTempDirectory("graft-driftd").toString
    rows.toDF("doc_id", "text", "source").write.parquet(s"$dir/documents.parquet")
    val want = graft.SparkEntry.queries("q100_source_drift")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    graft.Caches.release(spark)
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val q = DocStream.sourceTokenCounts(
        mem.toDF().toDF("doc_id", "ingest_ts", "text", "source"))
      .writeStream.format("memory").queryName("stcounts")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(2).map { case (id, t, s) => (id, ts(id), t, s) })
      q.processAllAvailable()
      mem.addData(rows.drop(2).map { case (id, t, s) => (id, ts(id), t, s) })
      q.processAllAvailable()
      // the emitted state table IS q100's count relation: the
      // vocabulary-sized derivation over it must replay the report
      // (snapshot the memory sink into a plain relation first — the
      // derivation self-joins, which MemoryPlan's shared attribute ids
      // cannot express)
      val state = spark.table("stcounts")
      val snap = spark.createDataFrame(state.collectAsList(), state.schema)
      val got = graft.queries.TextAnalysis
        .driftFromCounts(snap)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
      assert(got == want,
        s"drift from streamed counts must match batch q100: got $got want $want")
    } finally q.stop()
  }

  test("scored matches the batch q17/q18 expressions on the same rows") {
    import spark.implicits._
    val batch = Seq((0L, ts(1), goodEn), (1L, ts(2), spanish), (2L, ts(3), junk))
      .toDF("doc_id", "ingest_ts", "text")
    val got = DocStream.scored(batch)
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "en", 1L -> "es", 2L -> "en")) // junk ties → en priority
  }
}
