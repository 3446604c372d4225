package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Incremental streaming embedding near-dedup: the q39 semantics (band
  * collision + exact cosine ≥ 0.35) applied micro-batch-by-micro-batch
  * against the accumulated survivor index, with DocStream's exactly-once
  * marker protocol.
  */
class EmbedStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // deterministic vectors: dups are exact copies (cosine 1 in every
  // family bucket); distinct gaussians are near-orthogonal at 64-d
  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(64)(rnd.nextGaussian().toFloat)
  }
  private val vA = vec(1)
  private val vC = vec(2)
  private val vE = vec(3)

  test("survivors admit first-seen vectors; cross- and within-batch dups drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-embdedup").toString
    val mem = MemoryStream[(Long, Timestamp, Array[Float])]
    val q = EmbedStream.runNearDedup(
      mem.toDF().toDF("vec_id", "ingest_ts", "embedding"),
      s"$base/index", s"$base/out", s"$base/ckpt")
    try {
      // batch 1: A admitted, B (=A, larger id) dropped within-batch, C admitted
      mem.addData((0L, ts(1), vA), (1L, ts(2), vA), (2L, ts(3), vC))
      q.processAllAvailable()
      // batch 2: D (=A) dropped against the INDEX, E admitted
      mem.addData((10L, ts(4), vA), (11L, ts(5), vE))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select("vec_id").as[Long].collect().toSet
      assert(out == Set(0L, 2L, 11L))
      // the index holds 20 family band rows per admitted vector
      val idx = spark.read.parquet(s"$base/index")
      assert(idx.select("vec_id").as[Long].collect().toSet == Set(0L, 2L, 11L))
      assert(idx.count() == 60)
    } finally q.stop()
  }

  test("ivfAssigned streams the batch cell assignment under frozen centroids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train centroids on a static corpus (incl. a zero vector the q28
    // guard must drop), then stream the SAME vectors across a batch
    // boundary: per-vector cells must equal the shared batch assignment
    val d = Files.createTempDirectory("graft-ivfassign").toString
    val zero = Array.fill(64)(0f)
    val rows = Seq((0L, vA), (1L, vC), (2L, vE), (3L, vA), (4L, zero))
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val cents = graft.queries.Similarity.kmeansCentroids(spark, d)
    val batch = graft.queries.Similarity.assignCells(
      spark.read.parquet(s"$d/embeddings.parquet")
        .selectExpr("vec_id", "embedding",
          "sqrt(aggregate(embedding, 0D, (a, x) -> a + x * x)) AS nrm")
        .filter($"nrm" > 0), cents)
      .as[(Long, Long)].collect().toMap
    graft.Caches.release(spark)
    val mem = MemoryStream[(Long, Timestamp, Array[Float])]
    val q = EmbedStream.ivfAssigned(
        mem.toDF().toDF("vec_id", "ingest_ts", "embedding"), cents)
      .writeStream.format("memory").queryName("ivfassign")
      .outputMode("append").start()
    try {
      mem.addData(rows.take(2).zipWithIndex.map { case ((id, v), i) =>
        (id, ts(i.toLong), v) }: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2).zipWithIndex.map { case ((id, v), i) =>
        (id, ts(10L + i), v) }: _*)
      q.processAllAvailable()
      val got = spark.table("ivfassign").as[(Long, Long)].collect().toMap
      assert(got === batch, s"stream $got must equal batch $batch")
      assert(!got.contains(4L), "the zero-norm arrival must drop")
      assert(got.size === 4)
    } finally q.stop()
  }

  test("stream survivors agree with batch q39 pair semantics on the union corpus") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-embdedup-batch").toString
    Seq((0L, vA, 0), (1L, vA, 0), (2L, vC, 0), (10L, vA, 0), (11L, vE, 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    // 5 vectors derive the same 6 planes/family the stream's default uses
    val pairs = graft.SparkEntry.queries("q39_cosine_neardup_lsh")(spark, d)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(Set((0L, 1L), (0L, 10L), (1L, 10L)).subsetOf(pairs),
      s"q39 must pair the planted duplicates: $pairs")
    // greedy keep-smallest over those pairs = the stream's survivor set
    assert(!pairs.exists { case (a, b) => Set(2L, 11L)(a) || Set(2L, 11L)(b) })
    spark.catalog.clearCache()
  }

  test("a mass-duplicate vector batch admits one representative (pre-band collapse)") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-embdedup-mass").toString
    val batch = ((0L until 200L).map(i => (i, vA)) :+ (999L, vC))
      .toDF("vec_id", "embedding")
    EmbedStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    val out = spark.read.parquet(s"$base/out")
      .select("vec_id").as[Long].collect().toSet
    assert(out == Set(0L, 999L))
    assert(spark.read.parquet(s"$base/index").count() == 40) // 2 × 20 families
  }

  test("redelivery: committed batches no-op; an uncommitted recompute reproduces") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-embdedup-redeliver").toString
    val batch = Seq((0L, vA), (2L, vC)).toDF("vec_id", "embedding")
    def outIds = spark.read.parquet(s"$base/out")
      .select("vec_id").as[Long].collect().toSeq.sorted
    EmbedStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L))
    EmbedStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L)) // committed replay: no-op, no duplicates
    // crash between index write and marker: recompute must exclude its own
    // epoch and reproduce identical survivors, not zero
    Files.delete(java.nio.file.Paths.get(s"$base/index/_commits/0"))
    EmbedStream.processBatch(spark, batch, 0L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L))
    val b1 = Seq((10L, vA), (11L, vE)).toDF("vec_id", "embedding")
    EmbedStream.processBatch(spark, b1, 1L, s"$base/index", s"$base/out")
    assert(outIds == Seq(0L, 2L, 11L))
  }

  test("ADC sidecar: staged+streamed union serves the full re-stage; crash/replay exact; takedown + compaction hold") {
    import spark.implicits._
    val Sim = graft.queries.Similarity
    val d = Files.createTempDirectory("graft-adcsidecar").toString
    val all = (0L until 12L).map(i => (i, vec(i.toInt + 1).toSeq))
    all.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val cents = Sim.kmeansCentroids(spark, d)
    val books = Sim.pqCodebooks(spark, d)
    def codesOf(pred: Long => Boolean) =
      Sim.pqCodes(spark.read.parquet(s"$d/embeddings.parquet")
        .filter($"vec_id".isin(
          all.map(_._1).filter(pred).map(Long.box): _*)), cents, books)
    // the ground truth: one re-stage over the whole corpus
    val truth = Sim.adcTopK(spark, d, codesOf(_ => true), cents, books)
      .collect().map(_.toString).toSeq
    assert(truth.nonEmpty)
    // evens stage; odds arrive as two micro-batches into the sidecar
    val root = s"$d/adc"
    val odd = spark.read.parquet(s"$d/embeddings.parquet")
      .filter($"vec_id" % 2 === 1)
    EmbedStream.processAdcBatch(spark,
      odd.filter($"vec_id" % 4 === 1), 0L, root, cents, books)
    EmbedStream.processAdcBatch(spark,
      odd.filter($"vec_id" % 4 === 3), 1L, root, cents, books)
    def unionServe = Sim.adcTopK(spark, d,
      codesOf(_ % 2 == 0).unionByName(
        EmbedStream.adcServable(spark, root).get), cents, books)
      .collect().map(_.toString).toSeq
    assert(unionServe == truth,
      "staged+streamed union drifted from the full re-stage")
    // the BATCHED serve (q122's shape) over the same union — one probe
    // plan per sampled query, same identity contract
    def batchRows(codes: org.apache.spark.sql.DataFrame) =
      Sim.adcServeBatch(spark, d, codes, cents, books)
        .collect().map(_.toString).sorted.toSeq
    assert(batchRows(codesOf(_ % 2 == 0).unionByName(
        EmbedStream.adcServable(spark, root).get)) ==
      batchRows(codesOf(_ => true)),
      "batched staged+streamed union drifted from the full re-stage")
    // committed redelivery: no-op, still exact
    EmbedStream.processAdcBatch(spark,
      odd.filter($"vec_id" % 4 === 3), 1L, root, cents, books)
    assert(unionServe == truth, "committed replay changed the serve")
    // crash between epoch write and marker: redelivery overwrites the
    // orphan epoch and re-commits — still exact, never doubled
    Files.delete(java.nio.file.Paths.get(s"$root/_commits/1"))
    EmbedStream.processAdcBatch(spark,
      odd.filter($"vec_id" % 4 === 3), 1L, root, cents, books)
    assert(unionServe == truth, "crash replay doubled or lost codes")
    // takedown on the sidecar root: the served odd id vanishes, the
    // serve stays a re-stage-minus-deletion
    val servedOdd = truth
      .map(_.stripPrefix("[").takeWhile(_ != ',').toLong)
      .find(_ % 2 == 1)
    servedOdd.foreach { victim =>
      EmbedStream.deleteVecs(spark, root, Seq(victim), "adc-r1")
      val masked = unionServe
      assert(!masked.exists(_.contains(s"[$victim,")),
        s"takedown vec $victim still served")
    }
    // compaction purges + consolidates; the serve is invariant
    val before = unionServe
    assert(EmbedStream.compactIvfIndex(spark, root, 1L) == 2)
    assert(unionServe == before, "compaction changed the sidecar serve")
    spark.catalog.clearCache()
  }

  test("runAdcIngest: the sidecar's streaming entry folds arrivals exactly-once and self-compacts at cadence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val Sim = graft.queries.Similarity
    val d = Files.createTempDirectory("graft-adcingest").toString
    val all = (0L until 12L).map(i => (i, vec(i.toInt + 1).toSeq))
    all.toDF("vec_id", "embedding").write.parquet(s"$d/embeddings.parquet")
    val cents = Sim.kmeansCentroids(spark, d)
    val books = Sim.pqCodebooks(spark, d)
    val root = s"$d/adc"
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = EmbedStream.runAdcIngest(
      mem.toDF().toDF("vec_id", "embedding"), root, cents, books,
      s"$d/ckpt", compactEvery = 2)
    try {
      mem.addData(all.take(6): _*)
      q.processAllAvailable()
      mem.addData(all.drop(6): _*)
      q.processAllAvailable()
      // cadence hit at batch 1 → ONE consolidated epoch
      assert(BatchProtocol.epochIds(spark, root) == Seq(-3L),
        s"cadence compaction must leave one consolidated epoch: " +
          s"${BatchProtocol.epochIds(spark, root)}")
      // the streamed-in sidecar alone serves the full re-stage
      val truth = Sim.adcTopK(spark, d,
        Sim.pqCodes(spark.read.parquet(s"$d/embeddings.parquet"),
          cents, books), cents, books)
        .collect().map(_.toString).toSeq
      val served = Sim.adcTopK(spark, d,
        EmbedStream.adcServable(spark, root).get, cents, books)
        .collect().map(_.toString).toSeq
      assert(served == truth, "streamed sidecar drifted from the re-stage")
    } finally q.stop()
    spark.catalog.clearCache()
  }

  test("centroidSums streams q115's state; matrixFromSums replays the matrix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // four sources over three directions: a/b co-directional, c
    // orthogonal, d a gaussian — enough structure that a drifted sum
    // shows up in some cosine
    val rows = Seq(
      (0L, vA, "sa"), (1L, vA.map(_ * 2f), "sa"),
      (2L, vA.map(_ * 3f), "sb"),
      (3L, vC, "sc"), (4L, vE, "sd"))
    val dir = Files.createTempDirectory("graft-centstream").toString
    rows.map { case (id, v, s) => (id, s"doc $id", "en", s) }
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$dir/documents.parquet")
    rows.map { case (id, v, _) => (id, v, s"l$id") }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val want = graft.SparkEntry.queries("q115_source_centroids")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    graft.Caches.release(spark)
    val mem = MemoryStream[(Long, Timestamp, Array[Float], String)]
    val q = EmbedStream.centroidSums(
        mem.toDF().toDF("vec_id", "ingest_ts", "embedding", "source"))
      .writeStream.format("memory").queryName("centsums")
      .outputMode("complete").start()
    try {
      mem.addData(rows.take(2).map { case (id, v, s) => (id, ts(id), v, s) })
      q.processAllAvailable()
      mem.addData(rows.drop(2).map { case (id, v, s) => (id, ts(id), v, s) })
      q.processAllAvailable()
      // snapshot the sink (the matrix step self-joins — MemoryPlan's
      // shared attribute ids cannot express that, the q100 lesson)
      val state = spark.table("centsums")
      val snap = spark.createDataFrame(state.collectAsList(), state.schema)
        .persist()
      val got = graft.queries.Similarity.matrixFromSums(snap)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(got == want,
        s"matrix from streamed sums must match batch q115: got $got want $want")
      snap.unpersist()
    } finally q.stop()
  }
}
