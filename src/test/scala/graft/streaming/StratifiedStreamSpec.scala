package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming per-epoch stratified re-balance (the q59 windowed variant):
  * one epoch holding the whole corpus admits EXACTLY batch q59's sample;
  * separate epochs re-balance to their OWN minimum stratum (causal — no
  * dependence on earlier epochs); committed redelivery is a no-op.
  */
class StratifiedStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // skewed strata: 20 "en", 8 "de", 5 "fr" — target 5 per stratum
  private def corpus(offset: Long): Seq[(Long, String, String)] =
    (0L until 33L).map { i =>
      val lang = if (i < 20) "en" else if (i < 28) "de" else "fr"
      (offset + i, s"doc text $i", lang)
    }

  test("one epoch = whole corpus: admitted set IS batch q59's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-stratstream").toString
    val corpusDir = Files.createTempDirectory("graft-stratcorpus").toString
    corpus(0L).toDF("doc_id", "text", "lang")
      .write.parquet(s"$corpusDir/documents.parquet")

    val mem = MemoryStream[(Long, String, String)]
    val q = DocStream.runStratifiedSample(
      mem.toDF().toDF("doc_id", "text", "lang"), s"$base/out", s"$base/ckpt")
    try {
      mem.addData(corpus(0L): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "lang").collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q59_stratified_sample")(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty, "fixture must actually admit something")
  }

  test("epochs re-balance independently: each admits per ITS OWN min stratum") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-stratepochs").toString
    // epoch 0: the skewed corpus; epoch 1: balanced 4/4 en/de — its
    // target is 4, regardless of epoch 0's smaller fr stratum
    val epoch1 = (100L until 108L).map(i =>
      (i, s"later doc $i", if (i % 2 == 0) "en" else "de"))

    val mem = MemoryStream[(Long, String, String)]
    val q = DocStream.runStratifiedSample(
      mem.toDF().toDF("doc_id", "text", "lang"), s"$base/out", s"$base/ckpt")
    try {
      mem.addData(corpus(0L): _*)
      q.processAllAvailable()
      mem.addData(epoch1: _*)
      q.processAllAvailable()
    } finally q.stop()

    // expected per epoch = batch q59 run on that epoch's documents alone
    def expected(rows: Seq[(Long, String, String)]): Set[Seq[Any]] = {
      val d = Files.createTempDirectory("graft-strat-exp").toString
      rows.toDF("doc_id", "text", "lang").write.parquet(s"$d/documents.parquet")
      SparkEntry.queries("q59_stratified_sample")(spark, d)
        .collect().map(_.toSeq).toSet
    }
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id", "lang", "batch_id").collect()
      .groupBy(_.getAs[Any]("batch_id").toString.toLong)
      .view.mapValues(_.map(_.toSeq.take(2)).toSet).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L) === expected(corpus(0L)))
    assert(got(1L) === expected(epoch1))
    // the balanced epoch keeps every doc the hash admits at target 4 —
    // all 8 here (target == n_l admits everything in both strata)
    assert(got(1L).size == 8, s"balanced epoch should admit all: ${got(1L)}")
  }

  test("committed redelivery is a no-op") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-stratredeliver").toString
    val b0 = corpus(0L).toDF("doc_id", "text", "lang")
    DocStream.processStratifiedBatch(spark, b0, 0L, s"$base/out")
    val before = spark.read.parquet(s"$base/out").collect().toSet
    DocStream.processStratifiedBatch(spark, b0, 0L, s"$base/out")
    assert(spark.read.parquet(s"$base/out").collect().toSet === before)
  }
}
