package graft.streaming

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Standing-query BM25 scoring — the q148 dual: arriving documents score
  * against FROZEN query statistics with q148's integer arithmetic
  * verbatim, so the streamed scores equal the batch serve's on the same
  * fixture (RetrievalSpec's hand-computed corpus).
  */
class RetrievalStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streamed scores equal the batch serve's hand-computed fixture values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // RetrievalSpec's planted corpus: query doc 0 = two rare terms + a
    // stopword; hand-computed batch scores 225530/220400/86832/16200/
    // 10710 for docs 0/1/3/2/4
    val corpus = Seq(
      0L -> "zebra quark the the the",
      1L -> "zebra quark the here now",
      2L -> "the the the the the the the the",
      3L -> "zebra the filler filler",
      4L -> "alpha beta the")
    val dir = Files.createTempDirectory("graft-retrieval-stream").toString
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val qids = Seq(0L).toDF("qid")
    val (a, terms) = graft.queries.TextAnalysis.bm25FrozenStats(spark, dir, qids)
    graft.Caches.release(spark)
    assert(a == 5L, s"avgdl quantized to $a")
    assert(terms.map(_._2).toSet == Set("zebra", "quark", "the"))
    // the stream: the same five documents arrive (plus a null-text row
    // that must score nothing), across a batch boundary
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.bm25Scored(mem.toDF().toDF("doc_id", "text"), a, terms)
      .writeStream.format("memory").queryName("bm25s").outputMode("append")
      .start()
    try {
      mem.addData(corpus.take(3): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3) :+ (9L -> null.asInstanceOf[String]): _*)
      q.processAllAvailable()
      val got = spark.table("bm25s").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("qid"), r.getAs[Long]("score_u")))).toMap
      assert(got == Map(
        0L -> ((0L, 225530L)), 1L -> ((0L, 220400L)), 3L -> ((0L, 86832L)),
        2L -> ((0L, 16200L)), 4L -> ((0L, 10710L))),
        s"streamed scores diverged: $got")
    } finally q.stop()
    // batch parity: the q148 serve over the same corpus ranks by exactly
    // these scores (fixture sized so its modulus sample is {doc 0})
    val batch = graft.SparkEntry.queries("q148_bm25_topk")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_u"))
      .toMap
    graft.Caches.release(spark)
    assert(batch == Map(0L -> 225530L, 1L -> 220400L, 3L -> 86832L,
      2L -> 16200L, 4L -> 10710L))
  }

  test("streamed standing-phrase counts equal the batch phrase serve across a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // RetrievalSpec's overlap corpus: query doc 0's phrase = "a a";
    // runs of n a's hold n-1 overlapping occurrences (the position-pair
    // convention both engines share). Doc 2 separates the a's; doc 4
    // shares nothing.
    val corpus = Seq(
      0L -> "a a",
      1L -> "a a a",
      2L -> "a b a",
      3L -> "a a a a",
      4L -> "b b")
    val dir = Files.createTempDirectory("graft-phrase-stream").toString
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val phrases = graft.queries.TextAnalysis.phraseFrozen(spark, dir,
      Seq(0L).toDF("qid"))
    assert(phrases == Seq(0L -> Seq("a", "a")), s"frozen set: $phrases")
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.phraseScored(mem.toDF().toDF("doc_id", "text"), phrases)
      .writeStream.format("memory").queryName("phrs").outputMode("append")
      .start()
    try {
      mem.addData(corpus.take(2): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(2) :+ (9L -> null.asInstanceOf[String]): _*)
      q.processAllAvailable()
      val got = spark.table("phrs").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phrase_tf")).toMap
      assert(got == Map(0L -> 1L, 1L -> 2L, 3L -> 3L),
        s"streamed phrase counts diverged: $got")
    } finally q.stop()
    // batch parity: q154 on the same corpus counts identically (the
    // fixture's modulus sample is {doc 0})
    val batch = graft.SparkEntry.queries("q154_phrase_topk")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phrase_tf")).toMap
    graft.Caches.release(spark)
    assert(batch == Map(0L -> 1L, 1L -> 2L, 3L -> 3L))
  }

  test("streamed standing-proximity counts equal the batch q159 serve across a batch boundary") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // RetrievalSpec's q159 corpus: pair ("alpha","beta"), window 5 —
    // doc 2 holds TWO qualifying pairs, doc 1 a 2-token gap (phrase
    // miss, proximity hit), doc 3 only the reverse order (directional:
    // no match), doc 4 a gap past the window (no match)
    val corpus = Seq(
      0L -> "alpha beta",
      1L -> "alpha x y beta",
      2L -> "alpha alpha beta",
      3L -> "beta then alpha",
      4L -> "alpha a b c d e beta")
    val dir = Files.createTempDirectory("graft-prox-stream").toString
    corpus.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val pairs = graft.queries.TextAnalysis.phraseFrozen(spark, dir,
      Seq(0L).toDF("qid"))
    assert(pairs == Seq(0L -> Seq("alpha", "beta")))
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.proximityScored(mem.toDF().toDF("doc_id", "text"), pairs)
      .writeStream.format("memory").queryName("proxs").outputMode("append")
      .start()
    try {
      mem.addData(corpus.take(3): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3) :+ (9L -> null.asInstanceOf[String]): _*)
      q.processAllAvailable()
      val got = spark.table("proxs").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("prox_tf")).toMap
      assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 2L),
        s"streamed proximity counts diverged: $got")
    } finally q.stop()
    val batch = graft.SparkEntry.queries("q159_proximity_topk")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("prox_tf")).toMap
    graft.Caches.release(spark)
    assert(batch == Map(0L -> 1L, 1L -> 1L, 2L -> 2L))
  }
}
