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

  test("scored matches the batch q17/q18 expressions on the same rows") {
    import spark.implicits._
    val batch = Seq((0L, ts(1), goodEn), (1L, ts(2), spanish), (2L, ts(3), junk))
      .toDF("doc_id", "ingest_ts", "text")
    val got = DocStream.scored(batch)
      .select("doc_id", "lang_guess").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "en", 1L -> "es", 2L -> "en")) // junk ties → en priority
  }
}
