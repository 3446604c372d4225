package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming per-epoch curriculum ordering (the q85 dual): one epoch
  * holding the whole corpus produces EXACTLY batch q85's positions; a
  * second epoch's positions continue gaplessly from the cursor (offset =
  * ranked rows so far) with epoch-local easy-first order; committed
  * redelivery is a no-op and the cursor never double-advances.
  */
class CurriculumStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // variable-length docs so quality varies; "the" is a stopword so the
  // quality formula exercises both terms
  private def doc(i: Long): (Long, String) =
    (i, Seq.fill((i % 19 + 1).toInt)("the").mkString(" "))

  test("one epoch = whole corpus: positions ARE batch q85's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-currstream").toString
    val corpusDir = Files.createTempDirectory("graft-currcorpus").toString
    (0L until 40L).map(doc).toDF("doc_id", "text")
      .write.parquet(s"$corpusDir/documents.parquet")

    val mem = MemoryStream[(Long, String)]
    val q = DocStream.runCurriculum(
      mem.toDF().toDF("doc_id", "text"), s"$base/out", s"$base/ckpt")
    try {
      mem.addData((0L until 40L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "quality", "pos").collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q85_curriculum_order")(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    graft.Caches.release(spark)
  }

  test("epochs continue gaplessly from the position cursor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-currepochs").toString
    val mem = MemoryStream[(Long, String)]
    val q = DocStream.runCurriculum(
      mem.toDF().toDF("doc_id", "text"), s"$base/out", s"$base/ckpt")
    try {
      mem.addData((0L until 25L).map(doc): _*)
      q.processAllAvailable()
      mem.addData((25L until 40L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(s"$base/out")
      .select("doc_id", "quality", "pos", "batch_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"),
        r.getAs[Long]("pos"), r.getAs[Any]("batch_id").toString.toLong))
    // the global position space is gapless 0..n-1 across both epochs
    assert(rows.map(_._3).sorted.toSeq === (0L until rows.length))
    // epoch 0 owns the low positions, epoch 1 continues after them
    val e0 = rows.filter(_._4 == 0L)
    val e1 = rows.filter(_._4 == 1L)
    assert(e0.map(_._3).max < e1.map(_._3).min)
    // within each epoch, positions follow easy-first (quality DESC, doc_id)
    for (e <- Seq(e0, e1)) {
      val byPos = e.sortBy(_._3).map(t => (t._1, t._2)).toSeq
      assert(byPos === e.sortBy(t => (-t._2, t._1)).map(t => (t._1, t._2)).toSeq)
    }
    graft.Caches.release(spark)
  }

  test("committed redelivery is a no-op and the cursor holds") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-curredeliver").toString
    val b0 = (0L until 10L).map(doc).toDF("doc_id", "text")
    DocStream.processCurriculumBatch(spark, b0, 0L, s"$base/out")
    val before = spark.read.parquet(s"$base/out").collect().toSet
    val cur = PackStream.cursorBefore(spark, s"$base/out", 1L)
    DocStream.processCurriculumBatch(spark, b0, 0L, s"$base/out")
    assert(spark.read.parquet(s"$base/out").collect().toSet === before)
    assert(PackStream.cursorBefore(spark, s"$base/out", 1L) === cur)
    assert(cur === 10L, "cursor advances by the ranked row count")
  }
}
