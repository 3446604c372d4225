package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming retrieval chunking (the q74 dual): stateless per arrival —
  * streamed epochs union to exactly the batch q74 rows on the same
  * corpus, and a committed batch's redelivery is a no-op.
  */
class ChunkStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def doc(i: Long): (Long, String) =
    (i, (0 until (20 + (i % 50)).toInt).map(j => s"w${i}_$j").mkString(" "))

  test("streamed chunks equal batch q74 on the same corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft-chunkstream").toString
    val corpusDir = Files.createTempDirectory("graft-chunkcorpus").toString
    (0L until 60L).map(doc).toDF("doc_id", "text")
      .write.parquet(s"$corpusDir/documents.parquet")

    val mem = MemoryStream[(Long, String)]
    val q = DocStream.runChunks(
      mem.toDF().toDF("doc_id", "text"), s"$base/out", s"$base/ckpt")
    try {
      mem.addData((0L until 30L).map(doc): _*)
      q.processAllAvailable()
      mem.addData((30L until 60L).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id", "chunk_idx", "start", "chunk_len", "chunk_hash")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q74_chunk_windows")(spark, corpusDir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    graft.Caches.release(spark)
  }

  test("committed redelivery is a no-op") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-chunkredeliver").toString
    val b0 = (0L until 5L).map(doc).toDF("doc_id", "text")
    DocStream.processChunkBatch(spark, b0, 0L, s"$base/out")
    val before = spark.read.parquet(s"$base/out").collect().toSet
    DocStream.processChunkBatch(spark, b0, 0L, s"$base/out")
    assert(spark.read.parquet(s"$base/out").collect().toSet === before)
  }
}
