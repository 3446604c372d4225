package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q103 trained-token chunking: the chunk stream is q74's arithmetic over
  * the BPE token sequence — hand-computed on a vocabulary whose merges
  * are known, and reconciled against q90 (the chunks of a document must
  * tile exactly its trained-token count) on the real corpus.
  */
class ChunkTrainedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ctr").toString
    rows.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("known merges: whole words collapse to single trained tokens") {
    // vocab {ab: 3, cd: 1}: round 1 merges (a,b) -> ab, round 2 (c,d)
    // -> cd, round 3 exhausts. Every word is then ONE trained token.
    val dir = write(Seq((1L, "ab ab cd"), (2L, "ab")))
    val rows = graft.SparkEntry.queries("q103_chunk_trained")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(rows === Seq((1L, 0L, 0L, 3L), (2L, 0L, 0L, 1L)))
    spark.catalog.clearCache()
  }

  test("trained stream longer than the window chunks at stride 24") {
    // 40 single-letter words: no pair ever repeats ACROSS a word (each
    // word is one symbol), so training exhausts immediately and the
    // trained stream has 40 tokens -> starts 0 and 24, lengths 32 and 16
    val dir = write(Seq((1L, Seq.fill(40)("z").mkString(" "))))
    val rows = graft.SparkEntry.queries("q103_chunk_trained")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2)
    assert(rows === Seq((0L, 0L, 32L), (1L, 24L, 16L)))
    spark.catalog.clearCache()
  }

  test("chunks tile the q90 trained-token count exactly on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val fromChunks = graft.SparkEntry.queries("q103_chunk_trained")(spark, dir)
      .groupBy("doc_id")
      .agg(max(col("start") + col("chunk_len")).as("n_from_chunks"),
        count(lit(1)).as("n_chunks"), max("chunk_idx").as("max_idx"))
    val enc = graft.SparkEntry.queries("q90_bpe_encode")(spark, dir)
      .filter(col("n_bpe_tokens") > 0)
    val joined = enc.join(fromChunks, Seq("doc_id"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val n = r.getAs[Long]("n_bpe_tokens")
      assert(r.getAs[Long]("n_from_chunks") === n,
        s"chunks of doc ${r.getAs[Long]("doc_id")} do not tile its count")
      // contiguous chunk indices: count = max_idx + 1 = ceil/stride walk
      assert(r.getAs[Long]("n_chunks") === r.getAs[Long]("max_idx") + 1L)
    }
    graft.Caches.release(spark)
  }
}
