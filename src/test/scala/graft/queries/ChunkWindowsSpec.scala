package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Behavior contract of q74 sliding-window retrieval chunking: starts
  * are the stride multiples below the doc length (so chunk count is
  * floor((n-1)/stride)+1 and every token lands in ≥1 window), full
  * windows carry exactly ChunkWin tokens with a ChunkWin−ChunkStride
  * overlap, the tail runs short instead of being dropped, and the
  * content hash is a usable identity (equal content ⇔ equal hash).
  */
class ChunkWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-chunks").toString
    rows.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  test("q74 chunk count, spans, tail, and overlap follow the window contract") {
    // 80 tokens: starts 0,24,48,72 → 4 chunks; lens 32,32,32,8
    val doc = (0 until 80).map(i => s"w$i").mkString(" ")
    val dir = corpus(Seq((1L, doc), (2L, "solo")))
    val rows = SparkEntry.queries("q74_chunk_windows")(spark, dir).collect()
    val d1 = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getAs[Long]("chunk_idx"), r.getAs[Long]("start"),
        r.getAs[Long]("chunk_len"))).sortBy(_._1)
    assert(d1.toSeq === Seq((0L, 0L, 32L), (1L, 24L, 32L),
      (2L, 48L, 32L), (3L, 72L, 8L)))
    // coverage: the union of [start, start+len) intervals is [0, 80)
    val covered = d1.flatMap { case (_, s, l) => s until (s + l) }.toSet
    assert(covered === (0L until 80L).toSet)
    // a 1-token doc is one 1-token chunk, not zero chunks
    val d2 = rows.filter(_.getLong(0) == 2L)
    assert(d2.length === 1 && d2.head.getAs[Long]("chunk_len") === 1L)
    Caches.release(spark)
  }

  test("q74 chunk hash is a content identity across documents") {
    // docs 1 and 2 share their first 32 tokens exactly → their chunk 0
    // hashes collide (the vector-store dedup the hash exists for);
    // chunk 1 differs → different hashes
    val shared = (0 until 32).map(i => s"s$i").mkString(" ")
    val dir = corpus(Seq(
      (1L, shared + " " + (0 until 16).map(i => s"a$i").mkString(" ")),
      (2L, shared + " " + (0 until 16).map(i => s"b$i").mkString(" "))))
    val rows = SparkEntry.queries("q74_chunk_windows")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("chunk_idx"),
        r.getAs[String]("chunk_hash")))
    def h(doc: Long, idx: Long) =
      rows.find(r => r._1 == doc && r._2 == idx).get._3
    assert(h(1L, 0L) === h(2L, 0L))
    assert(h(1L, 1L) !== h(2L, 1L))
    Caches.release(spark)
  }
}
