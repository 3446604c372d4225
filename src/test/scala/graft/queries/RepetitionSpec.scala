package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q162 — the intra-document repetition card's integer per-mille shares,
  * hand-computed: most-frequent-token share, duplicate word-2/3-gram
  * shares over the gram-slot denominators (n−1 / n−2), NULL where the
  * gram space is undefined (sub-n docs; null text keeps its row with
  * all-null metrics — the q18 convention).
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-repetition").toString
    Seq(
      (0L, "a a a a"),   // pure run: top 1000, dup2 2/3, dup3 1/2
      (1L, "a b c d"),   // all distinct: top 250, dup2 0, dup3 0
      (2L, "a b a b a"), // alternating: top 600, dup2 2/4, dup3 1/3
      (3L, "xyz"),       // 1 token: gram spaces undefined
      (4L, "x y"),       // 2 tokens: one 2-gram slot, no 3-gram space
      (5L, null: String),
      (6L, ""))          // empty text = one "" token (tokenizer convention)
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q162: hand-computed per-mille shares, undefined gram spaces NULL, every document keeps its row") {
    val rows = graft.SparkEntry.queries("q162_repetition_card")(spark, dir)
      .collect().map { r =>
        def opt(c: String): Option[Long] =
          if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getAs[Long](c))
        r.getAs[Long]("doc_id") ->
          ((opt("n_tokens"), opt("top_tok_pm"), opt("dup_2gram_pm"),
            opt("dup_3gram_pm")))
      }.toMap
    spark.catalog.clearCache()
    assert(rows.keySet == (0L to 6L).toSet,
      s"every document must keep its row: ${rows.keySet}")
    assert(rows(0L) == ((Some(4L), Some(1000L), Some(666L), Some(500L))), rows(0L).toString)
    assert(rows(1L) == ((Some(4L), Some(250L), Some(0L), Some(0L))), rows(1L).toString)
    assert(rows(2L) == ((Some(5L), Some(600L), Some(500L), Some(333L))), rows(2L).toString)
    assert(rows(3L) == ((Some(1L), Some(1000L), None, None)), rows(3L).toString)
    assert(rows(4L) == ((Some(2L), Some(500L), Some(0L), None)), rows(4L).toString)
    assert(rows(5L) == ((None, None, None, None)), rows(5L).toString)
    assert(rows(6L) == ((Some(1L), Some(1000L), None, None)), rows(6L).toString)
  }
}
