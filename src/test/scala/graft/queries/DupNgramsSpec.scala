package graft.queries

import graft.{SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q71 duplicate n-gram coverage — planted-corpus semantics: a shared
  * 6-token run is exactly two shared 5-grams, a fully-duplicated doc
  * scores 1.0, a unique doc 0.0, and a doc below the gram width gets a
  * null fraction (never a divide error under ANSI mode).
  */
class DupNgramsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-dupngram").toString
    val run = "alpha beta gamma delta epsilon zeta"
    Seq(
      (0L, run), // 6 tokens = 2 distinct 5-grams, both shared with doc 1
      (1L, s"$run unique tail words here"), // 10 tokens = 6 grams, 2 shared
      (2L, "ten fully unique tokens compose this document nine ten2 eleven"),
      (3L, "one two three four")) // below gram width: n_g5 = 0, null frac
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("shared runs, unique docs, and short docs score exactly") {
    val rows = SparkEntry.queries("q71_dup_ngrams")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(rows(0L) == ((2L, 2L, Some(1.0))))
    assert(rows(1L) == ((6L, 2L, Some(2.0 / 6.0))))
    assert(rows(2L) == ((6L, 0L, Some(0.0))))
    assert(rows(3L) == ((0L, 0L, None)))
    spark.catalog.clearCache()
  }

  test("q94: the longest shared run is contiguous, scattered singles don't chain") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-duppassage").toString
    // A and B share an 8-word passage (= 4 consecutive shared 5-gram
    // positions -> passage_tokens 8); C shares only the passage's first
    // 5 words (one gram, run 1 -> passage 5); D has no 5-gram at all.
    // A's shared positions stay contiguous because its tail breaks
    // every straddling gram.
    val p = "p1 p2 p3 p4 p5 p6 p7 p8"
    Seq(
      (0L, s"$p ua ub uc"),
      (1L, s"va vb $p vc"),
      (2L, s"xx yy p1 p2 p3 p4 p5 zz"),
      (3L, "one two three four"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q94_dup_passage")(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    spark.catalog.clearCache()
    assert(rows(0L) == ((7L, 4L, 8L)), rows)
    assert(rows(1L) == ((7L, 4L, 8L)), rows)
    assert(rows(2L) == ((4L, 1L, 5L)), rows)
    assert(rows(3L) == ((0L, 0L, 0L)), rows)
  }

  test("q94: a doc duplicating its OWN passage is not 'shared'") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-duppassage-self").toString
    // the repeated block appears twice in doc 0 but in no OTHER doc —
    // doc frequency counts per-doc distinct grams, so nothing is shared
    Seq(
      (0L, "r1 r2 r3 r4 r5 mid r1 r2 r3 r4 r5"),
      (1L, "entirely different vocabulary in this second document"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q94_dup_passage")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    spark.catalog.clearCache()
    assert(rows(0L) == 0L, rows)
  }
}
