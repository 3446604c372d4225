package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** q104 duplicated-span scrub semantics, hand-computed: covered mass is
  * the union length of [p, p+4] intervals over corpus-shared 5-gram
  * positions — islands merge while consecutive shared positions gap by
  * ≤4, split beyond, and within-document repetition alone never counts
  * as "shared".
  */
class SpanScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def write(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-scrub").toString
    rows.toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    d
  }

  private def scrub(dir: String): Map[Long, (Long, Long, Long)] =
    graft.SparkEntry.queries("q104_span_scrub")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("a shared 6-token phrase covers exactly 6 tokens in each doc") {
    // the phrase contributes 2 consecutive shared gram positions ->
    // one island, covered = (max-min)+5 = 6
    val dir = write(Seq(
      (1L, "x1 x2 p q r s t u y1"), // phrase at token positions 2..7
      (2L, "p q r s t u z1 z2 z3"))) // phrase at token positions 0..5
    val m = scrub(dir)
    assert(m(1L) === ((9L, 6L, 3L)))
    assert(m(2L) === ((9L, 6L, 3L)))
    spark.catalog.clearCache()
  }

  test("two separated shared runs sum; a gap of >4 positions splits islands") {
    // doc 3 carries doc 1's phrase and doc 2's phrase with 5 alien
    // tokens between: shared gram positions {0,1} and {11,12} ->
    // islands of covered length 6 + 6 = 12 of its 17 tokens
    val dir = write(Seq(
      (1L, "p q r s t u"),
      (2L, "a b c d e f"),
      (3L, "p q r s t u m1 m2 m3 m4 m5 a b c d e f")))
    val m = scrub(dir)
    assert(m(3L) === ((17L, 12L, 5L)))
    // the sources are fully covered by their own shared phrase
    assert(m(1L) === ((6L, 6L, 0L)))
    assert(m(2L) === ((6L, 6L, 0L)))
    spark.catalog.clearCache()
  }

  test("within-document repetition alone is not 'shared'; short docs scrub zero") {
    val dir = write(Seq(
      (1L, "m n o p q m n o p q"), // internal dup only: DF counts distinct grams per doc
      (2L, "one two three"), // < 5 tokens: no grams at all
      (3L, "totally different words here now")))
    val m = scrub(dir)
    assert(m(1L) === ((10L, 0L, 10L)))
    assert(m(2L) === ((3L, 0L, 3L)))
    assert(m(3L) === ((5L, 0L, 5L)))
    spark.catalog.clearCache()
  }

  test("overlapping coverage is not double-counted (adjacent islands at gap 5)") {
    // doc 1 and doc 2 share grams at doc-1 positions {0, 5}: intervals
    // [0,4] and [5,9] are adjacent but disjoint -> covered exactly 10
    val dir = write(Seq(
      (1L, "g h i j k g h i j k x"), // grams "g h i j k" at pos 0 and 5
      (2L, "g h i j k")))
    val m = scrub(dir)
    assert(m(1L) === ((11L, 10L, 1L)))
    assert(m(2L) === ((5L, 5L, 0L)))
    spark.catalog.clearCache()
  }

  // ----------------------------------------------------------------- q108

  private def apply108(dir: String): Map[Long, (Long, Option[String])] =
    graft.SparkEntry.queries("q108_scrub_apply")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2))))
      .toMap

  test("q108 cuts exactly the covered span and keeps surrounding text in order") {
    val dir = write(Seq(
      (1L, "x1 x2 p q r s t u y1"), // phrase covers positions 2..7
      (2L, "p q r s t u z1 z2 z3"))) // phrase covers positions 0..5
    val m = apply108(dir)
    assert(m(1L) === ((3L, Some("x1 x2 y1"))))
    assert(m(2L) === ((3L, Some("z1 z2 z3"))))
    graft.Caches.release(spark)
  }

  test("q108 fully-covered docs emit NULL text; untouched docs emit their tokens") {
    val dir = write(Seq(
      (1L, "p q r s t u"), // fully covered by its own shared phrase
      (2L, "p q r s t u"),
      (3L, "  Totally   Different\tWords here now "), // no shared grams:
      // survives whole, in TOKEN form (lowercased, whitespace-collapsed)
      (4L, null.asInstanceOf[String])))
    val m = apply108(dir)
    assert(m(1L) === ((0L, None)))
    assert(m(2L) === ((0L, None)))
    assert(m(3L) === ((5L, Some("totally different words here now"))))
    assert(m(4L) === ((0L, None)))
    graft.Caches.release(spark)
  }

  // ----------------------------------------------------------------- q114

  private def sha256hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q114 chunks the scrubbed survivors — exact hash on a planted doc") {
    val dir = write(Seq(
      (1L, "x1 x2 p q r s t u y1"), // scrubs to "x1 x2 y1"
      (2L, "p q r s t u z1 z2 z3"))) // scrubs to "z1 z2 z3"
    val rows = graft.SparkEntry.queries("q114_chunk_scrubbed")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    graft.Caches.release(spark)
    // 3 kept tokens per doc < the 32-token window: ONE chunk each, and
    // the chunk hash is the sha-256 of the surviving text itself
    assert(rows.map(x => (x._1, x._2, x._3, x._4)).toSet ===
      Set((1L, 0L, 0L, 3L), (2L, 0L, 0L, 3L)))
    assert(rows.find(_._1 == 1L).get._5 === sha256hex("x1 x2 y1"))
    assert(rows.find(_._1 == 2L).get._5 === sha256hex("z1 z2 z3"))
  }

  test("q114 chunk geometry matches q108's retained counts on the real corpus") {
    val dir = "/root/testdata/sf0.001"
    val retained = graft.SparkEntry.queries("q108_scrub_apply")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      .filter(_._2 > 0)
    graft.Caches.release(spark)
    val chunks = graft.SparkEntry.queries("q114_chunk_scrubbed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    graft.Caches.release(spark)
    // exactly the docs with survivors chunk; ceil(n/stride) windows per
    // doc; the last window ends exactly at the retained count
    assert(chunks.keySet === retained.keySet)
    chunks.foreach { case (id, cs) =>
      val n = retained(id)
      assert(cs.length === ((n - 1) / 24 + 1).toInt, s"doc $id windows")
      assert(cs.map(c => c._2 + c._3).max === n, s"doc $id tail end")
    }
  }

  test("q108 retained counts agree with q104's accounting on a mixed corpus") {
    // the two operators share the island machinery but take different
    // paths to "retained" (interval arithmetic vs anti-join survivors) —
    // they must agree doc for doc
    val dir = write(Seq(
      (1L, "p q r s t u"),
      (2L, "a b c d e f"),
      (3L, "p q r s t u m1 m2 m3 m4 m5 a b c d e f"),
      (4L, "one two three"),
      (5L, "g h i j k g h i j k x"),
      (6L, "g h i j k")))
    val acc = scrub(dir).map { case (id, (_, _, ret)) => id -> ret }
    spark.catalog.clearCache()
    val app = apply108(dir).map { case (id, (ret, _)) => id -> ret }
    assert(app === acc)
    graft.Caches.release(spark)
  }
}
