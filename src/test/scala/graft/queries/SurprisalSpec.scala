package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Exact-arithmetic contract for the mean-surprisal scorer (q61): the
  * per-token surprisal is floor(log2(T / c)) by INTEGER construction
  * (binary digit count of the quotient), so a hand-computed corpus has
  * one exact answer — and the usefulness property (rare-token documents
  * outscore boilerplate) follows from it.
  */
class SurprisalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-surprisal").toString
    rows.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q61 is exact on a hand-computed corpus; rare tokens outscore boilerplate") {
    // T = 8 tokens. 'a' appears 4× → T/a = 2 → floor(log2) = 1.
    // 'b','c','d','e' appear once → T/c = 8 → floor(log2) = 3.
    val dir = corpus(Seq((0L, "a a a a"), (1L, "b c d e")))
    val got = SparkEntry.queries("q61_mean_surprisal")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    Caches.release(spark)
    assert(got === Map(0L -> ((4L, 1.0)), 1L -> ((4L, 3.0))))
    assert(got(1L)._2 > got(0L)._2, "rare-token doc must outscore boilerplate")
  }

  test("q88 bigram surprisal is exact; predictable continuations score 0") {
    // corpus bigrams: d0 "a b a b" -> [a b, b a, a b]; d1 "a c" -> [a c]
    // counts: c("a b")=2, c("b a")=1, c("a c")=1; contexts: c(a.)=3, c(b.)=1
    // d0: (a b) -> 3//2=1 -> 0 bits (twice); (b a) -> 1//1=1 -> 0 bits
    //     -> mean 0.0 over 3 bigrams (perfectly predictable chain)
    // d1: (a c) -> 3//1=3 -> floor(log2 3)=1 -> mean 1.0 (the rare
    //     continuation of a common context is what the bigram model
    //     sees and the unigram model cannot)
    val dir = corpus(Seq((0L, "a b a b"), (1L, "a c")))
    val got = SparkEntry.queries("q88_bigram_surprisal")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    Caches.release(spark)
    assert(got === Map(0L -> ((3L, 0.0)), 1L -> ((1L, 1.0))))
  }

  test("q88: single-token and empty docs emit no bigram rows, never crash") {
    val dir = corpus(Seq((0L, "solo"), (1L, ""), (2L, "x y")))
    val got = SparkEntry.queries("q88_bigram_surprisal")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    Caches.release(spark)
    assert(got === Set(2L), "only the two-token doc has a bigram")
  }

  test("q61 floor-log2 is exact at power-of-two boundaries") {
    // T = 16. 'x' appears 8× → T/x = 2 → bits 1 (not 0 or 2 — the libm
    // log2 ulp hazard this integer formulation exists to avoid).
    // 'y' 4× → 4 → 2. Four singletons → 16 → 4.
    val dir = corpus(Seq(
      (0L, "x x x x x x x x"),
      (1L, "y y y y"),
      (2L, "p q r s")))
    val got = SparkEntry.queries("q61_mean_surprisal")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    Caches.release(spark)
    assert(got === Map(0L -> 1.0, 1L -> 2.0, 2L -> 4.0))
  }
}
