package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q45 — each Gopher-style rule must reject independently: a document that
  * fails exactly one rule fails the filter, and the all-rules-pass document
  * passes. Pins the thresholds (50 words, mean length [3,10], >0.8 alpha,
  * ≥2 distinct required stopwords) against silent drift.
  */
class QualityFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-quality").toString
    val passText = Seq.fill(10)("the data with more words here").mkString(" ") // 60 words, mean 4.3
    Seq(
      (0L, passText),
      (1L, "the data with more"), // 4 words: fails the 50-word floor
      (2L, "the with " + Seq.fill(50)("a").mkString(" ")), // mean length 1.2: fails [3,10]
      (3L, "the with " + Seq.fill(60)("12345").mkString(" ")), // alpha 2/62: fails >0.8
      (4L, Seq.fill(20)("data words code").mkString(" "))) // 60 words, 0 required stopwords
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q45 passes the clean document and fails each single-rule violation") {
    val rows = graft.SparkEntry.queries("q45_quality_filter")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass")).toMap
    assert(rows == Map(0L -> true, 1L -> false, 2L -> false, 3L -> false, 4L -> false))
  }

  test("q166 NB distillation: hand-exact scores; token-visible failures flip negative; the length rule is invisible") {
    // hand arithmetic over this fixture: T1 = 60 (doc 0's tokens),
    // T0 = 4+52+62+60 = 178, V = 9 distinct tokens, bits(T1+V) = 6,
    // bits(T0+V) = 7. Per-token w (c1/c0 → bits(c1+1)−6−bits(c0+1)+7):
    // the/with 10/3 → +2, more 10/1 → +3, here 10/0 → +4, data/words
    // 10/21 and 10/20 → 0, a 0/50 → −4, 12345 0/60 → −4, code 0/20 →
    // −3 ⇒ scores 110, 7, −196, −236, −60.
    // Docs 2/3/4 fail the gate on token-visible evidence (their
    // mass sits in fail-exclusive tokens) and the model agrees; doc 1
    // fails ONLY the 50-word length floor — invisible to a bag-of-
    // tokens model — so nb_pass=true is the structural distillation
    // error this card exists to surface, not a bug.
    val rows = graft.SparkEntry.queries("q166_nb_quality")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    graft.Caches.release(spark)
    assert(rows.size == 5)
    val scores = rows.view.mapValues(_.getAs[Long]("nb_score")).toMap
    assert(scores == Map(0L -> 110L, 1L -> 7L, 2L -> -196L,
      3L -> -236L, 4L -> -60L), scores.toString)
    val nb = rows.view.mapValues(_.getAs[Boolean]("nb_pass")).toMap
    assert(nb == Map(0L -> true, 1L -> true, 2L -> false,
      3L -> false, 4L -> false))
    val gate = rows.view.mapValues(_.getAs[Boolean]("gate_pass")).toMap
    assert(gate == Map(0L -> true, 1L -> false, 2L -> false,
      3L -> false, 4L -> false))
  }

  test("q168 hashed NB coincides with the exact q166 on a collision-free vocabulary") {
    // 9 distinct tokens in 1024 buckets: no collisions, so bucket
    // counts ARE token counts, v = |vocab|, and every score/verdict of
    // the hashed model must equal the exact one — the q109≡q106 pin
    // one model family over
    val exact = graft.SparkEntry.queries("q166_nb_quality")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("nb_score"),
          r.getAs[Boolean]("nb_pass")))).toMap
    val hashed = graft.SparkEntry.queries("q168_nb_hashed")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("nb_score"),
          r.getAs[Boolean]("nb_pass")))).toMap
    graft.Caches.release(spark)
    assert(hashed == exact, s"hashed $hashed vs exact $exact")
  }

  test("q45 emits the rule inputs it judged by") {
    val r = graft.SparkEntry.queries("q45_quality_filter")(spark, dir)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(0L).getAs[Long]("n_words") == 60)
    assert(r(0L).getAs[Long]("n_stop_distinct") == 2) // the, with
    assert(r(4L).getAs[Long]("n_stop_distinct") == 0)
    assert(r(3L).getAs[Double]("frac_alpha") < 0.1)
  }
}
