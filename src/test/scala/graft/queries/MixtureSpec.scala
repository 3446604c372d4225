package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed contract of the mixture family: q155's largest-
  * remainder apportionment (integer quotas that sum EXACTLY to the
  * budget, leftover tokens awarded by remainder rank) and q156's
  * per-source greedy prefix selection under those quotas (whole-group
  * admission, per-source boundary, doc_id tie-break inside an
  * equal-quality group).
  */
class MixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mixture").toString
    rows.toDF("doc_id", "text", "source").write.parquet(s"$d/documents.parquet")
    d
  }

  /** n stopword-free tokens — quality is then 0.6·min(1, n/50), strictly
    * increasing in n below 50, so per-source quality order IS size order.
    */
  private def toks(n: Int): String = Seq.fill(n)("tok").mkString(" ")

  test("q155: quotas are the exact largest-remainder apportionment and sum to the budget") {
    // src0 (w=4) holds 145 tokens, src1 (w=2) holds 26 -> T=171,
    // B = 171 div 5 = 34, W = 6. base: src0 = 136 div 6 = 22 rem 4,
    // src1 = 68 div 6 = 11 rem 2. Sum(base) = 33, R = 1 -> the one
    // leftover token goes to src0 (larger remainder). Quotas 23 / 11.
    val dir = corpus(
      (1 to 10).map(i => (i.toLong, toks(9 + i), "src0")) ++
        Seq((101L, toks(9), "src1"), (102L, toks(9), "src1"),
          (103L, toks(8), "src1")))
    val q = graft.SparkEntry.queries("q155_mixture_quotas")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("w"), r.getAs[Long]("quota_toks"))).toMap
    assert(q == Map("src0" -> (4L, 23L), "src1" -> (2L, 11L)), s"got $q")
    assert(q.values.map(_._2).sum == 171L / 5L,
      "quotas must sum to the budget EXACTLY — the largest-remainder contract")
    spark.catalog.clearCache()
  }

  test("q156: per-source greedy prefix, boundary stops mid-source, equal-quality ties break by doc_id") {
    // same corpus: src0 quota 23 admits only its 19-token best (cum 19;
    // the next group would read 37), and the remaining 4 tokens cannot
    // fit the 18-token boundary group -> exactly one doc. src1 quota 11:
    // the two 9-token docs TIE on quality, so the boundary group is the
    // tie pair and the doc_id cumsum admits 101 (cum 9) but not 102
    // (cum 18) — the per-stratum tie machinery's hand-check.
    val dir = corpus(
      (1 to 10).map(i => (i.toLong, toks(9 + i), "src0")) ++
        Seq((101L, toks(9), "src1"), (102L, toks(9), "src1"),
          (103L, toks(8), "src1")))
    val sel = graft.SparkEntry.queries("q156_mixture_select")(spark, dir)
      .collect().map(r => (r.getString(0), r.getAs[Long]("doc_id"))).toSet
    graft.Caches.release(spark)
    assert(sel == Set("src0" -> 10L, "src1" -> 101L), s"got $sel")
  }

  test("q156: per-source selected mass never exceeds the source's quota (real corpus)") {
    val dir = "/root/testdata/sf0.001"
    val quotas = graft.SparkEntry.queries("q155_mixture_quotas")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("quota_toks")).toMap
    val sel = graft.SparkEntry.queries("q156_mixture_select")(spark, dir)
      .collect()
    graft.Caches.release(spark)
    val mass = sel.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getAs[Long]("n_tokens")).sum).toMap
    assert(mass.nonEmpty)
    mass.foreach { case (src, m) =>
      assert(m <= quotas(src), s"$src selected $m over quota ${quotas(src)}")
    }
  }

  test("q155/q156: a NULL source is a real stratum — it draws a quota under the sentinel and its selection is capped") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mixture-nullsrc").toString
    // src0 (w=4) 145 tokens as above; the null source (default w=1)
    // replaces src1 with the same 26-token shape. T=171, B=34, W=5:
    // src0 base = 136 div 5 = 27 rem 1, null base = 34 div 5 = 6 rem 4.
    // Sum(base)=33, R=1 -> the leftover goes to the null stratum
    // (larger remainder). Quotas 27 / 7; null's 7 admits 101 (9 tokens
    // would overshoot? 9 > 7 -> nothing whole) — boundary group is the
    // 9-token tie pair, remaining 7 < 9 admits neither; the 8-token doc
    // is in a LOWER-quality group entirely out past the boundary.
    ((1 to 10).map(i => (i.toLong, toks(9 + i), "src0")) ++
      Seq((101L, toks(9), null: String), (102L, toks(9), null: String),
        (103L, toks(8), null: String)))
      .toDF("doc_id", "text", "source").write.parquet(s"$d/documents.parquet")
    val q = graft.SparkEntry.queries("q155_mixture_quotas")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("w"), r.getAs[Long]("quota_toks"))).toMap
    assert(q == Map("src0" -> (4L, 27L), "(null)" -> (1L, 7L)), s"got $q")
    val sel = graft.SparkEntry.queries("q156_mixture_select")(spark, d)
      .collect().map(r => (r.getString(0), r.getAs[Long]("doc_id")))
    graft.Caches.release(spark)
    // the null stratum's quota BINDS (7 < 9): without the sentinel the
    // NULL cumsum would admit all three of its docs quota-free
    val nullSel = sel.filter(_._1 == "(null)")
    assert(nullSel.isEmpty, s"null-source selection must respect its quota: $nullSel")
    // src0 quota 27 still admits exactly its 19-token best (next group
    // reads 37; the 18-token boundary group cannot fit the 8 remaining)
    assert(sel.filter(_._1 == "src0").map(_._2).toSet == Set(10L), s"got $sel")
  }

  test("mixture family: an untokenizable corpus yields empty quotas and an empty selection, never a crash") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-mixture-degen").toString
    Seq((1L, null: String, "src0"), (2L, "", "src1"), (3L, null: String, "src2"))
      .toDF("doc_id", "text", "source").write.parquet(s"$d/documents.parquet")
    // empty text still tokenizes to one "" token (the shared tokenizer
    // convention), so src1 carries 1 token of selectable mass; the
    // null-text sources draw NO quota — apportionment runs over the
    // scored relation's sources only
    val q = graft.SparkEntry.queries("q155_mixture_quotas")(spark, d)
      .collect().map(_.getString(0)).toSet
    assert(q == Set("src1"), s"null-text sources must draw no quota: $q")
    val sel = graft.SparkEntry.queries("q156_mixture_select")(spark, d).collect()
    graft.Caches.release(spark)
    // B = 1 div 5 = 0: a defined empty selection
    assert(sel.isEmpty, sel.mkString(";"))
  }
}
