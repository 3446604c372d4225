package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** q54 — count-min heavy hitters. Hash-parity is the Verify gate; this
  * pins the sketch's defining guarantees against the in-query exact
  * counts: estimates NEVER undercount (any undercount = broken cell
  * routing), and the one-sided overcount stays within the ε·N envelope
  * the 4×1024 geometry promises.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("q54 estimates bound the exact counts from above, within eps*N") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q54_heavy_hitters")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_cms")))
    assert(rows.length == 10)
    val totalTokens = graft.Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .count()
    // ε = e/1024 per the CMS bound; allow the full Markov slack
    val slack = math.ceil(math.E / 1024.0 * totalTokens).toLong
    rows.foreach { case (tok, exact, cms) =>
      assert(cms >= exact, s"$tok: CMS undercounts ($cms < $exact) — routing broken")
      assert(cms - exact <= slack,
        s"$tok: overcount ${cms - exact} exceeds eps*N = $slack")
    }
  }
}
