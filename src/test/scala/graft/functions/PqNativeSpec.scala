package graft.functions

import graft.SparkTestSession
import graft.functions.VectorFunctions.subspaceSqDists
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[SubspaceSqDists]] — the native PQ distance matrix that replaced the
  * composed `aggregate`∘`zip_with` lambda folds in q65/q67. The contract
  * that keeps the oracle green is BITWISE equality with the composed
  * form (identical IEEE sequence: widen, subtract, square, left fold
  * seeded 0.0), pinned here against the lambda pipeline on the real
  * corpus; plus the short-vector null contract and codegen presence in
  * the q65 plan.
  */
class PqNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val (pqM, pqK, subDim) = (4, 16, 16)

  // deterministic synthetic codebooks — parity must hold for ANY tensor
  private val books: Array[Array[Array[Double]]] =
    Array.tabulate(pqM, pqK, subDim) { (m, k, i) =>
      ((m * pqK + k) * subDim + i) * 0.125 - 3.0
    }

  test("native distance matrix ≡ composed lambda folds, bitwise, real corpus") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(size(col("embedding")) === pqM * subDim)
    val native = emb.select(col("vec_id"),
      subspaceSqDists(col("embedding"), books.flatten.flatten, pqM, pqK, subDim)
        .as("dd"))
    val withSubs = emb.select(
      col("vec_id") +: (0 until pqM).map(m =>
        transform(slice(col("embedding"), m * subDim + 1, subDim),
          x => x.cast("double")).as(s"sv$m")): _*)
    val composed = withSubs.select(
      col("vec_id") +: (0 until pqM).map { m =>
        val cents = typedLit[Seq[Seq[Double]]](books(m).map(_.toSeq).toSeq)
        transform(cents, c =>
          aggregate(zip_with(col(s"sv$m"), c, (x, cc) => (x - cc) * (x - cc)),
            lit(0.0), (a, b) => a + b)).as(s"d$m")
      }: _*)
    val n = native.collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).map(_.toVector).toVector)
      .toMap
    val c = composed.collect()
      .map(r => r.getLong(0) ->
        (1 to pqM).map(m => r.getSeq[Double](m).toVector).toVector)
      .toMap
    assert(n.keySet == c.keySet && n.nonEmpty)
    n.foreach { case (id, dd) =>
      assert(dd == c(id), s"vec $id distance matrices diverge")
    }
  }

  test("short vectors and null elements yield null inner arrays (the composed-form nulls)") {
    import spark.implicits._
    val base = Seq((1L, Array.fill(subDim + 3)(0.5f)), (2L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    // a full-length vector whose SECOND subspace contains one null slot:
    // the composed zip_with fold nulled that subspace's whole distance
    // array; reading the slot as getFloat's 0.0 would fabricate a
    // finite wrong distance instead
    val withNull = base.union(spark.sql(
      s"""SELECT 3L AS vec_id, transform(sequence(1, ${pqM * subDim}),
         |  i -> CASE WHEN i = ${subDim + 2} THEN CAST(NULL AS FLOAT)
         |       ELSE CAST(0.25 AS FLOAT) END) AS embedding""".stripMargin))
    val df = withNull.select(col("vec_id"),
      subspaceSqDists(col("embedding"), books.flatten.flatten, pqM, pqK, subDim)
        .as("dd"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(rows(1L).head != null && rows(1L).tail.forall(_ == null))
    assert(rows(2L).forall(_ == null))
    assert(rows(3L)(1) == null, "null element must null its subspace")
    assert(rows(3L).zipWithIndex.filter(_._2 != 1).forall(_._1 != null),
      "other subspaces are unaffected")
  }

  test("q65's plan carries the native expression, not lambda folds") {
    val p = graft.SparkEntry.queries("q65_pq_codes")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("subspace_sq_dists"))
    assert(!p.contains("zip_with"))
  }
}
