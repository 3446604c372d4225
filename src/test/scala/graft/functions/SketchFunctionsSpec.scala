package graft.functions

import graft.SparkTestSession
import graft.functions.SketchFunctions.simHash32
import graft.functions.TextFunctions.{portableHash, tokens}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** The built-in reference formulation the native expression replaces:
    * 32 aggregate() lambdas voting bit-by-bit over the same hash array.
    */
  private def builtinSimhash(th: org.apache.spark.sql.Column) = {
    val vote = (b: Int) => aggregate(th, lit(0L), (acc, h) =>
      acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    (0 until 32).map(b => when(vote(b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  test("SimHash32 equals the 32-aggregate built-in formulation") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "x y z x y", "päö ü ß tokens", "  spaced   out  ",
      "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16").toDF("text")
    val th = transform(array_distinct(tokens(col("text"))), t => portableHash(t))
    val rows = docs.select(simHash32(th).as("native"),
      builtinSimhash(th).as("ref")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("codegen and interpreted eval agree") {
    import spark.implicits._
    val df = Seq(Seq(1L, 2L, 0xFFFFFFFFL), Seq.empty[Long]).toDF("hs")
    val codegen = df.select(simHash32(col("hs"))).collect().map(_.getLong(0)).toSeq
    // interpreted: evaluate the expression directly against the same inputs
    val interp = Seq(Seq(1L, 2L, 0xFFFFFFFFL), Seq.empty[Long]).map { hs =>
      SimHash32(org.apache.spark.sql.catalyst.expressions.Literal.create(
        hs, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))).eval()
    }
    assert(codegen == interp)
  }

  test("empty array votes all-negative -> 0; null elements are skipped") {
    import spark.implicits._
    assert(Seq(Seq.empty[Long]).toDF("hs")
      .select(simHash32(col("hs"))).head().getLong(0) == 0L)
    val withNulls = Seq(Seq[java.lang.Long](3L, null, 3L)).toDF("hs")
    val noNulls = Seq(Seq[java.lang.Long](3L, 3L)).toDF("hs")
    assert(withNulls.select(simHash32(col("hs"))).head().getLong(0)
      == noNulls.select(simHash32(col("hs"))).head().getLong(0))
  }

  test("SQL registration: simhash32 callable from spark.sql") {
    val r = spark.sql("SELECT simhash32(array(CAST(7 AS BIGINT))) AS s").head()
    assert(r.getLong(0) == 7L) // single hash: its set bits win every vote
  }

  test("SQL registration: minhash_affine and bloom_bits callable from spark.sql") {
    val r = spark.sql(
      """SELECT minhash_affine(array(CAST(10 AS BIGINT), CAST(3 AS BIGINT)),
        |  array(CAST(2 AS BIGINT)), array(CAST(1 AS BIGINT)),
        |  CAST(1000 AS BIGINT)) AS sg""".stripMargin).head()
    assert(r.getSeq[Long](0) == Seq(7L)) // min(2*10+1, 2*3+1) mod 1000
    val b = spark.sql(
      """SELECT bloom_bits(ps, 2) AS bloom FROM (VALUES
        |  (array(CAST(0 AS BIGINT), CAST(64 AS BIGINT))),
        |  (array(CAST(3 AS BIGINT)))) AS t(ps)""".stripMargin).head()
    assert(b.getSeq[Long](0) == Seq(9L, 1L)) // bits 0,3 in word 0; bit 64 in word 1
  }

  private val P = 2147483647L
  private val As = Seq(2654435761L % P, 40503L, 123457L)
  private val Bs = Seq(17L, 0L, 999999L)

  test("MinHashAffine equals the per-seed transform+array_min built-ins") {
    import spark.implicits._
    val df = Seq(Seq(5L, 4000000000L, 17L), Seq(1L), Seq(2147483646L))
      .toDF("hs")
    val builtin = array(As.zip(Bs).map { case (a, b) =>
      array_min(transform(col("hs"), h => (lit(a) * h + lit(b)) % lit(P)))
    }: _*)
    val rows = df.select(SketchFunctions.minHash(col("hs"), As, Bs, P).as("native"),
      builtin.as("ref")).collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("MinHashAffine: empty input yields all-null signature (no-grams marker)") {
    import spark.implicits._
    val r = Seq(Seq.empty[Long]).toDF("hs")
      .select(SketchFunctions.minHash(col("hs"), As, Bs, P)).head()
    assert(r.getSeq[Any](0) == Seq(null, null, null))
  }
}
