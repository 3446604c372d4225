package graft.functions

import graft.SparkTestSession
import graft.functions.VectorFunctions.vecDot
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vec_dot over float arrays equals the sequential double fold") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f))).toDF("a", "b")
    val got = df.select(vecDot($"a", $"b")).as[Double].collect()
    // expected: left-to-right fold seeded 0.0 over double-widened products
    def fold(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    assert(got(0) == fold(Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
    assert(got(1) == fold(Array(0.1f, -0.2f), Array(0.3f, 0.4f)))
  }

  test("vec_dot matches the built-in aggregate∘zip_with fold bit-exactly") {
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(64)(k => ((i * 31 + k * 7) % 100 - 50) / 13.0f)))
    val df = vecs.toDF("id", "v")
    val viaAgg = aggregate(
      zip_with($"v", $"v", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(vecDot($"v", $"v").as("native"), viaAgg.as("builtin"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, b) => assert(n == b) }
  }

  test("vec_dot over double arrays and mixed float/double inputs") {
    val df = Seq((Array(1.5, 2.5), Array(2.0f, 4.0f))).toDF("d", "f")
    val r = df.select(vecDot($"d", $"f"), vecDot($"f", $"d"), vecDot($"d", $"d"))
      .as[(Double, Double, Double)].head()
    assert(r._1 == 1.5 * 2.0 + 2.5 * 4.0)
    assert(r._2 == r._1)
    assert(r._3 == 1.5 * 1.5 + 2.5 * 2.5)
  }

  test("vec_dot folds length to the shorter side and nulls propagate") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(10.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val got = df.select(vecDot($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 10.0)
    assert(got(1).isNullAt(0))
  }

  test("vec_dot is SQL-callable via GraftExtensions") {
    val got = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }

  test("vec_dot rejects non-array inputs at analysis") {
    val df = Seq((1, 2)).toDF("x", "y")
    val e = intercept[Exception](df.select(vecDot($"x", $"y")).collect())
    assert(e.getMessage.toLowerCase.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("hyperplane_bands is bit-identical to the composed when(vecDot >= 0) form") {
    // the fused sketch must reproduce the composed form EXACTLY — the
    // oracle mirrors and all persisted q39 hashes key on these bucket ids
    val fams = 5; val k = 4; val dim = 8
    val planes = Array.tabulate(fams * k * dim)(x => ((x * 37 % 19) - 9) / 7.0)
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(dim)(d => ((i * 13 + d * 5) % 41 - 20) / 9.0f)))
    val df = vecs.toDF("id", "v")
    val composed = array((0 until fams).map { f =>
      (0 until k).map { j =>
        val pl = (0 until dim).map(i => planes((f * k + j) * dim + i))
        when(vecDot($"v", typedLit(pl)) >= 0.0, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val rows = df.select(
        VectorFunctions.hyperplaneBands($"v", planes, fams, k).as("fused"),
        composed.as("composed"))
      .as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (a, b) => assert(a == b) }
    // null vector -> null sketch; short vector folds like vecDot
    val edge = Seq((1L, None), (2L, Some(Array(1.0f))))
      .toDF("id", "v")
      .select(VectorFunctions.hyperplaneBands($"v", planes, fams, k).as("s"))
      .collect()
    assert(edge(0).isNullAt(0))
    assert(!edge(1).isNullAt(0))
  }

  test("vec_dot_many and hyperplane_bands are SQL-callable via GraftExtensions") {
    val r = spark.sql(
      """SELECT vec_dot_many(array(CAST(2.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
        |  array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
        |        CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), 2) AS d,
        |hyperplane_bands(array(CAST(1.0 AS DOUBLE)),
        |  array(CAST(1.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)), 2, 1) AS b
        |""".stripMargin).head()
    assert(r.getSeq[Double](0) == Seq(2.0, 3.0))
    assert(r.getSeq[Long](1) == Seq(1L, 0L)) // +plane sets the bit, -plane doesn't
  }

  test("hyperplane_bands compares by plane CONTENT, not array reference") {
    // case-class equals over an Array field is reference equality, under
    // which canonicalization/semanticEquals/CSE silently miss identical
    // sketches built from separately-materialized (equal) matrices
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val mk = () => Array.tabulate(8)(_ / 7.0)
    val v = UnresolvedAttribute("v")
    val a = HyperplaneBands(v, mk(), 2, 2)
    val b = HyperplaneBands(v, mk(), 2, 2)
    assert(a == b, "equal matrices must compare equal")
    assert(a.hashCode == b.hashCode)
    val c = HyperplaneBands(v, mk().updated(0, 9.9), 2, 2)
    assert(a != c, "different matrices must not compare equal")
  }
}
