package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Failure-honesty contract of the bench instrument: a query that throws
  * must land in the error map (→ nonzero `failed` in the JSON, exit 1),
  * never be recorded as a ~0 s "fast" median. Without this a broken query
  * times ~0 s and the bench cannot distinguish fast from broken.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a deliberately-broken query is reported as an error, not a timing") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_range" -> ((s, _) => s.range(10).toDF("id")),
      "broken_throws" -> ((_, _) => throw new IllegalStateException("boom")),
      "broken_analysis" -> ((s, _) => s.range(1).toDF("id").select("no_such_col")))
    val (results, errors) = Bench.timeQueries(spark, "/unused", qs)
    assert(results.keySet == Set("ok_range"))
    assert(errors.keySet == Set("broken_throws", "broken_analysis"))
    assert(errors("broken_throws").contains("boom"))
  }

  test("cross-pass spread is |delta|/min over the shared key set") {
    val a = Map("q1" -> 1.0, "q2" -> 2.0, "only_a" -> 9.0, "z" -> 0.0)
    val b = Map("q1" -> 1.5, "q2" -> 2.0, "only_b" -> 9.0, "z" -> 0.0)
    val s = Bench.crossPassSpread(a, b)
    assert(s.keySet == Set("q1", "q2", "z")) // pass-specific keys dropped
    assert(math.abs(s("q1") - 0.5) < 1e-12)  // |1.0-1.5|/1.0
    assert(s("q2") == 0.0)
    assert(s("z") == 0.0) // zero-time guard: no divide-by-zero
  }
}
