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

  test("the stdout line fits the driver's 2000-char tail window") {
    // BENCH_r05 lost its front (total + spread) to that window: the driver
    // keeps only the LAST 2000 chars of the sbt run, and sbt appends a
    // "[success] Total time …" line (~70 chars) after ours. Budget the
    // compact line at ≤ 1860 chars (the measured ~1919 window ceiling
    // minus framing slack) for MORE queries than we ship (90, at
    // realistic name lengths), and require it to still be valid JSON with
    // the headline fields intact.
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats

    // comfortable shape: a small suite fits at 3 decimals WITH the
    // spread summary — every optional field present and exact
    val few = (1 to 10).map(i => f"q$i%02d_hostile_name_length22")
    val fLine = Bench.compactLine(12.345, 11.111, Map.empty,
      few.map(_ -> 1.234567).toMap, few.map(_ -> 0.987654321).toMap,
      "/root/testdata/sf0.1", "bench_full.json")
    val fp = org.json4s.jackson.JsonMethods.parse(fLine)
    assert(math.abs((fp \ "queries").extract[Map[String, Double]]
      .apply(few.head) - 1.235) < 1e-9, "3-decimal precision when it fits")
    assert((fp \ "spread_max").extract[Double] > 0.98)
    assert((fp \ "spread_argmax").extract[String].startsWith("q"))

    // hostile shape: far more queries than fit even at 1 decimal — the
    // line sheds the spread trio first (it lives in bench_full.json),
    // then context, then shortens keys to the unique qNN ids, and only
    // at true overflow drops the FASTEST queries with an explicit
    // omitted count; headline totals and the slow tail always survive,
    // and the roster key is the LITERAL "queries" with FLOAT SECONDS on
    // EVERY rung (r22: the r12–r21 unit-renaming rungs — queries_ds,
    // queries_ds_id, queries_ds_pack — guaranteed the driver's generic
    // parser read nothing; parsed: null in every BENCH_r*.json)
    val names = (1 to 90).map(i => f"q$i%02d_hostile_name_length22")
    val results = names.zipWithIndex
      .map { case (n, i) => n -> (90.0 - i) }.toMap // q01 slowest … q90 fastest
    val spread = names.map(_ -> 0.987654321).toMap
    val line = Bench.compactLine(671.2345, 444.333, Map.empty, results, spread,
      "/root/testdata/sf0.1", "bench_full.json")
    assert(line.length <= 1860, s"compact line is ${line.length} chars")
    assert(!line.contains("\n"))
    val parsed = org.json4s.jackson.JsonMethods.parse(line)
    assert((parsed \ "metric").extract[String] == "total")
    assert(math.abs((parsed \ "value").extract[Double] - 671.2345) < 1e-3)
    // the noise-robust companion headline must survive every degradation
    assert(math.abs((parsed \ "value_min").extract[Double] - 444.333) < 1e-3)
    // the roster is ALWAYS under the literal key "queries", always float
    // seconds — a generic parser needs no rung-specific logic; qNN-id
    // keys expand back to full names through the suite roster (ids are
    // unique by convention)
    def roster(p: JValue, all: Seq[String]): Map[String, Double] = {
      val byId = all.groupBy(_.takeWhile(_ != '_')).view.mapValues(_.head)
      (p \ "queries").extract[Map[String, Double]]
        .map { case (k, v) => byId.getOrElse(k, k) -> v }
    }
    def noDsKeys(l: String): Unit =
      assert(!l.contains("queries_ds"),
        "the unit-renaming rungs must never come back")
    noDsKeys(line)
    val qs = roster(parsed, names)
    val omitted = (parsed \ "queries_omitted").extractOpt[Int].getOrElse(0)
    assert(qs.size + omitted == 90)
    assert(qs.contains(names.head), "slowest query must survive")
    assert(math.abs(qs(names.head) - 90.0) < 5e-2 + 1e-9,
      "slowest query keeps at least 0.1 s resolution in seconds")

    // realistic shape: the ACTUAL shipped query names. Precision, the
    // spread trio, the context fields, and the key length degrade first;
    // at 195 queries the id-keyed float roster still overflows the
    // window, so the FASTEST queries drop with an explicit
    // queries_omitted count — parseability (the literal "queries" float
    // map the driver's PERF comparison reads) now beats completeness,
    // because an unparseable complete roster is per-query data for
    // NOBODY (r01–r21), while the full roster at full precision always
    // lives in bench_full.json. The slow tail — everything a 0.1 s
    // resolution line can say anything about — must survive.
    val real = SparkEntry.queries.keys.toSeq.zipWithIndex
      .map { case (k, i) => k -> (0.05 + 0.01 * i) }.toMap
    val rLine = Bench.compactLine(25.0, 24.0, Map.empty, real,
      real.map { case (k, _) => k -> 0.1 }, "/root/testdata/sf0.1",
      "bench_full.json")
    assert(rLine.length <= 1860, s"real-suite line is ${rLine.length} chars")
    noDsKeys(rLine)
    val rp = org.json4s.jackson.JsonMethods.parse(rLine)
    val rq = roster(rp, SparkEntry.queries.keys.toSeq)
    val rOmitted = (rp \ "queries_omitted").extractOpt[Int].getOrElse(0)
    assert(rq.size + rOmitted == real.size,
      "every query is either present or explicitly counted omitted")
    assert(rq.size >= real.size / 2, "most of the suite must survive")
    val slowest = real.maxBy(_._2)._1
    assert(rq.contains(slowest), "the slowest real query must survive")
    assert(math.abs(rq(slowest) - real(slowest)) < 5e-2 + 1e-9,
      "per-query times keep at least 0.1 s resolution, in seconds")
    // the omitted set is exactly the FASTEST tail: every kept time must
    // be >= every dropped time (0.05 slack: kept values round to 1 dp)
    if (rOmitted > 0) {
      val keptMin = rq.values.min
      val dropped = real.filterNot { case (k, _) => rq.contains(k) }
      assert(dropped.values.forall(_ <= keptMin + 5e-2 + 1e-9),
        "only the fastest queries may be omitted")
    }
    assert(math.abs((rp \ "value_min").extract[Double] - 24.0) < 1e-3)
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
