package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line the driver records as BENCH_r{N}.json.
  *
  * Measurement protocol (so per-query numbers are attributable, not noise):
  *   - one untimed warmup pass of the whole suite first (JIT + codegen +
  *     page cache), then REPS timed repetitions per query;
  *   - per-query value = median of the repetitions; total = sum of medians;
  *   - `spark.catalog.clearCache()` after every repetition, so blocks
  *     persisted inside one query (q22/q25/q27/q28/q35 all persist an
  *     intermediate) never occupy memory or skew GC while another query is
  *     being timed;
  *   - failure-honest: a query that throws is reported in an `errors` map
  *     plus a nonzero `failed` count (and exit code 1), never recorded as a
  *     ~0 s timing — the instrument must distinguish fast from broken;
  *   - noise-attributable: the timed suite runs TWICE per invocation
  *     (`queries` = pass 1, headline-comparable with earlier rounds;
  *     `queries_pass2`, `spread` = |Δ|/min) so container contention on
  *     untouched queries is visible in the JSON itself, no side-channel
  *     reruns needed.
  *
  * Protocol note: q43/q44/q52 each pay the full pair-generation +
  * label-propagation loop — the query-map contract times every entry
  * independently, so the shared clustering work is deliberately not
  * memoized across queries.
  */
object Bench {
  private val Reps = 3

  /** One timed execution; (seconds, error message if it threw). */
  private def runOnce(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => DataFrame): (Double, Option[String]) = {
    val t0 = System.nanoTime()
    val err =
      try { fn(spark, sfDir).count(); None }
      catch { case e: Throwable =>
        Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
    val sec = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache() // drop this query's persisted blocks
    (sec, err)
  }

  /** One timed pass: Reps repetitions per query, per-query median.
    * Returns (medians for clean queries, error strings for throwers).
    */
  private def timedPass(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : (Map[String, Double], Map[String, String]) = {
    val runs = queries.map { case (name, fn) =>
      val reps = (1 to Reps).map(_ => runOnce(spark, sfDir, fn))
      val firstErr = reps.flatMap(_._2).headOption
      val median = reps.map(_._1).sorted.apply(Reps / 2)
      (name, median, firstErr)
    }
    (runs.collect { case (n, sec, None) => n -> sec }.toMap,
      runs.collect { case (n, _, Some(e)) => n -> e }.toMap)
  }

  /** The whole protocol (warmup + Reps medians) over an arbitrary query
    * map: (per-query medians for queries that ran clean, per-query error
    * strings for queries that threw in any repetition). Factored out of
    * `main` so a spec can pin the failure-honesty contract with a
    * deliberately-broken query.
    */
  def timeQueries(spark: SparkSession, sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame])
      : (Map[String, Double], Map[String, String]) = {
    // warmup: one untimed pass of every query (JIT, codegen cache, OS page
    // cache for the parquet files) — first-touch costs don't belong to
    // whichever query happens to run first.
    queries.foreach { case (_, fn) => runOnce(spark, sfDir, fn) }
    timedPass(spark, sfDir, queries)
  }

  /** Relative cross-pass spread |a−b| / min(a,b) per query present in
    * both passes — the in-band noise instrument: container contention
    * shows up as large spread on untouched queries, a real regression as
    * a consistent value across both passes. (Round-4 chased three 2–4×
    * per-round deltas that controlled reruns attributed to contention;
    * this makes that attribution part of every bench run.)
    */
  def crossPassSpread(a: Map[String, Double], b: Map[String, Double])
      : Map[String, Double] =
    a.keySet.intersect(b.keySet).map { k =>
      val lo = math.min(a(k), b(k))
      k -> (if (lo > 0) math.abs(a(k) - b(k)) / lo else 0.0)
    }.toMap

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline protocol unchanged from r4 (warmup + median of Reps) so
    // totals stay comparable round-over-round; a SECOND full timed pass
    // in the same invocation feeds the spread instrument
    val (results, errors1) = timeQueries(spark, sfDir, SparkEntry.queries)
    val (results2, errors2) = timedPass(spark, sfDir, SparkEntry.queries)
    val errors = errors1 ++ errors2
    val spread = crossPassSpread(results, results2)
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def jmap(m: Map[String, Double]): String =
      m.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$Reps,"failed":${errors.size},"errors":$es,"queries":${jmap(results)},"queries_pass2":${jmap(results2)},"spread":${jmap(spread)},"sf":"$sfDir"}""")
    if (errors.nonEmpty) {
      errors.foreach { case (n, e) => System.err.println(s"[bench] $n FAILED: $e") }
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
