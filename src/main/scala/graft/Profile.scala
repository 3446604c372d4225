package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicInteger

/** Dev-side single-query profiler (optimization-round instrument; not part
  * of the driver contract). For each query name given on the command line:
  *   - one untimed warmup (JIT + codegen + page cache + any session-staged
  *     ensure, exactly the Bench amortization),
  *   - REPS timed repetitions of the same `.count()` action Bench times,
  *     with `Caches.release` between reps,
  *   - the Spark JOB count of one rep (scheduling overhead is invisible in
  *     wall-clock at sf0.1 but each job is a driver round-trip at any
  *     scale),
  *   - `.explain("formatted")` written to $SPARK_GRAFT_PLAN_DIR (default
  *     plans/r22)/<name>_<tag>.txt when SPARK_GRAFT_PLAN_TAG is set
  *     (before/after evidence for the round).
  *
  * Usage: graft.Profile q180_feedback_eval_card [more names...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PLAN_TAG (write plan files when set, e.g. "before").
  */
object Profile {
  private val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val planTag = sys.env.get("SPARK_GRAFT_PLAN_TAG")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val jobLog = sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobLog) {
          val desc = Option(jobStart.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          val site = jobStart.stageInfos.lastOption.map(_.name).getOrElse("")
          starts.put(jobStart.jobId, (System.nanoTime(), s"$desc | $site"))
        }
      }
      override def onJobEnd(jobEnd: SparkListenerJobEnd): Unit =
        if (jobLog) Option(starts.remove(jobEnd.jobId)).foreach {
          case (t0, tag) =>
            val ms = (System.nanoTime() - t0) / 1e6
            println(f"  [job ${jobEnd.jobId}%4d] $ms%8.1f ms  $tag")
        }
    })

    // sweep mode: one warmup + one timed rep of EVERY query, reporting
    // build time (fn() + analysis/optimization/physical planning, no
    // execution) vs execution time — the "where does the per-rep floor
    // go" census. Usage: graft.Profile --sweep
    if (args.sameElements(Array("--sweep"))) {
      val all = SparkEntry.queries.toSeq.sortBy(_._1)
      for ((n, fn) <- all) { // warmup (JIT + session-staged ensures)
        spark.sparkContext.setJobDescription(s"$n warmup")
        fn(spark, sfDir).count(); Caches.release(spark)
      }
      val rows = for ((n, fn) <- all) yield {
        spark.sparkContext.setJobDescription(s"$n sweep")
        jobs.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        val nj = jobs.get()
        Caches.release(spark)
        val (b, e) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
        println(f"SWEEP $n build=$b%.3f exec=$e%.3f jobs=$nj")
        (n, b, e, nj)
      }
      val tb = rows.map(_._2).sum; val te = rows.map(_._3).sum
      println(f"SWEEP-TOTAL build=$tb%.1f exec=$te%.1f jobs=${rows.map(_._4).sum}")
      spark.stop(); return
    }
    val names = if (args.nonEmpty) args.toSeq else Seq.empty
    for (n <- names) {
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      spark.sparkContext.setJobDescription(s"$n warmup")
      fn(spark, sfDir).count(); Caches.release(spark)
      val times = (1 to Reps).map { r =>
        spark.sparkContext.setJobDescription(s"$n rep$r")
        jobs.set(0)
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val nj = jobs.get()
        Caches.release(spark)
        println(f"$n rep$r: $sec%.3f s  jobs=$nj rows=$cnt")
        sec
      }
      println(f"$n  min=${times.min}%.3f med=${times.sorted.apply(Reps / 2)}%.3f")
      planTag.foreach { tag =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val planDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r22")
        val dir = java.nio.file.Paths.get(planDir)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"${n}_$tag.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"$n plan -> $planDir/${n}_$tag.txt")
      }
    }
    spark.stop()
  }
}
