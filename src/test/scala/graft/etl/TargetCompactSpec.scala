package graft.etl

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Target-table compaction (the EtlMain `--compact` verb): a table
  * fragmented by repeated per-job partition overwrites rewrites to one
  * file per job partition with identical rows, the partition LAYOUT
  * survives (a later reload still swaps only its own job's partition),
  * and additive schema evolution is preserved through the rewrite.
  */
class TargetCompactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rows(store: TargetStore, t: String): Set[(Long, Long, String)] = {
    import spark.implicits._
    store.read(t).select("_origin_etl_job_id", "_origin_row", "a")
      .as[(Long, Long, String)].collect().toSet
  }

  test("compact merges per-job fragments, keeps rows and the partition layout") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tcompact").toString
    val store = new TargetStore(spark, root)
    // job 1 arrives as an 8-fragment partition (a big sheet's chunked
    // load), job 2 as 4 fragments
    store.replaceJobPartition("t",
      (0 until 2000).map(i => (1L, i.toLong, s"v$i"))
        .toDF("_origin_etl_job_id", "_origin_row", "a").repartition(8))
    store.replaceJobPartition("t",
      (0 until 100).map(i => (2L, i.toLong, s"w$i"))
        .toDF("_origin_etl_job_id", "_origin_row", "a").repartition(4))
    val expected = rows(store, "t")

    val (before, after) = store.compact("t")
    assert(before == 12L, s"fixture should fragment to 12 files, got $before")
    assert(after == 2L, s"one file per job partition, got $after")
    assert(rows(store, "t") == expected, "compaction must not change rows")

    // the layout survives: a reload of job 2 swaps ONLY its partition
    store.replaceJobPartition("t",
      Seq((2L, 0L, "w0-reloaded")).toDF("_origin_etl_job_id", "_origin_row", "a"))
    val reloaded = rows(store, "t")
    assert(reloaded.filter(_._1 == 1L) == expected.filter(_._1 == 1L),
      "job 1's compacted partition must be untouched by job 2's reload")
    assert(reloaded.filter(_._1 == 2L) == Set((2L, 0L, "w0-reloaded")))
  }

  test("compact preserves additive schema evolution (old partitions stay null-padded)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tcompact-ev").toString
    val store = new TargetStore(spark, root)
    store.replaceJobPartition("t",
      Seq((1L, 0L, "old")).toDF("_origin_etl_job_id", "_origin_row", "a")
        .repartition(3))
    // a later job adds column b — R18 additive evolution
    store.replaceJobPartition("t",
      Seq((2L, 0L, "new", "b0"))
        .toDF("_origin_etl_job_id", "_origin_row", "a", "b"))
    store.compact("t")
    val got = store.read("t").select("_origin_etl_job_id", "a", "b")
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "old", None), (2L, "new", Some("b0"))))
  }

  test("the --compact verb reports per-table outcomes and skips absent tables") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-tcompact-verb").toString
    val store = new TargetStore(spark, root)
    store.replaceJobPartition("present",
      (0 until 50).map(i => (1L, i.toLong, s"v$i"))
        .toDF("_origin_etl_job_id", "_origin_row", "a").repartition(5))
    val lines = EtlMain.compactTargets(store, Seq("present", "missing"), "all")
    assert(lines.exists(_.contains("compacted present: 5 -> 1 file(s)")), lines)
    assert(lines.exists(_.contains("skip missing")), lines)
    // explicit list selects only the named table
    val one = EtlMain.compactTargets(store, Seq("present", "missing"), "present")
    assert(one.size == 1 && one.head.contains("present"), one)
  }
}
