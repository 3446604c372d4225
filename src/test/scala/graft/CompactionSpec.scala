package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Compaction contract: a fragmented directory rewrites into the
  * byte-derived file count with no row lost or duplicated, and the
  * output files are the ones a scan wants (≥ the target granularity in
  * count terms, uniform via round-robin).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))

  test("compact rewrites a fragmented table into byte-sized file counts, rows intact") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-frag").toString + "/t"
    val out = Files.createTempDirectory("graft-compact").toString + "/t"
    // 64 fragments of a 20k-row table — the micro-batch-sink shape
    (1L to 20000L).map(i => (i, s"row $i payload"))
      .toDF("id", "payload").repartition(64).write.parquet(in)
    assert(parquetFiles(in).size == 64)

    val bytes = Compaction.dataBytes(spark, in)
    assert(bytes > 0)
    // a crashed write's _temporary leftovers and hidden files are
    // invisible to spark.read.parquet — they must not inflate the byte
    // total the output file count derives from
    val junkDir = new java.io.File(s"$in/_temporary/0")
    junkDir.mkdirs()
    Files.write(java.nio.file.Paths.get(s"$junkDir/part-junk.parquet"),
      Array.fill[Byte](1 << 20)(7))
    Files.write(java.nio.file.Paths.get(s"$in/.hidden.parquet"),
      Array.fill[Byte](1 << 20)(7))
    assert(Compaction.dataBytes(spark, in) == bytes,
      "hidden/_temporary files must not count")
    val target = bytes / 4 + 1 // aim for ~4 output files
    val n = Compaction.compact(spark, in, out, target)
    assert(n >= 4 && n <= 5, s"byte-derived count was $n")
    assert(parquetFiles(out).size == n)

    // no row lost or duplicated, values intact
    val a = spark.read.parquet(in).as[(Long, String)].collect().sortBy(_._1)
    val b = spark.read.parquet(out).as[(Long, String)].collect().sortBy(_._1)
    assert(b.length == 20000 && a.toSeq == b.toSeq)
  }

  test("a table under a hidden ancestor directory still counts its bytes") {
    import spark.implicits._
    // a '.'-prefixed ANCESTOR (a ~/.cache-style warehouse) must not hide
    // the table: the visibility walk stops at the qualified root, never
    // above it (the unqualified-root comparison bug made this return 0)
    val base = Files.createTempDirectory("graft-hid").toString
    val in = s"$base/.cache/warehouse/t"
    (1L to 500L).toDF("id").coalesce(1).write.parquet(in)
    assert(Compaction.dataBytes(spark, in) > 0,
      "bytes under a hidden ancestor must count from the table root down")
    val out = s"$base/out/t"
    assert(Compaction.compact(spark, in, out, 1L << 30) == 1)
    assert(spark.read.parquet(out).count() == 500L)
  }

  test("a relative path with a hidden component reports its true bytes") {
    import spark.implicits._
    // listFiles returns fully-qualified absolute leaves; before the root
    // was qualified, a RELATIVE caller path had a smaller depth than every
    // leaf, so the visibility walk inspected the root's own components —
    // a relative path THROUGH a '.'-prefixed directory reported 0 bytes
    // and compacted everything to one file regardless of size
    val rel = "target/.graft-reltest/t"
    val abs = new java.io.File(rel).getAbsoluteFile
    try {
      (1L to 500L).toDF("id").coalesce(1).write.mode("overwrite").parquet(rel)
      assert(Compaction.dataBytes(spark, rel) > 0,
        "relative path must be qualified before the depth boundary is taken")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(abs.getParentFile)
    }
  }

  test("compactPartitioned keeps the epoch layout, one file per partition, rows intact") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-cpart").toString
    // three streaming-sink epochs, each fragmented into several files
    (0 until 3).foreach { ep =>
      (0 until 200).map(i => (ep * 1000L + i, s"doc $i of epoch $ep"))
        .toDF("doc_id", "text").repartition(5)
        .write.parquet(s"$base/in/batch_id=$ep")
    }
    def files(p: String) = {
      val st = Files.walk(java.nio.file.Paths.get(p))
      try st.toArray.toSeq.map(_.toString).filter(_.endsWith(".parquet"))
      finally st.close()
    }
    assert(files(s"$base/in").size == 15)
    assert(Compaction.compactPartitioned(spark, s"$base/in", s"$base/out",
      Seq("batch_id")) == 3L)
    assert(files(s"$base/out").size == 3, "one file per epoch")
    // identical rows INCLUDING the partition column's values
    def rows(p: String) = spark.read.parquet(p)
      .select("batch_id", "doc_id", "text")
      .as[(Long, Long, String)].collect().toSet
    assert(rows(s"$base/out") == rows(s"$base/in"))
    assert(new java.io.File(s"$base/out/batch_id=2").isDirectory,
      "the epoch directory layout must survive")
  }

  test("compact of an already-compact table is a single file") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-small").toString + "/t"
    val out = Files.createTempDirectory("graft-small-out").toString + "/t"
    (1L to 100L).toDF("id").coalesce(1).write.parquet(in)
    val n = Compaction.compact(spark, in, out, 1L << 30)
    assert(n == 1 && parquetFiles(out).size == 1)
    assert(spark.read.parquet(out).count() == 100L)
  }
}
