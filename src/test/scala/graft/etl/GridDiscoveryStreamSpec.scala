package graft.etl

import graft.SparkTestSession
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class GridDiscoveryStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def grid(id: String, sheet: String, modified: String): String =
    s"""{"spreadsheetId":"$id","sheetName":"$sheet",
       |"modifiedTime":"$modified","values":[["A"],["1"]]}""".stripMargin

  test("micro-batches advance the (modifiedTime, id) cursor; new files arrive incrementally") {
    val dir = Files.createTempDirectory("disc").toString
    Files.writeString(Paths.get(dir, "s1.json"),
      grid("AAA", "s1", "2026-01-01T00:00:00.000Z"))
    Files.writeString(Paths.get(dir, "s2.json"),
      grid("BBB", "s1", "2026-01-02T00:00:00.000Z"))
    val q = spark.readStream.format("graft.etl.GridDiscoveryProvider")
      .option("path", dir).load()
      .writeStream.format("memory").queryName("discovered")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val batch1 = spark.table("discovered")
        .select("spreadsheet_id").collect().map(_.getString(0)).sorted
      assert(batch1.toSeq == Seq("AAA", "BBB"))
      // a new modification arrives: only it is emitted in the next batch
      Files.writeString(Paths.get(dir, "s3.json"),
        grid("CCC", "s1", "2026-01-03T00:00:00.000Z"))
      q.processAllAvailable()
      val all = spark.table("discovered")
        .select("spreadsheet_id").collect().map(_.getString(0)).sorted
      assert(all.toSeq == Seq("AAA", "BBB", "CCC")) // no redelivery of AAA/BBB
    } finally q.stop()
  }

  test("offset round-trips through JSON and orders lexically") {
    val a = CursorOffset("2026-01-01T00:00:00.000Z", "AAA")
    val b = CursorOffset.fromJson(a.json())
    assert(a == b)
    assert(CursorOffset.Epoch.lessThan(a))
    assert(a.lessThan(CursorOffset("2026-01-01T00:00:00.000Z", "AAB")))
  }
}
