package graft.etl

import graft.SparkTestSession
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GridDataSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("gridsrc").toString
    def write(name: String, json: String): Unit =
      Files.writeString(Paths.get(d, name), json)
    write("a1.json",
      """{"spreadsheetId":"SHEETA","sheetName":"s1",
        |"modifiedTime":"2026-05-01T12:00:00.000Z",
        |"values":[["Name","Age"],["Alice","30"],["Bob"]]}""".stripMargin)
    write("a2.json",
      """{"spreadsheetId":"SHEETA","sheetName":"s2",
        |"modifiedTime":"2026-05-02T12:00:00.000Z",
        |"values":[["X"],["1"]]}""".stripMargin)
    write("b1.json",
      """{"spreadsheetId":"SHEETB","sheetName":"s1",
        |"modifiedTime":"2026-05-03T12:00:00.000Z",
        |"values":[["K","V"],["k1","v1"]]}""".stripMargin)
    d
  }

  private def load = spark.read.format("graft.etl.GridTableProvider")
    .option("path", dir).load()

  test("reads one row per raw sheet row with ragged cells and origin index") {
    val rows = load.filter(col("spreadsheet_id") === "SHEETA" &&
        col("sheet_name") === "s1")
      .orderBy("_origin_row")
      .select(col("_origin_row"), col("cells"))
      .collect()
    assert(rows.length == 3)
    assert(rows(0).getSeq[String](1) == Seq("Name", "Age"))
    assert(rows(2).getSeq[String](1) == Seq("Bob")) // ragged: no padding at scan
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("one input partition per sheet; equality filters prune partitions") {
    val all = new GridScan(dir, GridTable.Schema, None, None).planInputPartitions()
    assert(all.length == 3)
    val pruned = new GridScan(dir, GridTable.Schema,
      Some("SHEETA"), Some("s2")).planInputPartitions()
    assert(pruned.length == 1)
    assert(pruned.head.asInstanceOf[GridPartition].sheetName == "s2")
  }

  test("column pruning reaches the scan") {
    val df = load.select("sheet_name")
    val scan = df.queryExecution.executedPlan.toString
    assert(df.distinct().count() == 2)
    // the v2 scan's read schema must carry only the selected column
    assert(scan.contains("sheet_name") && !scan.contains("cells"))
  }

  test("full pipeline: DSv2 scan feeds the SheetGrid transform semantics") {
    val raw = load.filter(col("spreadsheet_id") === "SHEETA" &&
      col("sheet_name") === "s1").orderBy("_origin_row")
      .select("cells").collect().map(_.getSeq[String](0))
    val grid = SheetGrid.fromValues(raw.toSeq)
    val sel = grid.columnSelectorsFromHeaderRow(
      Seq(Right("Name"), Right("Age")), headerRow = 0)
    val projected = grid.toRows(sel, skipRows = 1)
    assert(projected == Vector(
      Vector(Some("Alice"), Some("30")), Vector(Some("Bob"), None)))
  }
}
