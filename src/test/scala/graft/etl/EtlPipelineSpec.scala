package graft.etl

import graft.SparkTestSession
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: fixture grids → discovery → load → target + accounting
  * contents (SURVEY.md §5.3 item 2).
  */
class EtlPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Sid = "1b33RL2nQJxdaHYxVmkk4lo3K1IKjSD3_ggnokrZCkx8"
  private val Sid2 = "2c44SM3oRKyebIZyWnll5mp4L2JLkTE4_hhopsaDlY99"

  private def writeFixture(dir: Path, file: String, id: String, sheet: String,
      modified: String, values: Seq[Seq[String]]): Unit = {
    def jarr(ss: Seq[String]) = ss.map(s =>
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").mkString("[", ",", "]")
    val json = s"""{"spreadsheetId":"$id","sheetName":"$sheet",
      |"modifiedTime":"$modified","name":"fixture $id",
      |"values":${values.map(jarr).mkString("[", ",", "]")}}""".stripMargin
    Files.writeString(dir.resolve(file), json)
  }

  private val people = Seq(
    Seq("Name ", "Émail Address", "Status", "Status", "#"),
    Seq("Alice", " alice@example.com", "DONE", "x"),
    Seq("Bob", "bob@example.com"),
    Seq("", "  ", "active", "y", "7"))

  private val peopleCfg = EtlConfig(Sid, "2019 Expirations", "renewals_2019",
    Seq("name" -> Right("Name"), "email" -> Right("Émail Address"), "flag" -> Left(3)))

  private def freshWorld(): (Path, Tasks, MetaStore, TargetStore) = {
    val dir = Files.createTempDirectory("graft-fixtures")
    val wh = Files.createTempDirectory("graft-wh").toString
    writeFixture(dir, "a.json", Sid, "2019 Expirations", "2026-05-01T12:00:00.000Z", people)
    val meta = new MetaStore(spark, s"$wh/meta")
    val targets = new TargetStore(spark, s"$wh/tables")
    meta.setUpAccounting()
    meta.setUpAccounting() // idempotent (R25)
    val tasks = new Tasks(new LocalGridSource(dir.toString), meta, targets, loadTime = 1746100000L)
    tasks.setConfiguration(Seq(peopleCfg))
    (dir, tasks, meta, targets)
  }

  test("full run loads the FIXTURES.md §4 expected target") {
    val (_, tasks, meta, targets) = freshWorld()
    assert(meta.getGreatestModified().isEmpty) // empty → None (R14)
    assert(meta.getOldestSeen().isEmpty)       // empty → None (R15)
    assert(tasks.verifyOldestSpreadsheet())    // vacuous true (R30)

    assert(tasks.findSomeUpdatedSpreadsheets() == 1)
    assert(meta.getGreatestModified().contains(("2026-05-01T12:00:00.000Z", Sid)))
    val loaded = tasks.loadSomeUpdatedSpreadsheets()
    assert(loaded.map(_.sheetName) == Seq("2019 Expirations"))

    val rows = targets.read("renewals_2019")
      .orderBy("_origin_row")
      .select("_origin_etl_job_id", "_origin_row", "name", "email", "flag")
      .collect().toSeq
    assert(rows == Seq(
      Row(1L, 0L, "Alice", "alice@example.com", "x"),
      Row(1L, 1L, "Bob", "bob@example.com", null),
      Row(1L, 2L, "", "", "y")))
  }

  test("second run is a no-op (R16 filter + R21 hash skip); reload on change replaces rows") {
    val (dir, tasks, meta, targets) = freshWorld()
    tasks.findSomeUpdatedSpreadsheets()
    tasks.loadSomeUpdatedSpreadsheets()

    // up-to-date ⇒ filterExtractable drops the job
    assert(tasks.loadSomeUpdatedSpreadsheets().isEmpty)

    // bump modifiedTime but keep content ⇒ job re-runs, hash-skips the write
    writeFixture(dir, "a.json", Sid, "2019 Expirations", "2026-05-02T00:00:00.000Z", people)
    tasks.findSomeUpdatedSpreadsheets()
    val before = targets.read("renewals_2019").collect().toSet
    assert(tasks.loadSomeUpdatedSpreadsheets().size == 1)
    assert(targets.read("renewals_2019").collect().toSet == before)

    // content change with FEWER rows ⇒ partition overwrite shrinks the table
    writeFixture(dir, "a.json", Sid, "2019 Expirations", "2026-05-03T00:00:00.000Z",
      people.take(2))
    tasks.findSomeUpdatedSpreadsheets()
    tasks.loadSomeUpdatedSpreadsheets()
    val after = targets.read("renewals_2019").orderBy("_origin_row").collect().toSeq
    assert(after.map(_.getAs[Long]("_origin_row")) == Seq(0L))
    assert(after.head.getAs[String]("name") == "Alice")
  }

  test("additive schema evolution across jobs in one target (R18)") {
    val (dir, tasks, meta, targets) = freshWorld()
    writeFixture(dir, "b.json", Sid2, "Sheet1", "2026-05-04T00:00:00.000Z", Seq(
      Seq("Name", "Extra"),
      Seq("Zoe", "z1")))
    tasks.setConfiguration(Seq(peopleCfg,
      EtlConfig(Sid2, "Sheet1", "renewals_2019",
        Seq("name" -> Right("Name"), "extra" -> Right("Extra")))))
    tasks.findSomeUpdatedSpreadsheets()
    tasks.loadSomeUpdatedSpreadsheets()
    val df = targets.read("renewals_2019")
    assert(Set("name", "email", "flag", "extra").subsetOf(df.columns.toSet))
    val zoe = df.filter(df("name") === "Zoe").collect().head
    assert(zoe.getAs[String]("extra") == "z1" && zoe.getAs[String]("email") == null)
    val alice = df.filter(df("name") === "Alice").collect().head
    assert(alice.getAs[String]("extra") == null) // old partition: new col is null
  }

  test("upsert last-writer-wins keeps ids stable (R17)") {
    val (_, _, meta, _) = freshWorld()
    meta.setSpreadsheetsSeen(Seq(
      SpreadsheetMeta("X1", "2026-01-01T00:00:00Z", "one"),
      SpreadsheetMeta("X2", "2026-01-02T00:00:00Z", "two")), 100L)
    val id1 = meta.spreadsheetIdOf("X1")
    meta.setSpreadsheetsSeen(Seq(
      SpreadsheetMeta("X1", "2026-02-01T00:00:00Z", "one-renamed"),
      SpreadsheetMeta("X3", "2026-01-03T00:00:00Z", "three")), 200L)
    assert(meta.spreadsheetIdOf("X1") == id1)
    val x1 = meta.spreadsheets.filter(_.google_spreadsheet_id == "X1").collect().head
    assert(x1.google_modified == "2026-02-01T00:00:00Z")
    assert(x1.google_spreadsheet_name == "one-renamed" && x1.last_seen == 200L)
    assert(meta.spreadsheets.count() == 3)
    assert(meta.spreadsheets.collect().map(_.id).distinct.length == 3)
    assert(meta.getOldestSeen().contains("X2")) // last_seen=100, tie-broken by id
  }

  test("verifyOldestSpreadsheet: refresh on success, false when inaccessible (R30)") {
    val (dir, tasks, meta, _) = freshWorld()
    tasks.findSomeUpdatedSpreadsheets()
    assert(tasks.verifyOldestSpreadsheet())
    // make the file disappear from the source
    Files.delete(dir.resolve("a.json"))
    assert(!tasks.verifyOldestSpreadsheet())
  }

  test("header errors are wrapped with spreadsheet URL context (R31)") {
    val (_, tasks, _, _) = freshWorld()
    tasks.findSomeUpdatedSpreadsheets()
    tasks.setConfiguration(Seq(peopleCfg.copy(
      columnMapping = Seq("x" -> Right("Nope")))))
    val e = intercept[IllegalArgumentException] { tasks.loadSomeUpdatedSpreadsheets() }
    assert(e.getMessage.contains("Required column not found: Nope"))
    assert(e.getMessage.contains(s"https://docs.google.com/spreadsheets/d/$Sid"))
  }
}
