package graft.etl

import graft.SparkTestSession
import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: fixture grids → discovery → load → target + accounting
  * contents (SURVEY.md §5.3 item 2).
  *
  * Every pipeline test runs against BOTH accounting backends (R27 —
  * mirroring the reference's sqlite-vs-mysql agent duality,
  * src/DatabaseAgent.php:70-81, and its sqlite unit test
  * tests/DatabaseAgentSqliteTest.php:17-30): the durable parquet
  * [[SnapshotMetaStorage]] and the driver-held [[InMemoryMetaStorage]],
  * both constructed through the [[MetaStorage.forUrl]] factory.
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

  private def metaUrl(backend: String, wh: String): String = backend match {
    case "snapshot" => s"parquet:$wh/meta"
    case "memory"   => "memory:"
  }

  private def freshWorld(backend: String): (Path, Tasks, MetaStore, TargetStore) = {
    val dir = Files.createTempDirectory("graft-fixtures")
    val wh = Files.createTempDirectory("graft-wh").toString
    writeFixture(dir, "a.json", Sid, "2019 Expirations", "2026-05-01T12:00:00.000Z", people)
    val meta = new MetaStore(spark, MetaStorage.forUrl(spark, metaUrl(backend, wh)))
    val targets = new TargetStore(spark, s"$wh/tables")
    meta.setUpAccounting()
    meta.setUpAccounting() // idempotent (R25)
    val tasks = new Tasks(new LocalGridSource(dir.toString), meta, targets, loadTime = 1746100000L)
    tasks.setConfiguration(Seq(peopleCfg))
    (dir, tasks, meta, targets)
  }

  for (backend <- Seq("snapshot", "memory")) {

    test(s"[$backend] full run loads the FIXTURES.md §4 expected target") {
      val (_, tasks, meta, targets) = freshWorld(backend)
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

    test(s"[$backend] second run is a no-op (R16 filter + R21 hash skip); reload on change replaces rows") {
      val (dir, tasks, meta, targets) = freshWorld(backend)
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

    test(s"[$backend] additive schema evolution across jobs in one target (R18)") {
      val (dir, tasks, meta, targets) = freshWorld(backend)
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

    test(s"[$backend] upsert last-writer-wins keeps ids stable (R17)") {
      val (_, _, meta, _) = freshWorld(backend)
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

    test(s"[$backend] verifyOldestSpreadsheet: refresh on success, false when inaccessible (R30)") {
      val (dir, tasks, meta, _) = freshWorld(backend)
      tasks.findSomeUpdatedSpreadsheets()
      assert(tasks.verifyOldestSpreadsheet())
      // make the file disappear from the source
      Files.delete(dir.resolve("a.json"))
      assert(!tasks.verifyOldestSpreadsheet())
    }

    test(s"[$backend] header errors are wrapped with spreadsheet URL context (R31)") {
      val (_, tasks, _, _) = freshWorld(backend)
      tasks.findSomeUpdatedSpreadsheets()
      tasks.setConfiguration(Seq(peopleCfg.copy(
        columnMapping = Seq("x" -> Right("Nope")))))
      val e = intercept[IllegalArgumentException] { tasks.loadSomeUpdatedSpreadsheets() }
      assert(e.getMessage.contains("Required column not found: Nope"))
      assert(e.getMessage.contains(s"https://docs.google.com/spreadsheets/d/$Sid"))
    }
  }

  test("R26: two prefixed/schema'd configs share one warehouse root without collision") {
    val dirA = Files.createTempDirectory("graft-fixtures-a")
    val dirB = Files.createTempDirectory("graft-fixtures-b")
    val wh = Files.createTempDirectory("graft-wh").toString
    writeFixture(dirA, "a.json", Sid, "2019 Expirations", "2026-05-01T12:00:00.000Z", people)
    writeFixture(dirB, "b.json", Sid2, "Sheet1", "2026-05-02T00:00:00.000Z", Seq(
      Seq("Name"), Seq("Zoe")))

    // Tenant A: prefix only; tenant B: schema + prefix. Same warehouse
    // root, same bare target-table name — the reference's knobs
    // (src/DatabaseAgent.php:53-61) exist exactly so these never collide.
    val namingA = TableNaming(None, Some("a_"))
    val namingB = TableNaming(Some("tenant_b"), Some("b_"))
    def world(dir: Path, naming: TableNaming, cfg: EtlConfig): (Tasks, TargetStore) = {
      val meta = new MetaStore(spark, s"$wh/meta", naming)
      val targets = new TargetStore(spark, s"$wh/tables", naming)
      meta.setUpAccounting()
      val tasks = new Tasks(new LocalGridSource(dir.toString), meta, targets, loadTime = 1746100000L)
      tasks.setConfiguration(Seq(cfg))
      (tasks, targets)
    }
    val (tasksA, targetsA) = world(dirA, namingA, peopleCfg)
    val (tasksB, targetsB) = world(dirB, namingB,
      EtlConfig(Sid2, "Sheet1", "renewals_2019", Seq("name" -> Right("Name"))))

    tasksA.findSomeUpdatedSpreadsheets(); tasksA.loadSomeUpdatedSpreadsheets()
    tasksB.findSomeUpdatedSpreadsheets(); tasksB.loadSomeUpdatedSpreadsheets()

    // distinct physical locations, both under the shared root
    assert(targetsA.path("renewals_2019") == s"$wh/tables/a_renewals_2019")
    assert(targetsB.path("renewals_2019") == s"$wh/tables/tenant_b/b_renewals_2019")
    assert(targetsA.read("renewals_2019").select("name").collect().map(_.getString(0)).toSet
      == Set("Alice", "Bob", ""))
    assert(targetsB.read("renewals_2019").select("name").collect().map(_.getString(0)).toSet
      == Set("Zoe"))

    // accounting is independent too: A tracks only Sid, B only Sid2
    val metaA = new MetaStore(spark, s"$wh/meta", namingA)
    val metaB = new MetaStore(spark, s"$wh/meta", namingB)
    assert(metaA.spreadsheets.collect().map(_.google_spreadsheet_id).toSeq == Seq(Sid))
    assert(metaB.spreadsheets.collect().map(_.google_spreadsheet_id).toSeq == Seq(Sid2))
  }
}
