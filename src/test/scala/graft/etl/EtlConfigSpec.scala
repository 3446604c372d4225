package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class EtlConfigSpec extends AnyFunSuite {

  private val json =
    """{
      |  "$schema": "./config-schema.json",
      |  "1b33RL2nQJxdaHYxVmkk4lo3K1IKjSD3_ggnokrZCkx8": {
      |    "2019 Expirations": {
      |      "targetTable": "certification_course_renewals_2019",
      |      "columnMapping": {"name": "Name", "email": "Émail Address", "flag": 3},
      |      "headerRow": 0,
      |      "skipRows": 1
      |    },
      |    "Sheet2": {
      |      "targetTable": "t2",
      |      "columnMapping": {"a": 0}
      |    }
      |  }
      |}""".stripMargin

  test("parses nested config, skips $schema, preserves mapping order") {
    val configs = EtlConfig.fromJson(json)
    assert(configs.size == 2)
    val c = configs.find(_.sheetName == "2019 Expirations").get
    assert(c.googleSpreadsheetId == "1b33RL2nQJxdaHYxVmkk4lo3K1IKjSD3_ggnokrZCkx8")
    assert(c.targetTable == "certification_course_renewals_2019")
    assert(c.columnMapping ==
      Seq("name" -> Right("Name"), "email" -> Right("Émail Address"), "flag" -> Left(3)))
    assert(c.headerRow == 0 && c.skipRows == 1)
  }

  test("defaults headerRow=0 skipRows=1 when omitted") {
    val c = EtlConfig.fromJson(json).find(_.sheetName == "Sheet2").get
    assert(c.headerRow == 0 && c.skipRows == 1)
    assert(c.columnMapping == Seq("a" -> Left(0)))
  }

  // ---- config-schema.json contract (reference: config-schema.json:17-59) --

  private val Key = "1b33RL2nQJxdaHYxVmkk4lo3K1IKjSD3_ggnokrZCkx8"

  private def bad(json: String): String =
    intercept[EtlConfigException](EtlConfig.fromJson(json)).getMessage

  test("rejects spreadsheet keys that are not 44-char ids") {
    assert(bad("""{"shortKey": {}}""").contains("Invalid spreadsheet key"))
    assert(bad(s"""{"${"x" * 45}": {}}""").contains("Invalid spreadsheet key"))
    assert(bad(s"""{"${"a" * 43}!": {}}""").contains("Invalid spreadsheet key"))
  }

  test("rejects missing or non-string targetTable with a contract error") {
    val m = bad(s"""{"$Key": {"S": {"columnMapping": {"a": 0}}}}""")
    assert(m.contains("Missing required string 'targetTable'") && m.contains(s"$Key/S"))
    assert(bad(s"""{"$Key": {"S": {"targetTable": 7, "columnMapping": {}}}}""")
      .contains("targetTable"))
  }

  test("rejects missing or non-object columnMapping") {
    assert(bad(s"""{"$Key": {"S": {"targetTable": "t"}}}""")
      .contains("Missing required object 'columnMapping'"))
    assert(bad(s"""{"$Key": {"S": {"targetTable": "t", "columnMapping": []}}}""")
      .contains("columnMapping"))
  }

  test("rejects non-integer headerRow/skipRows and invalid specifiers") {
    assert(bad(s"""{"$Key": {"S": {"targetTable": "t",
      "columnMapping": {"a": 0}, "headerRow": "zero"}}}""")
      .contains("'headerRow' must be an integer"))
    assert(bad(s"""{"$Key": {"S": {"targetTable": "t",
      "columnMapping": {"a": 0}, "skipRows": 1.5}}}""")
      .contains("'skipRows' must be an integer"))
    assert(bad(s"""{"$Key": {"S": {"targetTable": "t", "columnMapping": {"a": -1}}}}""")
      .contains("Column index must be >= 0"))
    assert(bad(s"""{"$Key": {"S": {"targetTable": "t", "columnMapping": {"a": true}}}}""")
      .contains("Invalid column specifier"))
  }

  test("rejects non-object spreadsheet and sheet entries") {
    assert(bad(s"""{"$Key": 3}""").contains("must be an object of sheets"))
    assert(bad(s"""{"$Key": {"S": "nope"}}""").contains("Sheet entry must be an object"))
    assert(bad("""[1,2]""").contains("Config root must be a JSON object"))
  }
}

class RetrySpec extends AnyFunSuite {
  test("backoff delay formula: 1000·2^n + jitter(0..1000)") {
    assert(Retry.delayMillis(0, _ => 0) == 1000L)
    assert(Retry.delayMillis(3, _ => 0) == 8000L)
    assert(Retry.delayMillis(2, _ => 999) == 4999L)
  }

  test("retries at most 5 times then rethrows; success stops retrying") {
    var calls = 0
    val e = intercept[java.io.IOException] {
      Retry(sleep = _ => ()) { calls += 1; throw new java.io.IOException("boom") }
    }
    assert(e.getMessage == "boom" && calls == 6) // 1 try + 5 retries
    calls = 0
    val ok = Retry(sleep = _ => ()) {
      calls += 1; if (calls < 3) throw new java.io.IOException; 42 }
    assert(ok == 42 && calls == 3)
  }

  test("non-transport failures are NOT retried by default") {
    // the default predicate retries transport errors only — a parse error
    // or contract violation must surface immediately, not after 5
    // exponential sleeps
    var calls = 0
    intercept[RuntimeException] {
      Retry(sleep = _ => ()) { calls += 1; throw new RuntimeException("bug") }
    }
    assert(calls == 1)
  }

  test("retryable statuses match the reference's set") {
    assert(Retry.RetryStatuses == Set(429, 500, 502, 503, 504))
  }
}
