package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One per-sheet ETL job (SURVEY.md §1.1 job-config model; reference:
  * src/EtlConfig.php:12-17, defaults :48-49).
  *
  * `columnMapping` is ordered: output column order = mapping key order
  * (reference: src/Tasks.php:124). Values are either an exact header name
  * (Right) or a 0-based column index (Left), per config-schema.json:43-53.
  */
final case class EtlConfig(
    googleSpreadsheetId: String,
    sheetName: String,
    targetTable: String,
    columnMapping: Seq[(String, Either[Int, String])],
    headerRow: Int = 0,
    skipRows: Int = 1)

/** Raised when the config JSON violates the reference's published contract
  * (`config-schema.json`) — the validation the reference delegates to its
  * JSON Schema file, surfaced here as a first-parse error instead of a
  * downstream NPE or silent mis-read.
  */
final class EtlConfigException(message: String)
  extends IllegalArgumentException(message)

object EtlConfig {
  private val mapper = new ObjectMapper()

  /** 44-char spreadsheet-key pattern (config-schema.json:18 / :17). */
  private val SpreadsheetKey = "^[0-9a-zA-Z_/-]{44}$".r

  /** Parse + validate the nested spreadsheetId → sheetName → job JSON
    * (reference: src/EtlConfig.php:34-54; contract:
    * config-schema.json:17-59 — 44-char spreadsheet keys, required
    * `targetTable` + `columnMapping`, integer `headerRow`/`skipRows`,
    * string-or-nonnegative-int column specifiers). Skips the `$schema`
    * key. Config is tiny → driver-side parse, no Spark involved.
    */
  def fromJson(json: String): Seq[EtlConfig] = {
    val root = mapper.readTree(json)
    if (!root.isObject)
      throw new EtlConfigException("Config root must be a JSON object")
    root.properties().asScala.iterator.flatMap { e =>
      val spreadsheetId = e.getKey
      if (spreadsheetId == "$schema") Iterator.empty
      else {
        if (SpreadsheetKey.findFirstIn(spreadsheetId).isEmpty)
          throw new EtlConfigException(
            s"Invalid spreadsheet key (must match ^[0-9a-zA-Z_/-]{44}$$): $spreadsheetId")
        if (!e.getValue.isObject)
          throw new EtlConfigException(
            s"Spreadsheet entry must be an object of sheets: $spreadsheetId")
        e.getValue.properties().asScala.iterator.map { s =>
          job(spreadsheetId, s.getKey, s.getValue)
        }
      }
    }.toSeq
  }

  private def job(spreadsheetId: String, sheetName: String, cfg: JsonNode): EtlConfig = {
    def ctx = s"$spreadsheetId/$sheetName"
    if (!cfg.isObject)
      throw new EtlConfigException(s"Sheet entry must be an object: $ctx")
    val target = cfg.get("targetTable")
    if (target == null || !target.isTextual)
      throw new EtlConfigException(s"Missing required string 'targetTable' in $ctx")
    val mapping = cfg.get("columnMapping")
    if (mapping == null || !mapping.isObject)
      throw new EtlConfigException(s"Missing required object 'columnMapping' in $ctx")
    def intField(name: String, default: Int): Int =
      Option(cfg.get(name)).map { n =>
        if (!n.isIntegralNumber)
          throw new EtlConfigException(s"'$name' must be an integer in $ctx")
        n.asInt()
      }.getOrElse(default)
    EtlConfig(
      googleSpreadsheetId = spreadsheetId,
      sheetName = sheetName,
      targetTable = target.asText(),
      columnMapping = mapping.properties().asScala.iterator.map { m =>
        m.getKey -> specifier(m.getValue, ctx)
      }.toSeq,
      headerRow = intField("headerRow", 0),
      skipRows = intField("skipRows", 1))
  }

  def fromFile(path: String): Seq[EtlConfig] =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Column specifier: header name (string) or 0-based index (int ≥ 0),
    * config-schema.json:43-53.
    */
  private def specifier(n: JsonNode, ctx: String): Either[Int, String] =
    if (n.isIntegralNumber) {
      if (n.asInt() < 0)
        throw new EtlConfigException(s"Column index must be >= 0 in $ctx: $n")
      Left(n.asInt())
    } else if (n.isTextual) Right(n.asText())
    else throw new EtlConfigException(s"Invalid column specifier in $ctx: $n")
}
