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

object EtlConfig {
  private val mapper = new ObjectMapper()

  /** Parse the nested spreadsheetId → sheetName → job JSON
    * (reference: src/EtlConfig.php:34-54). Skips the `$schema` key.
    * Config is tiny → driver-side parse, no Spark involved.
    */
  def fromJson(json: String): Seq[EtlConfig] = {
    val root = mapper.readTree(json)
    root.properties().asScala.iterator.flatMap { e =>
      val spreadsheetId = e.getKey
      if (spreadsheetId == "$schema") Iterator.empty
      else e.getValue.properties().asScala.iterator.map { s =>
        val sheetName = s.getKey
        val cfg = s.getValue
        EtlConfig(
          googleSpreadsheetId = spreadsheetId,
          sheetName = sheetName,
          targetTable = cfg.get("targetTable").asText(),
          columnMapping = cfg.get("columnMapping").properties().asScala.iterator.map { m =>
            m.getKey -> specifier(m.getValue)
          }.toSeq,
          headerRow = Option(cfg.get("headerRow")).map(_.asInt()).getOrElse(0),
          skipRows = Option(cfg.get("skipRows")).map(_.asInt()).getOrElse(1))
      }
    }.toSeq
  }

  def fromFile(path: String): Seq[EtlConfig] =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  private def specifier(n: JsonNode): Either[Int, String] =
    if (n.isInt || n.isLong) Left(n.asInt())
    else if (n.isTextual) Right(n.asText())
    else throw new IllegalArgumentException(s"Invalid column specifier: $n")
}
