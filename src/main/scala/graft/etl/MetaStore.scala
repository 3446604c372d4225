package graft.etl

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `__meta_spreadsheets` row (SURVEY.md §1.1.2; reference:
  * src/DatabaseAgentMysql.php:98-106). `google_modified` is an RFC 3339
  * string compared lexically; `last_seen` is Unix seconds.
  */
final case class SpreadsheetSeen(
    id: Long,
    google_spreadsheet_id: String,
    google_modified: String,
    google_spreadsheet_name: String,
    last_seen: Long)

/** `__meta_etl_jobs` row (reference: src/DatabaseAgentMysql.php:111-124);
  * unique on (spreadsheet_id, sheet_name).
  */
final case class EtlJobRow(
    id: Long,
    spreadsheet_id: Long,
    sheet_name: String,
    target_table: String,
    google_modified: String,
    raw_columns_rows_hash: String)

/** The ETL accounting store (R14–R17, R19–R20, R25).
  *
  * All accounting LOGIC lives here, expressed as Spark plans; physical
  * storage is behind the [[MetaStorage]] trait (R27 — the reference's
  * sqlite/mysql agent split, `src/DatabaseAgent.php:70-81`), so the same
  * upsert/checkpoint/filter semantics run against any backend.
  *
  * The observable "no partial effect" contract of
  * reference: src/DatabaseAgent.php:136-142 is preserved by ordering: target
  * data commits first, the job hash commits last, and a stale hash only
  * causes a redundant, idempotent reload (SURVEY.md §7.4).
  *
  * Scale note: accounting tables are metadata-scale (1 row per spreadsheet /
  * job), so snapshots coalesce to 1 file; upserts are still expressed as
  * distributed window-dedup plans, so the same code holds if the fleet of
  * tracked sheets grows by orders of magnitude (drop the coalesce, keep the
  * plan).
  */
final class MetaStore(spark: SparkSession, storage: MetaStorage) {
  import spark.implicits._

  /** Parquet-snapshot convenience constructor (the default backend). */
  def this(spark: SparkSession, root: String) =
    this(spark, new SnapshotMetaStorage(spark, root))

  /** Snapshot backend with R26 name qualification: schema/prefix apply to
    * the accounting tables exactly as the reference qualifies them
    * (src/DatabaseAgentMysql.php:98,111 render accounting DDL through
    * `quotedFullyQualifiedTableName`), so two prefixed configs sharing one
    * warehouse root keep separate accounting too.
    */
  def this(spark: SparkSession, root: String, naming: TableNaming) =
    this(spark, new SnapshotMetaStorage(spark, root, naming))

  val SpreadsheetsTable = "__meta_spreadsheets"
  val EtlJobsTable = "__meta_etl_jobs"

  private val spreadsheetsSchema =
    org.apache.spark.sql.Encoders.product[SpreadsheetSeen].schema
  private val etlJobsSchema =
    org.apache.spark.sql.Encoders.product[EtlJobRow].schema

  /** Idempotent accounting DDL (R25; reference contract:
    * src/DatabaseAgent.php:119-124 "Calling this method twice shall not
    * cause data loss or error").
    */
  def setUpAccounting(): Unit = {
    if (!storage.exists(SpreadsheetsTable))
      storage.replace(SpreadsheetsTable, spark.emptyDataset[SpreadsheetSeen].toDF())
    if (!storage.exists(EtlJobsTable))
      storage.replace(EtlJobsTable, spark.emptyDataset[EtlJobRow].toDF())
  }

  def spreadsheets: Dataset[SpreadsheetSeen] =
    storage.read(SpreadsheetsTable, spreadsheetsSchema).as[SpreadsheetSeen]

  def etlJobs: Dataset[EtlJobRow] =
    storage.read(EtlJobsTable, etlJobsSchema).as[EtlJobRow]

  /** Checkpoint read (R14; reference: src/DatabaseAgentMysql.php:24-35):
    * greatest `(google_modified, google_spreadsheet_id)` lexical tuple.
    * Catalyst plans this as TakeOrderedAndProject — no full sort.
    */
  def getGreatestModified(): Option[(String, String)] =
    spreadsheets
      .orderBy(desc("google_modified"), desc("google_spreadsheet_id"))
      .limit(1)
      .select("google_modified", "google_spreadsheet_id")
      .as[(String, String)].collect().headOption

  /** Audit pick (R15; reference: src/DatabaseAgentMysql.php:38-49): id with
    * smallest `last_seen` (id tie-break added for determinism — the
    * reference's bare `ORDER BY last_seen LIMIT 1` leaves ties unspecified).
    */
  def getOldestSeen(): Option[String] =
    spreadsheets
      .orderBy(asc("last_seen"), asc("google_spreadsheet_id"))
      .limit(1)
      .select("google_spreadsheet_id")
      .as[String].collect().headOption

  /** Upsert spreadsheets-seen (R17; reference:
    * src/DatabaseAgentMysql.php:130-149): last-writer-wins keyed on the
    * unique `google_spreadsheet_id`; new keys get fresh increasing ids
    * (reference keeps ids increasing for insert speed,
    * src/DatabaseAgent.php:17-18 — here they are stable FK targets).
    */
  def setSpreadsheetsSeen(metas: Seq[SpreadsheetMeta], lastSeen: Long): Unit = {
    if (metas.isEmpty) return
    val incoming = metas.map(m =>
      SpreadsheetSeen(0L, m.id, m.modifiedTime, m.name, lastSeen)).toDS().toDF()
    val existing = spreadsheets.toDF()
    val key = col("google_spreadsheet_id")
    val merged = existing.withColumn("_prec", lit(0))
      .unionByName(incoming.withColumn("_prec", lit(1)))
      // carry the existing id (if any) to the winning row
      .withColumn("_id", max(when(col("_prec") === 0, col("id"))).over(
        Window.partitionBy(key)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(key).orderBy(desc("_prec"))))
      .filter(col("_rn") === 1)
    val maxId = existing.agg(coalesce(max("id"), lit(0L))).as[Long].head()
    val out = merged
      .withColumn("id", when(col("_id").isNotNull, col("_id"))
        .otherwise(lit(maxId) + row_number().over(
          Window.partitionBy(col("_id").isNull).orderBy(key))))
      .select("id", "google_spreadsheet_id", "google_modified",
        "google_spreadsheet_name", "last_seen")
    storage.replace(SpreadsheetsTable, out)
  }

  def setSpreadsheetSeen(meta: SpreadsheetMeta, lastSeen: Long): Unit =
    setSpreadsheetsSeen(Seq(meta), lastSeen)

  /** Change filter (R16; reference: src/DatabaseAgentMysql.php:52-87):
    * drop jobs whose (spreadsheet, sheet) is already loaded at the current
    * `google_modified` — a left-anti join against the up-to-date set.
    * Config lists are small ⇒ Catalyst broadcasts both sides.
    */
  def filterExtractable(jobs: Seq[EtlConfig]): Seq[EtlConfig] = {
    if (jobs.isEmpty) return jobs
    val upToDate = spreadsheets.toDF().alias("s")
      .join(etlJobs.toDF().alias("j"), col("j.spreadsheet_id") === col("s.id"))
      .filter(col("s.google_modified") === col("j.google_modified"))
      .select(col("s.google_spreadsheet_id"), col("j.sheet_name"))
      .as[(String, String)].collect().toSet
    jobs.filterNot(j => upToDate.contains((j.googleSpreadsheetId, j.sheetName)))
  }

  /** Hash lookup (R19; reference: src/DatabaseAgentMysql.php:198-211). Must
    * be read *before* this load's accounting writes (SURVEY.md §7.4).
    */
  def getJobHash(googleSpreadsheetId: String, sheetName: String): Option[String] =
    etlJobs.toDF().alias("j")
      .join(spreadsheets.toDF().alias("s"), col("j.spreadsheet_id") === col("s.id"))
      .filter(col("s.google_spreadsheet_id") === googleSpreadsheetId &&
        col("j.sheet_name") === sheetName)
      .select(col("j.raw_columns_rows_hash"))
      .as[String].collect().headOption.filter(_.nonEmpty)

  /** Ensure a job row exists and return its id (lineage FK). Does NOT
    * advance `google_modified`/hash — that happens in [[commitJob]], after
    * the target data is durably written (§7.4 ordering).
    */
  def ensureJob(googleSpreadsheetId: String, sheetName: String, targetTable: String): Long = {
    val sid = spreadsheetIdOf(googleSpreadsheetId)
    jobIdOf(sid, sheetName) match {
      case Some(id) =>
        // target table may legitimately be re-pointed by config
        val updated = etlJobs.toDF()
          .withColumn("target_table",
            when(col("id") === id, lit(targetTable)).otherwise(col("target_table")))
        storage.replace(EtlJobsTable, updated)
        id
      case None =>
        val maxId = etlJobs.agg(coalesce(max("id"), lit(0L))).as[Long].head()
        val row = Seq(EtlJobRow(maxId + 1, sid, sheetName, targetTable, "", "")).toDS().toDF()
        storage.replace(EtlJobsTable, etlJobs.toDF().unionByName(row))
        maxId + 1
    }
  }

  /** Post-load accounting commit (R20 upsert's hash/modified half;
    * reference: src/DatabaseAgentMysql.php:213-230 — the reference copies
    * the spreadsheet row's current `google_modified` into the job row).
    */
  def commitJob(googleSpreadsheetId: String, sheetName: String, hash: String): Unit = {
    val sid = spreadsheetIdOf(googleSpreadsheetId)
    val modified = spreadsheets
      .filter(col("google_spreadsheet_id") === googleSpreadsheetId)
      .select("google_modified").as[String].head()
    val updated = etlJobs.toDF()
      .withColumn("_hit", col("spreadsheet_id") === sid && col("sheet_name") === sheetName)
      .withColumn("google_modified",
        when(col("_hit"), lit(modified)).otherwise(col("google_modified")))
      .withColumn("raw_columns_rows_hash",
        when(col("_hit"), lit(hash)).otherwise(col("raw_columns_rows_hash")))
      .drop("_hit")
    storage.replace(EtlJobsTable, updated)
  }

  def spreadsheetIdOf(googleSpreadsheetId: String): Long =
    spreadsheets.filter(col("google_spreadsheet_id") === googleSpreadsheetId)
      .select("id").as[Long].collect().headOption
      .getOrElse(throw new NoSuchElementException(
        s"Spreadsheet not seen: $googleSpreadsheetId"))

  private def jobIdOf(spreadsheetId: Long, sheetName: String): Option[Long] =
    etlJobs.filter(col("spreadsheet_id") === spreadsheetId &&
      col("sheet_name") === sheetName)
      .select("id").as[Long].collect().headOption
}
