package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming discovery source (SURVEY.md §7.5): the reference's
  * spreadsheet-modification stream as a DSv2 `MicroBatchStream` whose
  * offset IS the warehouse cursor — the lexically-ordered
  * `(modifiedTime, id)` keyset tuple (reference:
  * src/GoogleSheetsAgent.php:76-90, src/Tasks.php:34-56).
  *
  *   spark.readStream.format("graft.etl.GridDiscoveryProvider")
  *     .option("path", fixtureDir).load()
  *
  * Each micro-batch emits the spreadsheets whose `(modifiedTime, id)` lies
  * in `(startOffset, endOffset]` — at-least-once discovery events that
  * downstream upserts (R17) make idempotent, exactly the reference's
  * redelivery-safety model. No watermark: Drive modifiedTime is monotone
  * per file, so a regressing event cannot exist by construction (SURVEY.md
  * §2.1 streaming).
  *
  * The default epoch offset is the reference's `2001-01-01T00:00:00Z`
  * (src/Tasks.php:36).
  */
class GridDiscoveryProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridDiscoveryProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DiscoveryTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object GridDiscoveryProvider {
  val Schema: StructType = StructType(Seq(
    StructField("spreadsheet_id", StringType, nullable = false),
    StructField("modified_time", StringType, nullable = false),
    StructField("name", StringType, nullable = false)))
  val EpochModified = "2001-01-01T00:00:00Z"
}

/** The streaming cursor: a lexical `(modifiedTime, id)` tuple. */
final case class CursorOffset(modifiedTime: String, id: String) extends Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    m.writeValueAsString(m.createObjectNode()
      .put("modifiedTime", modifiedTime).put("id", id))
  }
  def lessThan(o: CursorOffset): Boolean =
    modifiedTime < o.modifiedTime ||
      (modifiedTime == o.modifiedTime && id < o.id)
}

object CursorOffset {
  val Epoch: CursorOffset = CursorOffset(GridDiscoveryProvider.EpochModified, "")
  def fromJson(json: String): CursorOffset = {
    val n = new ObjectMapper().readTree(json)
    CursorOffset(n.get("modifiedTime").asText(), n.get("id").asText())
  }
}

final class DiscoveryTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft.etl.GridDiscoveryProvider requires option(\"path\", ...)")
  override def name(): String = s"grid-discovery(`$path`)"
  override def schema(): StructType = GridDiscoveryProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new DiscoveryScan(path)
}

final case class DiscoveryPartition(metas: Seq[SpreadsheetMeta]) extends InputPartition

final class DiscoveryScan(path: String) extends Scan {
  override def readSchema(): StructType = GridDiscoveryProvider.Schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new DiscoveryMicroBatchStream(path)
}

/** Implements [[SupportsTriggerAvailableNow]] so the stream honors
  * `Trigger.AvailableNow` natively — the reference's operating mode is
  * exactly that: a bounded scheduled run that drains everything past the
  * cursor and exits (src/Tasks.php:34-65, the 300 s CLI bound). Under
  * AvailableNow the high-water mark is pinned at query start, so files
  * modified mid-run wait for the next scheduled run instead of extending
  * this one.
  */
final class DiscoveryMicroBatchStream(path: String)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  private def source = new LocalGridSource(path)

  /** End offset pinned by prepareForTriggerAvailableNow (AvailableNow). */
  private var fixedEnd: Option[CursorOffset] = None

  /** Latest known (modifiedTime, id) across the source — the stream's
    * high-water mark. A real Google-backed stream would page via R1 here.
    */
  private def scanLatest(): CursorOffset = {
    val all = source.list(GridDiscoveryProvider.EpochModified, "", Int.MaxValue)
    if (all.isEmpty) CursorOffset.Epoch
    else {
      val m = all.maxBy(s => (s.modifiedTime, s.id))
      CursorOffset(m.modifiedTime, m.id)
    }
  }

  override def initialOffset(): Offset = CursorOffset.Epoch

  override def prepareForTriggerAvailableNow(): Unit = fixedEnd = Some(scanLatest())

  override def latestOffset(): Offset = fixedEnd.getOrElse(scanLatest())

  /** SupportsAdmissionControl variant (the engine calls this one when the
    * interface is present); read limits don't apply to a metadata-scale
    * listing, so it defers to the same high-water mark.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CursorOffset]
    val e = end.asInstanceOf[CursorOffset]
    val metas = source.list(s.modifiedTime, s.id, Int.MaxValue)
      // strict (start, end]: drop the start tuple itself (already emitted)
      .filter(m => (m.modifiedTime, m.id) != ((s.modifiedTime, s.id)))
      .filter(m => m.modifiedTime < e.modifiedTime ||
        (m.modifiedTime == e.modifiedTime && m.id <= e.id))
    if (metas.isEmpty) Array.empty
    else Array(DiscoveryPartition(metas))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[DiscoveryPartition].metas.iterator
      private var cur: SpreadsheetMeta = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = new GenericInternalRow(Array[Any](
        UTF8String.fromString(cur.id), UTF8String.fromString(cur.modifiedTime),
        UTF8String.fromString(cur.name)))
      override def close(): Unit = ()
    }

  override def deserializeOffset(json: String): Offset = CursorOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
