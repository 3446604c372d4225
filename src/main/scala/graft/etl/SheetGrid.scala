package graft.etl

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** The sheet grid: rows of columns of trimmed string cells
  * (SURVEY.md §1.1.1; reference: src/RowsOfColumns.php:7-28).
  *
  * Rows are ragged — trailing empty cells/rows are absent — and a missing
  * cell projects to null (reference: src/RowsOfColumns.php:10,76). `hash` is
  * a SHA-256 over the canonical JSON encoding of the *raw* (untrimmed) grid,
  * computed at extraction time (reference: src/GoogleSheetsAgent.php:167);
  * it keys idempotent reloads (R21) so it only needs to be stable, not
  * byte-identical to PHP's json_encode.
  *
  * A grid is bounded by the Sheets API model (≤10M cells) so it lives on the
  * driver; the Spark boundary is [[SheetGrid.toRows]] → `createDataFrame`.
  */
final case class SheetGrid(rows: Vector[Vector[String]], hash: String) {

  /** Header resolution (R8; reference: src/RowsOfColumns.php:37-60).
    *
    * Each specifier is a 0-based index (bounds-checked against the header
    * row) or an exact, case-sensitive name (first match wins). Error
    * messages are contract (SURVEY.md §5.3): "Column index out of bounds",
    * "Required column not found".
    */
  def columnSelectorsFromHeaderRow(
      specifiers: Seq[Either[Int, String]],
      headerRow: Int = 0): Seq[Int] = {
    // contract error, not a raw IndexOutOfBounds: an empty sheet (or a
    // config pointing past the grid) is a config/data mismatch the
    // operator needs to read at a glance, wrapped with the spreadsheet
    // URL by Tasks.loadSheet (R31)
    if (headerRow < 0 || headerRow >= rows.length)
      throw new IllegalArgumentException(
        s"Header row $headerRow out of bounds (grid has ${rows.length} row(s))")
    val row = rows(headerRow)
    specifiers.map {
      case Left(index) =>
        if (index < row.length) index
        else throw new IllegalArgumentException(s"Column index out of bounds: $index")
      case Right(name) =>
        val i = row.indexOf(name) // strict, case-sensitive, first match
        if (i < 0) throw new IllegalArgumentException(s"Required column not found: $name")
        i
    }
  }

  /** Projection + row-skip + null-padding (R9–R11; reference:
    * src/RowsOfColumns.php:70-81). Output rows are 0-based over the
    * *post-skip* rows — `_origin_row` semantics (SURVEY.md §7.4).
    */
  def toRows(selectors: Seq[Int], skipRows: Int = 1): Vector[Vector[Option[String]]] =
    rows.drop(skipRows).map { row =>
      selectors.map(s => if (s < row.length) Some(row(s)) else None).toVector
    }
}

object SheetGrid {

  /** Build from a raw `ValueRange`-shaped grid: every cell trimmed
    * (R7; reference: src/RowsOfColumns.php:18-28); hash over the raw cells.
    */
  def fromValues(values: Seq[Seq[String]]): SheetGrid =
    SheetGrid(values.map(_.map(_.trim).toVector).toVector, hashOf(values))

  /** Stable content hash of the raw grid (R3). Canonical JSON array-of-
    * arrays with minimal string escaping; SHA-256 hex, lowercase.
    */
  def hashOf(values: Seq[Seq[String]]): String = {
    val sb = new StringBuilder("[")
    var firstRow = true
    values.foreach { row =>
      if (!firstRow) sb.append(','); firstRow = false
      sb.append('[')
      var firstCell = true
      row.foreach { cell =>
        if (!firstCell) sb.append(','); firstCell = false
        sb.append('"')
        cell.foreach {
          case '"' => sb.append("\\\"")
          case '\\' => sb.append("\\\\")
          case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
          case c => sb.append(c)
        }
        sb.append('"')
      }
      sb.append(']')
    }
    sb.append(']')
    sha256Hex(sb.toString)
  }

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
}
