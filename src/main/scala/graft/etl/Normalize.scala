package graft.etl

import java.text.Normalizer

/** Column-name normalization (SURVEY.md §2 R12).
  *
  * Reproduces the reference's identifier gauntlet
  * (reference: src/DatabaseAgentMysql.php:327-344): ASCII transliteration,
  * lowercase, strip everything but `[a-z0-9_ ]`, trim, `_`-prefix names not
  * starting `[a-z_]`, and a `col_<index+1>` (1-based) fallback when the
  * result is empty, a duplicate of an earlier output, or itself shaped like
  * `col_<n>`. The fallback is deliberately order-dependent (the reference
  * checks `in_array($column, $retval)` against prior outputs only).
  *
  * Transliteration note: the reference uses `iconv('UTF-8','ASCII//TRANSLIT')`
  * whose exact output is libc/locale dependent; we use the portable Unicode
  * NFKD + strip-combining-marks equivalent (é→e, ü→u), dropping any remaining
  * non-ASCII — the documented intent ("names which MySQL and SQLite allow as
  * ASCII identifiers", reference: src/DatabaseAgentMysql.php:318-326).
  */
object Normalize {
  private val ColN = "^col_[0-9]+$".r
  private val Marks = "\\p{M}+".r

  def transliterate(s: String): String =
    Marks.replaceAllIn(Normalizer.normalize(s, Normalizer.Form.NFKD), "")
      .filter(_ < 128)

  /** Normalize a full header row; order-dependent, total, duplicate-free. */
  def columnNames(columns: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    columns.zipWithIndex.foreach { case (raw, index) =>
      var c = transliterate(raw).toLowerCase
      c = c.replaceAll("[^a-z0-9_ ]", "").trim
      if (!c.matches("^[a-z_].*")) c = "_" + c
      // NB: after the `_` prefix the name is never empty, so the reference's
      // `empty($column)` branch is unreachable; a bare `_` is a legal output.
      if (ColN.matches(c) || c.isEmpty || out.contains(c)) c = s"col_${index + 1}"
      out += c
    }
    out.toSeq
  }
}
