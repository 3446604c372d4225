package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-engine type discipline for the oracle SQL (the q49/q72
  * convention): DuckDB widens integer `SUM` — plain or windowed — to
  * HUGEINT, which reaches the driver's type-sensitive hash as a different
  * column type than Spark's BIGINT even when every value matches
  * (round 10: q72's `chunk_id` was the one un-CAST sum-derived output and
  * failed `hash_match` with bit-identical values). The rule this spec
  * encodes: every oracle OUTPUT column whose value derives from a `SUM(`
  * — directly, or through a CTE alias — must be explicitly `CAST`.
  *
  * This is the cheap grep-style guard; `scripts/oracle_check.py` performs
  * the precise check (DuckDB result types vs the Spark parquet dump's) at
  * the dev gate.
  */
class OracleConventionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Every `SELECT <list> FROM` list in the statement, quote-aware. */
  private def selectLists(sql: String): Seq[String] = {
    val up = sql.toUpperCase
    val out = Seq.newBuilder[String]
    var i = 0
    var m = up.indexOf("SELECT", i)
    while (m >= 0) {
      val start = m + "SELECT".length
      var depth = 0
      var inStr = false
      var j = start
      var stop = false
      while (j < sql.length && !stop) {
        val ch = sql(j)
        if (inStr) { if (ch == '\'') inStr = false }
        else if (ch == '\'') inStr = true
        else if (ch == '(') depth += 1
        else if (ch == ')') { if (depth == 0) stop = true else depth -= 1 }
        else if (depth == 0 && up.regionMatches(j, "FROM", 0, 4) &&
          (j + 4 >= sql.length || !up(j + 4).isLetterOrDigit) &&
          !up(j - 1).isLetterOrDigit) stop = true
        if (!stop) j += 1
      }
      out += sql.substring(start, j)
      i = start
      m = up.indexOf("SELECT", i)
    }
    out.result()
  }

  /** Split a SELECT list on top-level commas (paren- and quote-aware). */
  private def topLevelItems(list: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    list.foreach { ch =>
      if (inStr) { if (ch == '\'') inStr = false; cur += ch }
      else if (ch == '\'') { inStr = true; cur += ch }
      else if (ch == '(') { depth += 1; cur += ch }
      else if (ch == ')') { depth -= 1; cur += ch }
      else if (ch == ',' && depth == 0) { out += cur.result(); cur.clear() }
      else cur += ch
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val AliasRe = """(?is)^(.*?)\s+AS\s+(\w+)\s*$""".r
  private val SumRe = """(?is).*\bSUM\s*\(.*""".r
  private val CastWholeRe = """(?is)^\s*CAST\s*\(.*""".r
  private val CastOfSumRe = """(?is).*CAST\s*\(\s*SUM\s*\(.*""".r

  test("every SUM-derived oracle output column is explicitly CAST") {
    val violations = Seq.newBuilder[String]
    for ((name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val items: Seq[(String, String)] = // (body, alias)
        selectLists(sql).flatMap(topLevelItems).collect {
          case AliasRe(body, alias) => (body.trim, alias)
        }
      // an alias is "tainted" when its value carries an un-CAST SUM —
      // directly, or by referencing a tainted alias; CAST applied to the
      // whole item or directly to the SUM clears it
      var tainted = Set.empty[String]
      var grown = true
      while (grown) {
        val next = items.collect {
          case (body, alias)
            if !CastWholeRe.matches(body) && !CastOfSumRe.matches(body) &&
              (SumRe.matches(body) ||
                tainted.exists(t => s"(?is).*\\b$t\\b.*".r.matches(body))) =>
            alias
        }.toSet
        grown = (next -- tainted).nonEmpty
        tainted ++= next
      }
      if (tainted.nonEmpty) {
        // output columns come from the Spark side of the SAME query — the
        // driver hashes these names against the oracle's result columns
        val outputs = SparkEntry.queries(name)(spark, dir).columns.toSet
        (tainted & outputs).foreach { c =>
          violations += s"$name.$c: sum-derived output without an explicit CAST"
        }
      }
    }
    assert(violations.result().isEmpty, violations.result().mkString("\n"))
  }

  test("every registered query has a DuckDB oracle; no orphan oracles") {
    // the driver downgrades an oracle-less query to a weaker rows-only
    // check, and an orphan oracle silently tests nothing — both are
    // registration drift this guard turns into a red test
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"orphan oracles: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }
}
