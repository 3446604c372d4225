package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline scalar functions for large-scale training-data prep, all
  * composed from codegen'd built-ins (no UDFs — every expression here stays
  * inside whole-stage codegen and is oracle-mirrorable in ANSI SQL).
  *
  * Determinism contract: everything integer-derived or per-row IEEE double —
  * no aggregation-order dependence, so results hash-match DuckDB exactly.
  */
object TextFunctions {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-grams joined by single spaces; empty array when < n tokens.
    * (Guarded: Spark's `sequence(1, 0)` would generate a DESCENDING range.)
    */
  def wordNgrams(toks: Column, n: Int): Column = {
    val gram = (i: Column) =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - lit(n - 1)), gram))
  }

  /** Character k-shingles of the lowercased trimmed text. */
  def charShingles(text: Column, k: Int): Column = {
    val t = lower(trim(text))
    when(length(t) < k, array(t))
      .otherwise(transform(sequence(lit(1), length(t) - lit(k - 1)),
        i => t.substr(i, lit(k))))
  }

  /** Engine-portable 32-bit string hash: the first 8 hex chars of SHA-256,
    * read as an unsigned int in a long. Chosen over murmur/xxhash because
    * every SQL engine computes the identical value (DuckDB:
    * `CAST('0x'||substr(sha256(s),1,8) AS BIGINT)`), which keys the oracle
    * parity of every sketch built on it. Seeded variants append `#<seed>`.
    */
  def portableHash(s: Column, seed: Int = 0): Column = hashPrefix(s, seed, 8)

  /** The ONE definition behind both hash widths: seed-keyed sha-256,
    * first `hexChars` hex digits as a non-negative long. The keying
    * convention (`#<seed>` suffix) lives only here and in the oracle
    * mirrors' `||'#N'`.
    */
  private def hashPrefix(s: Column, seed: Int, hexChars: Int): Column = {
    val keyed = if (seed == 0) s else concat(s, lit(s"#$seed"))
    conv(substring(sha2(keyed, 256), 1, hexChars), 16, 10).cast("long")
  }

  /** 60-bit [[portableHash]] (first 15 hex chars of SHA-256, < 2^60):
    * for `hash % n_stratum < target` admission rates that must stay
    * rate-exact when a stratum can exceed 2^32 rows — there the 32-bit
    * hash saturates (`hash % n == hash`) and the admitted fraction
    * silently becomes `target/2^32` instead of `target/n`. 60 bits
    * covers any real stratum while the DuckDB mirror stays a plain
    * hex-prefix cast (15 hex digits parse into a BIGINT without
    * overflow).
    */
  def portableHash60(s: Column, seed: Int = 0): Column = hashPrefix(s, seed, 15)

  /** Driver-side [[portableHash]] of a literal string — the identical
    * value (first 4 bytes of SHA-256, read unsigned), for baking derived
    * constants into plans without a foldable sha-expression forest.
    */
  def portableHashLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Count of tokens matching a stopword set (language-ID / quality input). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*))).cast("long")

  /** Language-ID by stopword-hit argmax with a fixed tie-break priority
    * (en > es > de > fr) — an n-gram-heuristic classifier shape, all ints.
    */
  val stopwordsByLang: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "les", "et", "des", "une", "dans"))

  def langScores(toks: Column): Seq[(String, Column)] =
    stopwordsByLang.map { case (lang, words) => lang -> stopwordHits(toks, words) }

  /** BPE-ish token count: alnum runs plus isolated non-alnum-non-space
    * symbols — the standard cheap proxy for subword token counts.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
}
