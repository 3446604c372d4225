package graft.etl

/** Table-name qualification (R26; reference:
  * `src/DatabaseAgent.php:53-61` — the `schema` / `tablePrefix` knobs — and
  * `src/DatabaseAgentMysql.php:308-315` `quotedFullyQualifiedTableName`).
  *
  * The reference qualifies EVERY table it touches (accounting and target
  * alike): prepend `tablePrefix` to the bare name, then, when a schema is
  * set, prefix `schema.` and backtick-quote the table part. In a
  * filesystem/parquet warehouse the schema becomes a subdirectory and
  * quoting becomes identifier validation — the path-injection analog of the
  * SQL-injection the reference's backticks prevent (a name with `/` or `..`
  * would escape the warehouse root exactly like an unquoted identifier
  * escapes its statement).
  *
  * Two configs pointed at one warehouse root with different prefixes (or
  * schemas) therefore never collide — the property the reference's knobs
  * exist for.
  */
final case class TableNaming(
    schema: Option[String] = None,
    tablePrefix: Option[String] = None) {

  /** Qualified table name: `prefix + name`, schema-qualified with `.` when
    * a schema is set (matches the reference's rendered SQL name modulo
    * quoting).
    */
  def qualifiedName(unqualifiedName: String): String = {
    val n = validated(tablePrefix.getOrElse("") + unqualifiedName)
    schema match {
      case Some(s) => s"${validated(s)}.$n"
      case None    => n
    }
  }

  /** Relative storage path under the warehouse root: `schema/` becomes a
    * directory level.
    */
  def qualifiedPath(unqualifiedName: String): String = {
    val n = validated(tablePrefix.getOrElse("") + unqualifiedName)
    schema match {
      case Some(s) => s"${validated(s)}/$n"
      case None    => n
    }
  }

  /** The "quoting" step: reject identifiers that cannot be made safe as a
    * single path segment. (MySQL backticks make almost anything safe inside
    * one statement; a filesystem store must instead refuse separators and
    * traversal.)
    */
  private def validated(name: String): String = {
    require(name.nonEmpty, "Table identifier must be non-empty")
    require(!name.contains('/') && !name.contains('\\') &&
      name != "." && name != "..",
      s"Invalid table identifier (would escape the warehouse root): $name")
    // `.tmp`/`.old` are SnapshotMetaStorage's staging suffixes — a table so
    // named would collide with another table's in-flight replace().
    require(!name.endsWith(".tmp") && !name.endsWith(".old"),
      s"Invalid table identifier (reserved staging suffix): $name")
    name
  }
}

object TableNaming {
  val none: TableNaming = TableNaming(None, None)
}
