package graft

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance primitive every
  * long-running ingest needs: micro-batch sinks and per-job partition
  * overwrites accumulate files far below the scan-efficient size, and a
  * 100 TB table fragmented into millions of KB-scale files pays its cost
  * in scan TASK COUNT (one per file once files drop under
  * `spark.sql.files.maxPartitionBytes`, since tiny files never coalesce
  * across row groups) and in file-listing latency, not bytes.
  *
  * [[compact]] rewrites a parquet directory into ~`targetBytes` output
  * files, sized from the ACTUAL on-disk footprint (summed file lengths —
  * parquet's compressed size, the quantity the target is denominated in)
  * rather than row counts or guesses. A round-robin `repartition(n)`
  * gives uniform output sizes regardless of input skew; rewriting into a
  * NEW directory keeps the operation crash-safe (the swap is the
  * caller's one atomic rename, never a half-rewritten table).
  */
object Compaction {

  /** On-disk byte size of a path's data files (driver-side metadata
    * listing — no data read).
    */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val raw = new org.apache.hadoop.fs.Path(path)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualify BEFORE taking the depth: listFiles returns fully-qualified
    // absolute leaves, so a RELATIVE caller path would otherwise have a
    // smaller depth than every leaf and the visibility walk would ascend
    // past the table root into its ancestors — a warehouse under a
    // '.'-prefixed ancestor would report 0 bytes
    val root = fs.makeQualified(raw)
    // a file only counts if NO path component BELOW the root is hidden:
    // `spark.read.parquet` ignores `_`/`.`-prefixed files AND everything
    // under `_temporary/` (a crashed write's leftovers) — counting those
    // would inflate the byte total and the derived output file count.
    // The walk is bounded by DEPTH relative to the QUALIFIED root, never
    // by path equality: an equality boundary that never matches would
    // ascend into the root's own ancestors — a table under a '.'-prefixed
    // ancestor (a ~/.cache warehouse) would report zero bytes.
    // Path.depth() counts path components only, ignoring scheme and
    // authority, so qualification differences (viewfs mounts) can't skew
    // it once both sides are absolute.
    val rootDepth = root.depth()
    def visible(leaf: org.apache.hadoop.fs.Path): Boolean = {
      var p = leaf
      while (p != null && p.depth() > rootDepth) {
        val n = p.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        p = p.getParent
      }
      true
    }
    val it = fs.listFiles(root, true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (visible(f.getPath)) total += f.getLen
    }
    total
  }

  /** Rewrite `inPath` (parquet) into `outPath` as ceil(bytes/target)
    * uniformly-sized files; returns the output file count.
    *
    * CAVEAT — the round-robin repartition DESTROYS any clustering the
    * input was staged with: compacting a sorted staging table silently
    * undoes the co-location its writer paid for. Pass `sortKeys` to
    * restore within-file locality (each output file is locally sorted,
    * so min/max row-group stats prune again); for tables whose LAYOUT
    * carries semantics use the layout-aware compactor instead
    * (partitioned ETL targets: [[graft.etl.TargetStore.compact]];
    * bucketed tables cannot be compacted by any plain rewrite at all —
    * see [[Bucketing]]).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, sortKeys: Seq[String] = Nil): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val bytes = dataBytes(spark, inPath)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val base = spark.read.parquet(inPath).repartition(n)
    val arranged =
      if (sortKeys.isEmpty) base
      else base.sortWithinPartitions(
        sortKeys.map(org.apache.spark.sql.functions.col): _*)
    arranged.write.mode("overwrite").parquet(outPath)
    n
  }

  /** Layout-preserving variant for a PARTITIONED tree: rewrite
    * `inPath` into `outPath` keeping the `partCols` directory layout,
    * with each partition's rows in exactly ONE file (the partition-key
    * repartition sends every partition whole to one task). This is the
    * compactor for trees whose LAYOUT carries semantics — a streaming
    * sink's `batch_id=N` epoch dirs (safe once the index watermark
    * covers them: `committed()` then no-ops any redelivery, so the tree
    * is immutable), or any provenance-partitioned table — where the
    * round-robin [[compact]] would flatten the directories and rewrite
    * the partition column's VALUES out of the path. Values, rows, and
    * layout are identical; only the file count changes. Crash-safe the
    * [[compact]] way: `outPath` is a NEW directory, the swap is the
    * caller's one atomic rename. Returns the partition count.
    */
  def compactPartitioned(spark: SparkSession, inPath: String,
      outPath: String, partCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    require(partCols.nonEmpty, "partCols must name the partition layout")
    val df = spark.read.parquet(inPath)
    df.repartition(partCols.map(col): _*)
      .write.partitionBy(partCols: _*).mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath).select(partCols.map(col): _*).distinct().count()
  }
}
