package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming incremental near-dup LABEL maintenance — the micro-batch
  * dual of the batch append ([[graft.queries.Dedup.appendLabels64]],
  * q184), completing the label artifact's lifecycle: fresh closure
  * (q150), batch growth (q184), physical erasure ([[purgeRoot]] here,
  * `Dedup.rebuildLabelsAfterPurge` batch-side), and arrivals.
  *
  * Root layout (the [[BatchProtocol]] discipline, one level down so the
  * adopted base stays outside the epoch scan):
  *
  *   `<root>/base/`        the ADOPTED pre-stream corpus: one row per
  *                         document `(doc_id, lo, hi, cluster_id)` —
  *                         its 64-bit sketch (null for null text, the
  *                         q42 posture) and its staged label — laid
  *                         out under `d=.../c=...` partition dirs,
  *                         `d = doc_id mod D` and
  *                         `c = cluster_id mod C`, so the per-batch
  *                         label-STATE probes prune by FILE on
  *                         whichever key they hold (the
  *                         [[LabelBandIndex]] discipline applied to
  *                         the LABEL relation — see the probe notes
  *                         below).
  *   `<root>/_width=W`     the band width FROZEN at adoption (derived
  *                         from the base corpus — the frozen-model
  *                         stance: a stream cannot know its final
  *                         corpus size; the q191 drift card is the
  *                         batch-side rebuild signal for the same
  *                         boundary).
  *   `<root>/_db=D`,
  *   `<root>/_cb=C`        the label layout's two partition fan-outs,
  *                         FROZEN at adoption like the width (they are
  *                         the layout — changing them is a re-adoption)
  *                         and derived from the base corpus size
  *                         through [[graft.Bucketing.bucketCountFor]],
  *                         so the pruned fraction a probe reads shrinks
  *                         as the corpus grows (the IVF ~√n stance for
  *                         the label state).
  *   `<root>/stream/`      BatchProtocol epochs `batch_id=N`: the
  *                         batch's sketch+label rows PLUS re-rooted
  *                         override rows `(doc_id, null, null,
  *                         cluster_id)` for previously-labeled
  *                         documents whose cluster merged through an
  *                         arrival — label reads are LAST-WRITE-WINS
  *                         per doc_id over (base, epochs). Same
  *                         `d=.../c=...` layout inside each epoch dir,
  *                         so one partition filter prunes base and
  *                         epochs alike.
  *   `<root>/bands/`       the STAGED band-relation index: epochs
  *                         `batch_id=N/b=B/g=G/` of
  *                         `(doc_id, lo, hi, bk)` rows — the base's
  *                         bands at adoption (`batch_id=-1`), one
  *                         appended epoch per arrival batch, the
  *                         [[DocStream]] near-dedup layout verbatim
  *                         (`g = bk mod BkBuckets` so the probe prunes
  *                         by FILE). This is what keeps a micro-batch
  *                         from re-reading and re-banding the full
  *                         prior corpus: the probe reads ONLY the
  *                         partitions matching the arrival's own band
  *                         keys (LabelStreamSpec pins the numFiles
  *                         metric), and the caps recomputed over that
  *                         pruned union are EXACT for every bucket a
  *                         delta row touches (see
  *                         `Dedup.appendComponents`).
  *
  * Per batch: band the arrivals under the frozen width, probe the band
  * index's matching `(b, g)` partitions, generate only arrival-involving
  * pairs, contract prior labels to super-nodes (a broadcast-probed
  * last-write-wins fold over the COLLISION-BOUNDED endpoint ids — never
  * a corpus-wide groupBy), run the shared closure on the collision-sized
  * contracted graph, and emit ONLY the batch's labels plus the CHANGED
  * prior labels — epoch size tracks the arrival's true collisions, never
  * the corpus. The label-STATE reads are pruned like the band reads:
  * every probe's id set is batch- or collision-BOUNDED, so its derived
  * partition-key set is too (≤ D or ≤ C values, one bounded driver read
  * each — the [[LabelBandIndex.groupsOf]] shape), and the scan reads
  * only the matching `d=` / `c=` files of base + epochs (LabelStreamSpec
  * pins the numFiles metric). Three probes, three prune keys: the
  * already-arrived check and the last-write-wins endpoint fold carry
  * doc_ids (a document's rows all share its `d`), and the
  * moved-candidate probe carries the CHANGED cluster ids (a row matches
  * only if its own cluster_id is among them, and that id is its `c`).
  * No corpus shuffle and no corpus scan anywhere in the batch path.
  * Exactly-once is [[BatchProtocol]] verbatim: the fold is deterministic
  * in (prior committed state, batch), so the two epoch writes (labels,
  * bands) + marker are the whole crash surface; a redelivered committed
  * batch is a no-op.
  *
  * Epoch growth is bounded by [[consolidate]] — crash-safe automated
  * re-adoption: the committed last-write-wins fold becomes a fresh base
  * (one swap, recovery preamble), the band epochs compact through
  * [[BatchProtocol.compactIndex]], and the stream epochs retire behind a
  * marker watermark, all invisible to [[servableLabels]]
  * (LabelStreamSpec pins byte-equality across the fold). A plain
  * [[BatchProtocol.compactIndex]] of the LABEL epochs would instead
  * destroy the last-write-wins ordering the override rows depend on —
  * which is why consolidation folds into the base rather than merging
  * epochs. `runLabelMaintenance(consolidateEvery = …)` runs it on
  * cadence inside `foreachBatch`, where quiescence holds by
  * construction.
  *
  * Takedowns: the root carries its own [[Tombstones]] ledger —
  * [[servableLabels]] masks the tombstoned ids immediately (membership
  * leaves the serve the moment the request lands, and an id REDELIVERED
  * after its takedown stays masked — takedown outranks late arrival,
  * the streaming protocol's standing rule), and [[purgeRoot]] is the
  * physical-erasure half: re-cluster the reduced committed state from
  * its STORED sketches (texts never re-read) and swap the result in as
  * a fresh base, leaving zero purged rows in any file under the root.
  *
  * Exactness contract (the q184 boundary, streamed): the served labels
  * equal a fresh clustering of base ∪ arrivals whenever no band
  * parameter crosses its boundary ACROSS THE WHOLE ARRIVAL HISTORY —
  * each batch's caps see only the sketches present so far, so a bucket
  * that crosses the cap in a LATER batch leaves earlier admissions in
  * place (merges never retract). LabelStreamSpec pins the identity on
  * the real corpus and a planted cross-batch bridge.
  */
object LabelStream {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  private def streamRoot(root: String) = s"$root/stream"

  private def bandsRoot(root: String) = s"$root/bands"

  /** The base corpus's reserved band epoch — the [[DocStream
    * .rebandIndex]] convention (stream batch ids are ≥ 0).
    */
  private val BaseBandEpoch = -1L

  private val WidthPrefix = "_width="

  /** The label layout's partition fan-out markers — frozen at adoption
    * exactly like the width: the partition VALUES are the layout, so a
    * different fan-out is a re-adoption, never a knob.
    */
  private val DbPrefix = "_db="
  private val CbPrefix = "_cb="

  /** Stage one label-row directory (`base/`, a stream epoch, or a swap
    * tmp) under the `d=.../c=...` layout: `d = doc_id mod D` prunes the
    * doc-keyed probes, `c = cluster_id mod C` the cluster-keyed one.
    * One shuffle keyed on the layout columns → one file per present
    * (d, c) group (≤ min(rows, D·C) files — the [[LabelBandIndex
    * .write]] compaction discipline), so a tiny epoch writes a few
    * files and the base's file count is the fan-out, not the task
    * count.
    */
  private def writeLabelRows(path: String, rows: DataFrame, db: Int,
      cb: Int): Unit =
    rows.select(col("doc_id"), col("lo"), col("hi"), col("cluster_id"))
      .withColumn("d", pmod(col("doc_id"), lit(db)).cast("int"))
      .withColumn("c", pmod(col("cluster_id"), lit(cb)).cast("int"))
      .repartition(col("d"), col("c"))
      .write.partitionBy("d", "c").mode("overwrite").parquet(path)

  /** Adopt the pre-stream corpus: its sketches + staged labels become
    * the base the arrivals append to, its band relation stages as the
    * index's base epoch, and the band width + label-layout fan-outs
    * freeze at their base-derived values. Idempotent (overwrite +
    * marker re-write) — re-adoption replaces base, bands, and markers
    * wholesale.
    */
  def initRoot(spark: SparkSession, root: String, baseDocs: DataFrame,
      baseLabels: DataFrame, width: Int): Unit = {
    val sk = graft.queries.Similarity.sketch64(baseDocs).persist()
    // the fan-outs scale with the adopted corpus (bucketCountFor's
    // rows-per-bucket target), so a probe's pruned fraction keeps
    // shrinking as deployments grow — at test scale they bottom out at
    // the minimum and the numFiles pin still proves strict pruning
    val db = graft.Bucketing.bucketCountFor(sk.count())
    val cb = db
    writeLabelRows(s"$root/base", sk.join(baseLabels, Seq("doc_id")), db, cb)
    val f = fs(spark, root)
    f.delete(new Path(bandsRoot(root)), true)
    writeBandEpoch(spark, root, BaseBandEpoch, sk, width)
    sk.unpersist()
    Seq(WidthPrefix -> width, DbPrefix -> db, CbPrefix -> cb).foreach {
      case (prefix, v) =>
        f.listStatus(new Path(root)).iterator
          .map(_.getPath).filter(_.getName.startsWith(prefix))
          .foreach(p => f.delete(p, false))
        f.create(new Path(s"$root/$prefix$v"), true).close()
    }
  }

  private def intMarker(spark: SparkSession, root: String,
      prefix: String): Int = {
    val f = fs(spark, root)
    f.listStatus(new Path(root)).iterator
      .map(_.getPath.getName).filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix).toInt)
      .foldLeft(None: Option[Int])((a, b) => Some(a.fold(b)(math.max(_, b))))
      .getOrElse(sys.error(s"label root $root has no frozen $prefix " +
        "marker — initRoot must adopt a base before the stream starts"))
  }

  private def widthOf(spark: SparkSession, root: String): Int =
    intMarker(spark, root, WidthPrefix)

  /** One band epoch of the staged index: the sketches' band rows under
    * the frozen width, `(b, g)`-partitioned so the per-batch probe
    * prunes by file (ONE shuffle keyed on the layout columns → one file
    * per present group, the compaction discipline). Null sketches band
    * nowhere — their documents still label, through the epoch's label
    * rows.
    */
  private def writeBandEpoch(spark: SparkSession, root: String, id: Long,
      sketches: DataFrame, w: Int): Unit =
    LabelBandIndex.write(spark, s"${bandsRoot(root)}/batch_id=$id",
      sketches, w)

  /** The band index as batch `batchId` must see it: every epoch except
    * its own (a crashed earlier attempt may have written its bands
    * without the marker), restricted to COMMITTED ids (the stream
    * root's markers — the bands of an uncommitted foreign epoch must
    * not pair against labels the fold cannot see) and to the epochs a
    * present consolidated epoch does not supersede (the
    * [[BatchProtocol.readServable]] keep rule — this probe AGGREGATES
    * the rows into the frequency caps, so the compaction crash window's
    * duplicates must fold out: the belt is the epoch mask, the
    * suspenders the (doc_id, b) dedup, pruned-size work either way).
    * Both the epoch mask and the `(b, g)` key filter hit only partition
    * columns, so the scan reads only matching files (LabelStreamSpec
    * pins numFiles).
    */
  private[streaming] def prunedBands(spark: SparkSession, root: String,
      batchId: Long, groups: Seq[(Int, Int)]): DataFrame = {
    val broot = bandsRoot(root)
    val epochs = BatchProtocol.epochIds(spark, broot)
    if (epochs.isEmpty || groups.isEmpty) return LabelBandIndex.empty(spark)
    val consolidated = epochs.filter(_ <= -2)
    val keepCons = if (consolidated.isEmpty) None else Some(consolidated.min)
    val covered = keepCons.map(k => -k - 2).getOrElse(-2L)
    val live = epochs.filter(id => id != batchId &&
      (keepCons.contains(id) ||
        (id > covered &&
          (id < 0 || BatchProtocol.committed(spark, streamRoot(root), id)))))
    if (live.isEmpty) return LabelBandIndex.empty(spark)
    try spark.read.parquet(broot)
      .filter(col("batch_id").cast("long").isin(live: _*))
      .filter(LabelBandIndex.groupFilter(groups))
      .select("doc_id", "lo", "hi", "b", "bk")
      .dropDuplicates("doc_id", "b")
    catch { case e: org.apache.spark.sql.AnalysisException
        if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
      LabelBandIndex.empty(spark) // every epoch empty (all-null-sketch
                                  // corpus): no files, no schema — and
                                  // nothing to band against; any OTHER
                                  // analysis error surfaces (r21)
    }
  }

  /** The PRIOR state a batch folds against: base + COMMITTED epochs
    * only, the current batch's own id excluded — a crash between the
    * epoch write and its marker leaves the epoch's files visible, and
    * a replay that read its own partial output would fold doc labels
    * twice and OVERWRITE the epoch with a smaller one (losing the
    * crashed write's override rows). Restricting the fold input to the
    * committed prior makes the replay recompute from exactly the
    * original input — deterministic, so the rewritten epoch is
    * byte-equal and the marker lands (LabelStreamSpec pins the
    * crash-replay convergence).
    */
  private def priorRows(spark: SparkSession, root: String,
      batchId: Long): DataFrame =
    priorRowsWhere(spark, root, batchId, lit(true))

  /** [[priorRows]] with a LAYOUT-column predicate pushed to both the
    * base and the epoch scans: `pf` references only the partition
    * columns (`d` and/or `c`), so each scan reads only the matching
    * files — the probe-side half of the [[writeLabelRows]] layout. The
    * epoch union tolerates an all-empty stream root (a redelivery
    * no-op's epoch holds no rows, hence no files and no schema — the
    * [[prunedBands]] posture).
    */
  private def priorRowsWhere(spark: SparkSession, root: String,
      batchId: Long, pf: org.apache.spark.sql.Column): DataFrame = {
    val sroot = streamRoot(root)
    val base = spark.read.parquet(s"$root/base").filter(pf)
      .select(col("doc_id"), col("lo"), col("hi"), col("cluster_id"))
      .withColumn("batch_id", lit(-1L))
    try BatchProtocol.readServable(spark, sroot).fold(base) { e =>
      val live = BatchProtocol.epochIds(spark, sroot)
        .filter(id => id != batchId &&
          (id < 0 || BatchProtocol.committed(spark, sroot, id)))
      base.unionByName(e.filter(pf).select(
          col("doc_id"), col("lo"), col("hi"), col("cluster_id"),
          col("batch_id").cast("long"))
        .filter(col("batch_id").isin(live: _*)))
    } catch {
      // NARROW (r21, the advisor's masking-risk fix): only the
      // every-epoch-row-free condition — no data files anywhere under
      // the stream root, so the parquet source cannot infer a schema —
      // reads as "base is the whole committed state". A genuinely
      // malformed epoch (schema drift, partial column set, corrupt
      // footer) raises a DIFFERENT condition and now fails loudly
      // instead of silently dropping committed labels from serves.
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        base
    }
  }

  /** The (bounded) distinct partition keys a probe id relation occupies
    * — the driver-side prune-key read, ≤ the fan-out at ANY probe size
    * (the [[LabelBandIndex.groupsOf]] shape).
    */
  private def keysOf(ids: DataFrame, idCol: String, fanout: Int): Seq[Int] =
    ids.select(pmod(col(idCol), lit(fanout)).cast("int").as("k"))
      .distinct().collect().map(_.getInt(0)).toSeq

  private def keyFilter(c: org.apache.spark.sql.Column,
      keys: Seq[Int]): org.apache.spark.sql.Column =
    if (keys.isEmpty) lit(false) else c.isin(keys.map(Int.box): _*)

  /** The prior label rows that can possibly belong to `ids` (doc_id
    * probe) — pruned to the ids' `d=` partitions of base + committed
    * epochs before the broadcast semi-join. A document's rows all share
    * its `d`, so the pruned read holds EVERY row of every probed id —
    * the last-write-wins fold over it is exact.
    */
  private[streaming] def priorByDoc(spark: SparkSession, root: String,
      batchId: Long, ids: DataFrame): DataFrame = {
    val keys = keysOf(ids, "doc_id", intMarker(spark, root, DbPrefix))
    priorRowsWhere(spark, root, batchId, keyFilter(col("d"), keys))
      .join(broadcast(ids.select(col("doc_id"))), Seq("doc_id"), "left_semi")
  }

  /** The prior label rows whose cluster_id is among `cids` (cluster
    * probe) — pruned to the ids' `c=` partitions: a row matches the
    * semi-join only if its OWN cluster_id is probed, and that id is
    * exactly its `c`, so the pruned read holds every matching row.
    */
  private[streaming] def priorByCluster(spark: SparkSession, root: String,
      batchId: Long, cids: DataFrame): DataFrame = {
    val keys = keysOf(cids, "cluster_id", intMarker(spark, root, CbPrefix))
    priorRowsWhere(spark, root, batchId, keyFilter(col("c"), keys))
      .join(broadcast(cids.select(col("cluster_id"))), Seq("cluster_id"),
        "left_semi")
  }

  /** One micro-batch of arriving `(doc_id, text)` documents: the
    * incremental append against everything committed so far, emitting
    * the batch's labels plus the changed prior labels as epoch
    * `batch_id=N` and the batch's band rows as the band index's next
    * epoch. Crash-safe and redelivery-idempotent per [[BatchProtocol]]
    * (ONE marker pair covers both writes, written last).
    */
  def processLabelBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, root: String): Unit = {
    val sroot = streamRoot(root)
    if (BatchProtocol.committed(spark, sroot, batchId))
      return // replayed, fully committed
    recoverBase(spark, root)
    val w = widthOf(spark, root)
    val (stable, stableIds) = graft.CheckpointBlocks.pinnedCheckpoint(batch)
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    try {
      val batchAll = graft.queries.Similarity.sketch64(stable)
      // an at-least-once source can redeliver a document in a LATER
      // batch id (the committed-batch guard only catches same-id
      // replays); an already-labeled doc_id folding through the append
      // again would emit a second, conflicting label row, so
      // re-arrivals DROP here — label maintenance is append-only per
      // id, first write wins (LabelStreamSpec pins the cross-batch
      // redelivery no-op). A d-pruned broadcast probe instead of a
      // corpus-wide anti-join shuffle: the prior rows that can match
      // the batch come out of the batch's own d= partitions
      // ([[priorByDoc]]), then mask the batch by broadcast anti-join.
      val dupIds = priorByDoc(spark, root, batchId,
          batchAll.select(col("doc_id")))
        .select("doc_id").distinct()
      val batchSk = batchAll
        .join(broadcast(dupIds), Seq("doc_id"), "left_anti")
        .persist() // feeds the bands, the epoch writes, and the joins below
      val newBands = graft.queries.Similarity.bandsFromSketches(
        batchSk.filter(col("lo").isNotNull), w)
      // the batch's own (b, g) groups — bounded by bands × BkBuckets at
      // ANY batch size (the DocStream prune-key discipline)
      val groups = LabelBandIndex.groupsOf(newBands)
      val priorBands = prunedBands(spark, root, batchId, groups)
      // last-write-wins labels for an EXPLICIT id set — d-pruned and
      // broadcast-probed ([[priorByDoc]] holds every row of every
      // probed id, so the fold is exact), grouped only over the
      // probe's hits
      def lwwOf(ids: DataFrame): DataFrame =
        priorByDoc(spark, root, batchId, ids)
          .groupBy("doc_id")
          .agg(expr("max_by(cluster_id, batch_id)").as("cluster_id"))
      val (newFinal, remap) = graft.queries.Dedup.appendComponents(spark,
        lwwOf, priorBands, newBands, batchSk.select(col("doc_id")))
      // epoch rows: the batch's own sketch+label rows, plus overrides
      // for prior documents whose label MOVED (sketch columns null —
      // their sketch lives in its original epoch). Moved docs resolve
      // through the remap's CHANGED rows: any doc with a historical row
      // in an affected cluster is a candidate (c-pruned broadcast
      // semi-join — [[priorByCluster]]), its true current label is the
      // lww over ALL its rows, and it moves iff that label re-roots.
      val changed = remap.filter(col("root") =!= col("cluster_id"))
      val candIds = priorByCluster(spark, root, batchId,
          changed.select(col("cluster_id")))
        .select("doc_id").distinct()
      val moved = lwwOf(candIds)
        .join(changed, Seq("cluster_id"))
        .select(col("doc_id"), lit(null).cast("long").as("lo"),
          lit(null).cast("long").as("hi"), col("root").as("cluster_id"))
      val batchRows = batchSk.join(newFinal, Seq("doc_id"))
        .select("doc_id", "lo", "hi", "cluster_id")
      writeLabelRows(s"$sroot/batch_id=$batchId",
        batchRows.unionByName(moved),
        intMarker(spark, root, DbPrefix), intMarker(spark, root, CbPrefix))
      writeBandEpoch(spark, root, batchId, batchSk, w)
      // bands marker BEFORE the stream marker: stream-committed must
      // imply bands-committed (the probe filters on stream markers;
      // the bands root's own markers gate its compaction)
      BatchProtocol.commit(spark, bandsRoot(root), batchId)
      BatchProtocol.commit(spark, sroot, batchId)
    } finally {
      // the append's closure scaffolding (pair persists, checkpoint
      // rounds, batchSk) is dead once the epoch is on disk; the PINNED
      // batch blocks predate the snapshot and stay
      (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
        .foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
          .foreach(_.unpersist(false)))
      graft.CheckpointBlocks.free(spark, stableIds)
    }
  }

  /** The served label set — last-write-wins per document over (base,
    * COMMITTED epochs), minus the root's tombstoned ids:
    * `(doc_id, cluster_id)` for every document ever adopted or arrived
    * and not taken down. The committed filter is the same one the fold
    * input uses: a crash-leftover epoch without its marker is NOT
    * delivered state and must not serve (its replay will re-commit the
    * identical rows). The tombstone mask is membership-only until
    * [[purgeRoot]] re-clusters — the impactRead stance: a masked doc
    * that BRIDGED two clusters keeps them merged until the purge, which
    * is the erasure event.
    */
  def servableLabels(spark: SparkSession, root: String): DataFrame = {
    recoverBase(spark, root)
    Tombstones.masked(spark, root,
      priorRows(spark, root, Long.MinValue)
        .groupBy("doc_id")
        .agg(expr("max_by(cluster_id, batch_id)").as("cluster_id")),
      "doc_id")
  }

  /** Swap a freshly-computed base in under the live one — tmp write,
    * side-step rename, rename in, delete old. The window between the
    * two renames leaves no `base` dir; [[recoverBase]]'s preamble (run
    * by every entry point) renames the complete original back in, and
    * the idempotent caller re-runs — the [[BatchProtocol.purgeIndex]]
    * recovery contract.
    */
  private def swapBase(spark: SparkSession, root: String,
      newBase: DataFrame): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(s"$root/_base_tmp")
    val basep = new Path(s"$root/base")
    val old = new Path(s"$root/_base_old")
    writeLabelRows(tmp.toString, newBase,
      intMarker(spark, root, DbPrefix), intMarker(spark, root, CbPrefix))
    if (f.exists(old)) f.delete(old, true) // completed prior swap's leftover
    require(f.rename(basep, old), s"base swap rename $basep -> $old failed")
    require(f.rename(tmp, basep), s"base swap rename $tmp -> $basep failed")
    f.delete(old, true)
  }

  /** Crash-recovery preamble for [[swapBase]]: an `_base_old` beside a
    * missing `base` is a crash between the two renames — the complete
    * original copy steps back in; one beside a live `base` is a
    * post-swap leftover and is deleted.
    */
  private def recoverBase(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val basep = new Path(s"$root/base")
    val old = new Path(s"$root/_base_old")
    if (f.exists(old)) {
      if (!f.exists(basep))
        require(f.rename(old, basep),
          s"base swap recovery rename $old -> $basep failed")
      else f.delete(old, true)
    }
  }

  /** Crash-safe automated RE-ADOPTION — the consolidation that bounds
    * epoch growth by cadence instead of operator attention: fold the
    * committed last-write-wins state (labels + each doc's one stored
    * sketch) into a fresh base, compact the band epochs through
    * [[BatchProtocol.compactIndex]], and retire the stream epochs
    * behind a marker watermark. Every prefix of the step sequence
    * leaves [[servableLabels]] byte-identical (LabelStreamSpec pins
    * it):
    *
    *   1. the fresh base swaps in while the epochs still serve — the
    *      fold is idempotent under last-write-wins (an epoch row
    *      re-applied over the folded base re-selects its own value);
    *   2. band compaction is [[BatchProtocol.compactIndex]]'s own
    *      crash-ordered protocol; the probe masks superseded epochs and
    *      dedups `(doc_id, b)`, so the rename-to-cleanup window is
    *      invisible;
    *   3. the stream watermark ([[BatchProtocol.collapseMarkers]])
    *      lands BEFORE the epoch dirs delete, so a checkpoint-replayed
    *      batch at or below it stays a committed no-op.
    *
    * The frozen width is deliberately NOT re-derived: band keys must
    * stay comparable across the index's whole life ([[DocStream
    * .rebandIndex]] is the migration path when the corpus outgrows it —
    * here, a fresh [[initRoot]] adoption). Precondition: every stream
    * epoch committed (hard, as everywhere) — run quiesced or from
    * inside `foreachBatch` after commit, where it holds by
    * construction. No-op on a root with no stream epochs.
    */
  def consolidate(spark: SparkSession, root: String): Unit = {
    recoverBase(spark, root)
    val sroot = streamRoot(root)
    BatchProtocol.requireQuiesced(spark, sroot)
    val epochs = BatchProtocol.epochIds(spark, sroot).filter(_ >= 0)
    if (epochs.isEmpty) return
    val upTo = epochs.max
    // each doc's sketch lives in exactly ONE row (its base/arrival row;
    // override rows carry nulls), so max() selects it — and max_by on
    // batch_id is the serve's own lww fold
    val folded = priorRows(spark, root, Long.MinValue)
      .groupBy("doc_id")
      .agg(expr("max_by(cluster_id, batch_id)").as("cluster_id"),
        max("lo").as("lo"), max("hi").as("hi"))
      .select("doc_id", "lo", "hi", "cluster_id")
    swapBase(spark, root, folded)
    BatchProtocol.compactIndex(spark, bandsRoot(root), upTo, Seq("b", "g"))
    BatchProtocol.collapseMarkers(spark, sroot, upTo)
    val f = fs(spark, root)
    epochs.foreach(id => f.delete(new Path(s"$sroot/batch_id=$id"), true))
  }

  /** Physical takedown erasure for a label root — the re-cluster the
    * label artifact demands where every other index purges by row
    * filter (`Dedup.rebuildLabelsAfterPurge`'s argument, streamed):
    * min-id labels, sizes, and transitive chains through a deleted
    * bridge document all change, so the reduced committed state
    * RE-CLUSTERS from its stored sketches (texts never re-read) at the
    * frozen width and swaps in as a fresh base; the stream epochs
    * retire (their fold is inside the new base), and the band index
    * rewrites epoch-by-epoch minus the purged rows
    * ([[BatchProtocol.purgeIndex]]). Idempotent and crash-recoverable:
    * labels are recomputed from sketches (never carried through the
    * fold), every step re-runs to the same state, and the caller's
    * masks stay active until its requests retire — mid-crash the serve
    * is already correct through [[servableLabels]]'s tombstone mask.
    * The purge set is the root's OWN [[Tombstones]] ledger — callers
    * file their ids there first (the adopted-root protocol), and the
    * ledger survives the purge: an id redelivered after its takedown
    * must stay masked — takedown outranks late arrival. No-op on a
    * root with no ledger.
    */
  def purgeRoot(spark: SparkSession, root: String): Unit = {
    val ids = Tombstones.ids(spark, root, "doc_id")
      .map(_.filter(col("doc_id").isNotNull)
        .distinct().collect().map(_.getLong(0)).toSeq)
      .getOrElse(Seq.empty)
    if (ids.isEmpty) return
    recoverBase(spark, root)
    val sroot = streamRoot(root)
    BatchProtocol.requireQuiesced(spark, sroot)
    val w = widthOf(spark, root)
    val epochs = BatchProtocol.epochIds(spark, sroot).filter(_ >= 0)
    val ss = spark
    import ss.implicits._
    val del = ids.distinct.toDF("doc_id")
    val reduced = priorRows(spark, root, Long.MinValue)
      .groupBy("doc_id")
      .agg(max("lo").as("lo"), max("hi").as("hi"))
      .join(broadcast(del), Seq("doc_id"), "left_anti")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    try {
      val labels = graft.queries.Dedup.labelsFromSketches(spark, reduced, w)
      swapBase(spark, root,
        reduced.join(labels, Seq("doc_id"))
          .select("doc_id", "lo", "hi", "cluster_id"))
    } finally
      (spark.sparkContext.getPersistentRDDs.keySet.toSet -- before)
        .foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
          .foreach(_.unpersist(false)))
    if (epochs.nonEmpty) {
      BatchProtocol.collapseMarkers(spark, sroot, epochs.max)
      val f = fs(spark, root)
      epochs.foreach(id => f.delete(new Path(s"$sroot/batch_id=$id"), true))
    }
    BatchProtocol.purgeIndex(spark, bandsRoot(root), rel => {
      val d = ids.distinct.toDF("doc_id")
      rel.join(broadcast(d), Seq("doc_id"), "left_anti")
    })
  }

  /** One-row ops card for a label root — the [[LexStream.indexCard]]
    * posture for the label artifact: the frozen layout markers (band
    * width, d/c fan-outs), base size, live stream epochs with their
    * row split (sketch-carrying arrival rows vs sketch-less rows —
    * moved-label overrides, plus null-text arrivals, sketch-less by
    * definition; the collision-sized-epoch contract read as numbers),
    * band-index epochs, and the takedown posture. Costs one narrow scan of base
    * + epochs plus the bounded tombstone read; serves nothing itself,
    * so it is spec-verified against hand-built roots rather than a
    * DuckDB oracle (the roots exist only at runtime).
    */
  def rootCard(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    recoverBase(spark, root)
    val sroot = streamRoot(root)
    val width = intMarker(spark, root, WidthPrefix).toLong
    val db = intMarker(spark, root, DbPrefix).toLong
    val cb = intMarker(spark, root, CbPrefix).toLong
    val baseRows = spark.read.parquet(s"$root/base").count()
    val epochs = BatchProtocol.epochIds(spark, sroot).filter(_ >= 0)
    val (sketchRows, overrideRows) =
      try BatchProtocol.readServable(spark, sroot) match {
        case None => (0L, 0L)
        case Some(e) =>
          val r = e.agg(
            sum(when(col("lo").isNotNull, 1L).otherwise(0L)),
            sum(when(col("lo").isNull, 1L).otherwise(0L))).head
          (Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
            Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
      } catch { case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
        (0L, 0L) // every epoch row-free: no files, no schema; any
                 // other analysis error surfaces (r21)
      }
    val bandEpochs = BatchProtocol.epochIds(spark, bandsRoot(root))
    val nTomb = Tombstones.ids(spark, root, "doc_id")
      .map(_.filter(col("doc_id").isNotNull).distinct().count())
      .getOrElse(0L)
    Seq((width, db, cb, baseRows, epochs.size.toLong, sketchRows,
      overrideRows, bandEpochs.count(_ >= 0).toLong,
      // the base epoch is the reserved -1, NOT a consolidation —
      // consolidated ids are ≤ -2 (the BatchProtocol convention)
      bandEpochs.exists(_ <= -2), nTomb))
      .toDF("width", "d_buckets", "c_buckets", "base_rows",
        "n_stream_epochs", "epoch_sketch_rows", "epoch_override_rows",
        "n_band_epochs", "bands_consolidated", "n_tomb_ids")
  }

  /** Streaming entry: maintain the label root from an unbounded
    * `(doc_id, text)` stream — foreachBatch over
    * [[processLabelBatch]] (the [[EmbedStream.runAdcIngest]] shape).
    * The root must have been adopted ([[initRoot]]) first.
    * `consolidateEvery > 0` re-adopts ([[consolidate]]) after every
    * N-th batch commits — inside `foreachBatch` every epoch is
    * committed by construction, so the quiesced precondition holds
    * without stopping the stream; the root then never carries more
    * than ~N stream epochs (the [[DocStream.runNearDedup]]
    * compactEvery discipline).
    */
  def runLabelMaintenance(docs: DataFrame, root: String,
      checkpoint: String, consolidateEvery: Int = 0)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        processLabelBatch(b.sparkSession, b, id, root)
        if (consolidateEvery > 0 && (id + 1) % consolidateEvery == 0)
          consolidate(b.sparkSession, root)
      }
      .start()
}
