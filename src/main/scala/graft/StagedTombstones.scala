package graft

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Takedown tombstones for the BATCH-STAGED serve tables — the
  * [[graft.streaming.Tombstones]] protocol extended to the other half of
  * the deployment: the session-staged lexical/positional indexes
  * (`ensureLexIndex` / `ensurePosIndex`), the staged IVF / IVF-PQ code
  * tables (`ensureIvfPqIndex`, q68's cell table), and the [[SqlCatalog]]
  * views published over them. Without this, a takedown request masked
  * every STREAMING read path while the batch-staged serves — the paths a
  * session actually queries — kept returning the deleted documents until
  * a full re-stage; at 100 TB a re-stage per request is exactly the
  * year-of-rewrites cost the tombstone design exists to avoid.
  *
  * Shared semantics with the streaming side (one protocol, two
  * substrates):
  *
  *   - serves MASK immediately: candidates AND every derived statistic
  *     (df, N, L, avgdl) read as if the documents never arrived — the
  *     serve after [[deleteDocs]] is byte-identical to a re-stage over
  *     the corpus minus the deletions (StagedTakedownSpec pins it per
  *     serve family, catalog SQL forms included);
  *   - exactly-once by REQUEST IDENTITY: a redelivered `requestId`
  *     replaces itself; distinct ids accumulate as independent
  *     takedowns; deleting a never-staged id is a harmless no-op;
  *   - physical purge rides the existing rebuild cadence: a staged table
  *     is a DERIVED artifact of its corpus directory, so the next
  *     `ensure*` re-stage (new session, or after the corpus itself is
  *     rewritten) is the purge — the batch analogue of the streaming
  *     side's compaction `rowFilter`. [[purge]] is the ON-DEMAND form:
  *     rewrite every staged serve table minus the masked rows now,
  *     retire the satisfied requests to a purged ledger, serve results
  *     unchanged.
  *
  * Scope note: the registry is SESSION-scoped, exactly like the staged
  * tables it masks (`ensure*` keys its build on the session catalog); a
  * long-lived deployment's durable takedown ledger is the streaming
  * [[graft.streaming.Tombstones]] root, whose requests feed both sides.
  * Frozen MODELS (k-means centroids, PQ codebooks, the NB weight table)
  * are not member data and are not retrained by a takedown — the
  * industry-standard erasure posture: membership leaves the index
  * immediately, model refresh rides the normal retrain cadence.
  *
  * Cost shape: [[deleteDocs]] pays one bounded job per request (an
  * id-pushdown `documents` probe of the REQUEST's rows — never the
  * corpus) and caches per-id length + distinct-term rows driver-side, so
  * every serve-side adjustment (N/L deltas, the df delta table) is a
  * driver fold over request-sized state; the candidate mask itself is a
  * broadcast anti-join.
  */
object StagedTombstones {

  /** Per-document facts captured at request time (the corpus may be
    * re-staged later; the tombstone must not depend on re-reading it):
    * token length (0 for null/empty text) and the distinct terms (for
    * the df delta). Ids that name no corpus document carry no entry —
    * they mask nothing and adjust nothing.
    */
  private case class DocInfo(dl: Long, terms: Seq[String])

  /** The merged doc-side tombstone state of one (session, dir): all
    * requested ids (maskable), and the present-doc adjustments.
    */
  private[graft] case class DocTomb(ids: Seq[Long], nDel: Long, lDel: Long,
      dfDelta: Seq[(String, Long)])

  private val docReqs = new java.util.concurrent.ConcurrentHashMap[
    (String, String), scala.collection.mutable.LinkedHashMap[
      String, (Seq[Long], Map[Long, DocInfo])]]

  private val vecReqs = new java.util.concurrent.ConcurrentHashMap[
    (String, String), scala.collection.mutable.LinkedHashMap[String, Seq[Long]]]

  /** Requests [[purge]] has SATISFIED physically: their rows are gone
    * from every staged serve table and their stat adjustments are folded
    * into the rewritten tables and memoized scalars. The ids are
    * retained, not forgotten, because (a) a redelivered requestId must
    * stay satisfied (exactly-once across the purge boundary), (b) any
    * LATER request naming an already-purged id must not re-adjust
    * statistics the tables no longer carry, and (c) plan-backed member
    * surfaces that recompute from the CORPUS (the catalog band view)
    * must keep masking them until the corpus itself is rewritten.
    */
  private val purgedDocReqs = new java.util.concurrent.ConcurrentHashMap[
    (String, String), scala.collection.mutable.LinkedHashMap[String, Seq[Long]]]

  private val purgedVecReqs = new java.util.concurrent.ConcurrentHashMap[
    (String, String), scala.collection.mutable.LinkedHashMap[String, Seq[Long]]]

  /** Stream roots [[adoptStreamRoot]] bridged into this session's
    * registry, per (session, dir) and side — [[purge]] extends physical
    * erasure to their servable epochs, so one purge call erases BOTH
    * deployment halves (the staged tables above, the adopted roots
    * here).
    */
  private val adoptedRoots = new java.util.concurrent.ConcurrentHashMap[
    (String, String), scala.collection.mutable.LinkedHashSet[(String, Boolean)]]

  /** LABEL roots ([[graft.streaming.LabelStream]]) adopted into this
    * session's registry — tracked apart from the index roots because
    * their purge is a RE-CLUSTER, not a row filter
    * ([[graft.streaming.LabelStream.purgeRoot]]): min-id labels, sizes,
    * and chains through a deleted bridge all change, the
    * `rebuildLabelsAfterPurge` argument applied to the streaming half.
    */
  private val adoptedLabelRoots = new java.util.concurrent.ConcurrentHashMap[
    (String, String), scala.collection.mutable.LinkedHashSet[String]]

  private def purgedIdsOf(m: java.util.concurrent.ConcurrentHashMap[
        (String, String), scala.collection.mutable.LinkedHashMap[String, Seq[Long]]],
      k: (String, String)): Set[Long] =
    Option(m.get(k)).map(x => x.synchronized(x.values.flatten.toSet))
      .getOrElse(Set.empty)

  /** Every doc id a COMPLETED purge has already erased from the staged
    * tables of (session, dir) — the union [[graft.queries.TextAnalysis
    * .purgeLex]] re-probes when it recomputes the N corpus scalar
    * (recompute-from-state, never delta subtraction, so purge re-runs
    * converge).
    */
  private[graft] def purgedDocIds(s: SparkSession, dir: String): Set[Long] =
    purgedIdsOf(purgedDocReqs, key(s, dir))

  /** The vector-side twin of [[purgedDocIds]] — the union the appended
    * vector demo's rebuild masks ([[graft.queries.Similarity
    * .ensureAppendedIvf]]).
    */
  private[graft] def purgedVecIds(s: SparkSession, dir: String): Set[Long] =
    purgedIdsOf(purgedVecReqs, key(s, dir))

  private def key(s: SparkSession, dir: String) =
    (s.sparkContext.applicationId, dir)

  private def requireReqId(requestId: String): Unit =
    require(requestId.nonEmpty && requestId.matches("[A-Za-z0-9_-]+"),
      s"requestId must be [A-Za-z0-9_-]+, got '$requestId'")

  /** The bounded per-request probe: id-pushdown scan of the REQUEST's
    * documents (never the corpus), capturing each present doc's length
    * and distinct terms for the stat adjustments.
    */
  private def docInfoOf(s: SparkSession, dir: String,
      ids: Seq[Long]): Map[Long, DocInfo] =
    Tables(s, dir, "documents")
      .filter(col("doc_id").isin(ids.map(Long.box): _*))
      .select(col("doc_id"),
        coalesce(size(tokens(col("text"))), lit(0)).cast("long").as("dl"),
        coalesce(array_distinct(tokens(col("text"))),
          array().cast("array<string>")).as("dt"))
      .collect()
      .map(r => r.getLong(0) ->
        DocInfo(r.getLong(1), r.getSeq[String](2).toSeq))
      .toMap

  /** Expand a takedown request to CLUSTER COMPLETENESS: every member of
    * every near-dup cluster (the staged q150 at-scale labels —
    * [[graft.queries.Dedup.ensureClusterLabels64]]) that contains a
    * requested id — q175's member set as an operator the tombstone APIs
    * route through, so an erasure honors intent when the corpus carries
    * near-verbatim copies of the requested content. Ids the corpus
    * never clustered (absent documents) stay in the returned set — they
    * keep the delete APIs' harmless-mask semantics. Bounded: the
    * request side broadcasts, member fan-out is request × cluster-size,
    * never corpus-tracking.
    */
  def expandToClusters(s: SparkSession, dir: String,
      ids: Seq[Long]): Seq[Long] = {
    import s.implicits._
    val labels = queries.Dedup.ensureClusterLabels64(s, dir)
    val reqClusters = labels
      .join(broadcast(ids.distinct.toDF("doc_id")), Seq("doc_id"))
      .select(col("cluster_id")).distinct()
    val members = labels
      .join(broadcast(reqClusters), Seq("cluster_id"))
      .select(col("doc_id"))
      .collect().map(_.getLong(0))
    (ids.distinct ++ members).distinct.sorted
  }

  /** Mark documents DELETED from every batch-staged serve over `dir` —
    * the lexical family (BM25/phrase/proximity/snippet serves and their
    * catalog views) masks them from candidates, df, and the N/L corpus
    * scalars from the next read on. With `expandClusters` the request
    * routes through [[expandToClusters]] BEFORE filing — the expanded
    * set files under the ORIGINAL requestId, so redelivery of the
    * un-expanded request still self-replaces.
    */
  def deleteDocs(s: SparkSession, dir: String, ids: Seq[Long],
      requestId: String, expandClusters: Boolean = false): Unit = {
    requireReqId(requestId)
    require(ids.nonEmpty, "a takedown request must name at least one id")
    val distinctIds =
      if (expandClusters) expandToClusters(s, dir, ids) else ids.distinct
    // an id a purge already removed contributes nothing to the staged
    // tables anymore — probing it would re-subtract statistics the
    // rewrite already folded in (it still MASKS: a no-op on the purged
    // tables, live on the corpus-derived surfaces)
    val probeIds = distinctIds
      .filterNot(purgedIdsOf(purgedDocReqs, key(s, dir)))
    val info =
      if (probeIds.isEmpty) Map.empty[Long, DocInfo]
      else docInfoOf(s, dir, probeIds)
    docReqs.compute(key(s, dir), (_, prev) => {
      val m = if (prev == null)
        scala.collection.mutable.LinkedHashMap
          .empty[String, (Seq[Long], Map[Long, DocInfo])]
      else prev
      m.synchronized { m.put(requestId, (distinctIds, info)) }
      m
    })
    SqlCatalog.refreshAfterTakedown(s, dir)
  }

  /** Mark vectors DELETED from every batch-staged ANN serve over `dir`
    * (the IVF cell table and the IVF-PQ code table): probes stop
    * returning them from the next read on. Vector serves carry no
    * corpus-derived statistics, so the mask is membership-only.
    */
  def deleteVecs(s: SparkSession, dir: String, ids: Seq[Long],
      requestId: String): Unit = {
    requireReqId(requestId)
    require(ids.nonEmpty, "a takedown request must name at least one id")
    vecReqs.compute(key(s, dir), (_, prev) => {
      val m = if (prev == null)
        scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]
      else prev
      m.synchronized { m.put(requestId, ids.distinct) }
      m
    })
    SqlCatalog.refreshAfterTakedown(s, dir)
  }

  /** The merged doc-side tombstone of (session, dir) — None when no
    * request landed, so the untouched serve paths keep their exact
    * pre-takedown plans. Overlapping ids across requests merge by id
    * (same corpus row → same facts), never double-count.
    */
  private[graft] def docTomb(s: SparkSession, dir: String): Option[DocTomb] =
    Option(docReqs.get(key(s, dir))).flatMap { m =>
      val (allIds, merged) = m.synchronized {
        (m.values.flatMap(_._1).toSeq.distinct,
          m.values.map(_._2).foldLeft(Map.empty[Long, DocInfo])(_ ++ _))
      }
      if (allIds.isEmpty) None
      else Some(tombOf(allIds, merged))
    }

  /** Resolve an EXPLICIT id set into the same tomb shape the registry
    * produces — the pure half of [[deleteDocs]], for serves that take a
    * per-call takedown set (the q172 correctness entry) without touching
    * session state.
    */
  private[graft] def resolveDocs(s: SparkSession, dir: String,
      ids: Seq[Long]): DocTomb =
    tombOf(ids.distinct, docInfoOf(s, dir, ids.distinct))

  private def tombOf(allIds: Seq[Long],
      merged: Map[Long, DocInfo]): DocTomb = {
    val dfDelta = merged.values.flatMap(_.terms)
      .groupBy(identity).map { case (t, ts) => (t, ts.size.toLong) }
      .toSeq.sortBy(_._1)
    DocTomb(allIds, merged.size.toLong,
      merged.values.map(_.dl).sum, dfDelta)
  }

  /** The merged vec-side tombstone ids (None when no request landed). */
  private[graft] def vecIds(s: SparkSession, dir: String): Option[Seq[Long]] =
    Option(vecReqs.get(key(s, dir))).flatMap { m =>
      val ids = m.synchronized { m.values.flatten.toSeq.distinct }
      if (ids.isEmpty) None else Some(ids)
    }

  /** Every doc id that must stay masked on CORPUS-derived member
    * surfaces (the catalog band view and anything else that recomputes
    * from the raw documents table): the active requests' ids PLUS the
    * purged ones — a purge rewrites the staged tables, not the corpus,
    * so a plan-backed recompute would resurrect the purged documents
    * without this. None when nothing was ever requested (fold-on-None
    * plan identity).
    */
  private[graft] def maskableDocIds(s: SparkSession,
      dir: String): Option[Seq[Long]] = {
    val all = (docTomb(s, dir).map(_.ids).getOrElse(Seq.empty) ++
      purgedIdsOf(purgedDocReqs, key(s, dir))).distinct
    if (all.isEmpty) None else Some(all)
  }

  /** Purge NOW: physically rewrite every batch-staged serve table of
    * (session, dir) minus the currently masked ids — the on-demand form
    * of the rebuild-cadence purge described above, and the batch
    * analogue of the streaming side's compaction `rowFilter`
    * (reference semantics: delete-by-predicate before reload,
    * `src/DatabaseAgentMysql.php:254-261`). After it returns:
    *
    *   - the lexical family's staged files (postings, doclen, df,
    *     positions) hold zero masked rows, with the df/N/L adjustments
    *     folded into the rewritten tables and memoized scalars;
    *   - both staged vector tables (IVF-PQ codes, IVF cells) hold zero
    *     masked vec_ids;
    *   - every ADOPTED stream root's servable epochs hold zero masked
    *     ids too ([[purgeAdoptedRoots]]) — one purge call yields
    *     physical erasure of BOTH deployment halves, not just the
    *     session-staged one;
    *   - the satisfied requests move to the purged ledger (serves need
    *     no anti-join for them anymore — every serve result is
    *     UNCHANGED, StagedTakedownSpec pins it byte-for-byte);
    *   - the catalog views re-publish over the clean tables.
    *
    * A table not yet staged is staged first and then purged, so a later
    * ensure within the session cannot resurrect the rows. The staged
    * cluster-label tables get the strongest treatment: a filtered
    * rewrite would corrupt cluster accounting (min-ids, sizes, and
    * transitive chains through a deleted bridge all change), so they
    * are DROPPED and RE-CLUSTERED over the mask-filtered corpus
    * ([[graft.queries.Dedup.rebuildLabelsAfterPurge]]) — the post-purge
    * label set equals what a fresh session over the reduced corpus
    * computes; a label family never staged builds reduced on its next
    * ensure (the build masks the purged ledger). Crash safety: requests
    * move to
    * the purged ledger only AFTER every rewrite lands AND a post-rewrite
    * existence check confirms every serve table survived its
    * DROP+RENAME swap ([[requireRewritten]]) — a purge that dies midway
    * leaves the masks active, every rewrite step is idempotent (masks
    * re-drop to a no-op; df/N/L are RECOMPUTED from the purged tables,
    * never delta-subtracted), and re-running purge completes the job,
    * recovering a half-landed swap through
    * [[graft.Bucketing.rewriteInPlace]]'s scratch-restore path.
    * Cost shape:
    * one bucket-preserving rewrite per staged table — the price of
    * physical erasure, paid when the operator chooses, never forced per
    * request (masks carry the requests until then). Corpus-derived
    * surfaces that recompute from the raw documents keep masking the
    * purged ids ([[maskableDocIds]]) until the corpus itself is
    * rewritten — the one rewrite this API deliberately does not do (the
    * input data is the caller's, not the engine's).
    */
  /** Require every table a purge half rewrote to EXIST before its
    * requests retire to the purged ledger — the guard that keeps a
    * half-landed [[graft.Bucketing.rewriteInPlace]] swap (serve table
    * dropped, rename not yet landed) from retiring masks whose rows were
    * never actually purged: the require fails the purge loudly, the
    * masks stay active, and re-running purge completes the swap through
    * the rewrite's scratch-recovery path.
    */
  private def requireRewritten(s: SparkSession, tables: Seq[String]): Unit = {
    val missing = tables.filterNot(s.catalog.tableExists)
    require(missing.isEmpty,
      s"purge rewrite left staged tables missing: ${missing.mkString(",")} — " +
        "masks stay active; re-run purge to recover and complete the job")
  }

  def purge(s: SparkSession, dir: String): Unit = {
    val k = key(s, dir)
    docTomb(s, dir).foreach { t =>
      requireRewritten(s, queries.TextAnalysis.purgeLex(s, dir, t))
      // the label re-clustering masks THIS tomb's ids explicitly — the
      // requests only retire below, so a crash anywhere before that
      // re-runs the whole idempotent sequence
      requireRewritten(s, queries.Dedup.rebuildLabelsAfterPurge(s, dir,
        (t.ids ++ purgedIdsOf(purgedDocReqs, k)).distinct))
      purgeAdoptedRoots(s, dir, vecSide = false,
        (t.ids ++ purgedIdsOf(purgedDocReqs, k)).distinct)
      purgeAdoptedLabelRoots(s, dir,
        (t.ids ++ purgedIdsOf(purgedDocReqs, k)).distinct)
      // the appended DEMO artifacts (q184 labels, the q187–q189 lexapp
      // family, the q192 stream roots) are session demos derived from
      // the raw corpus: physical erasure is a drop — their next ensure
      // rebuilds over the corpus minus the purged ledger (each build
      // masks it), the never-staged-family posture
      queries.TextAnalysis.dropAppendedLex(s, dir)
      queries.Dedup.dropAppendedDemos(s, dir)
      val m = docReqs.remove(k)
      if (m != null) {
        val p = purgedDocReqs.computeIfAbsent(k, _ =>
          scala.collection.mutable.LinkedHashMap.empty)
        p.synchronized {
          m.synchronized(m.toSeq).foreach { case (rid, (ids, _)) =>
            p.put(rid, ids)
          }
        }
      }
    }
    vecIds(s, dir).foreach { ids =>
      // the rewrite masks the FULL purged union, not just the live
      // requests: a re-run after a mid-swap crash re-stages the
      // dropped code table from the raw embeddings — which still hold
      // every previously erased vector — and an ids-only mask would
      // resurrect the earlier purges' rows (the purgeLex posture)
      requireRewritten(s, queries.Similarity.purgeVecs(s, dir,
        (ids ++ purgedIdsOf(purgedVecReqs, k)).distinct))
      purgeAdoptedRoots(s, dir, vecSide = true,
        (ids ++ purgedIdsOf(purgedVecReqs, k)).distinct)
      // the appended vector demo (q190) — the same drop-and-rebuild
      // erasure as the doc-side demo families
      queries.Similarity.dropAppendedIvf(s, dir)
      val m = vecReqs.remove(k)
      if (m != null) {
        val p = purgedVecReqs.computeIfAbsent(k, _ =>
          scala.collection.mutable.LinkedHashMap.empty)
        p.synchronized {
          m.synchronized(m.toSeq).foreach { case (rid, ids0) =>
            p.put(rid, ids0)
          }
        }
      }
    }
    SqlCatalog.refreshAfterTakedown(s, dir)
  }

  /** [[purge]]'s reach into the ADOPTED stream roots — the other half of
    * the deployment ([[adoptStreamRoot]] bridged its durable ledger into
    * this registry; erasure must flow back out): the registry's full
    * maskable union files into each root's own tombstone relation under
    * ONE deterministic request identity (`purge-batch-registry` —
    * redelivery self-replaces, and the union only ever grows, so a
    * replaced payload never shrinks), then every servable epoch rewrites
    * minus the root's tombstones
    * ([[graft.streaming.BatchProtocol.purgeIndex]]). The root's
    * tombstone files deliberately SURVIVE the rewrite: an id that
    * arrives after its takedown must stay masked (takedown outranks
    * late arrival — the streaming protocol's standing rule), so the ids
    * outlive the purge exactly as they outlive a compaction. Runs
    * BEFORE the requests retire (the label-rebuild discipline): a crash
    * anywhere re-runs the whole idempotent sequence.
    */
  private def purgeAdoptedRoots(s: SparkSession, dir: String,
      vecSide: Boolean, ids: Seq[Long]): Unit = {
    val roots = Option(adoptedRoots.get(key(s, dir)))
      .map(x => x.synchronized(x.toSeq)).getOrElse(Seq.empty)
      .collect { case (root, side) if side == vecSide => root }
    if (roots.isEmpty || ids.isEmpty) return
    val keyCol = if (vecSide) "vec_id" else "doc_id"
    roots.foreach { root =>
      graft.streaming.Tombstones.delete(s, root, ids,
        "purge-batch-registry", keyCol)
      graft.streaming.BatchProtocol.purgeIndex(s, root,
        rel => graft.streaming.Tombstones.masked(s, root, rel, keyCol))
    }
  }

  /** [[purge]]'s reach into the ADOPTED LABEL roots — the same
    * file-then-erase protocol as [[purgeAdoptedRoots]], with the
    * erasure step the label artifact demands: the registry's maskable
    * union files into the root's own ledger under the deterministic
    * purge identity, then [[graft.streaming.LabelStream.purgeRoot]]
    * re-clusters the reduced committed state from its stored sketches
    * and rewrites every file under the root (base swap, epoch
    * retirement, band-index purge). The ledger survives — takedown
    * outranks late arrival. Runs BEFORE the requests retire; a crash
    * anywhere re-runs the whole idempotent sequence.
    */
  private def purgeAdoptedLabelRoots(s: SparkSession, dir: String,
      ids: Seq[Long]): Unit = {
    val roots = Option(adoptedLabelRoots.get(key(s, dir)))
      .map(x => x.synchronized(x.toSeq)).getOrElse(Seq.empty)
    if (roots.isEmpty || ids.isEmpty) return
    roots.foreach { root =>
      graft.streaming.Tombstones.delete(s, root, ids,
        "purge-batch-registry", "doc_id")
      graft.streaming.LabelStream.purgeRoot(s, root)
    }
  }

  /** Anti-join mask of `rel` against a tombstone id set — the broadcast
    * side is request-sized by nature. Fold-on-None keeps untouched
    * serves plan-identical.
    */
  private[graft] def masked(s: SparkSession, rel: DataFrame,
      ids: Option[Seq[Long]], keyCol: String): DataFrame =
    ids.fold(rel) { del =>
      import s.implicits._
      rel.join(broadcast(del.toDF(keyCol)), Seq(keyCol), "left_anti")
    }

  /** Mask a vector relation against `dir`'s vec-side registry. */
  private[graft] def maskedVecs(s: SparkSession, dir: String,
      rel: DataFrame): DataFrame =
    masked(s, rel, vecIds(s, dir), "vec_id")

  /** Adopt a streaming tombstone root's requests into this session's
    * batch registry — the bridge that makes the DURABLE ledger (the
    * [[graft.streaming.Tombstones]] root the scaladoc above names as
    * the deployment's takedown source of truth) actually feed the
    * batch-staged serves: a session run against a corpus whose
    * streaming indexes carry takedowns calls this once at startup (and
    * after any new request lands) and every staged serve masks the same
    * ids the streaming serves mask. Request identity is preserved
    * END-TO-END: each `req=<id>` dir re-files under a root-namespaced
    * requestId, so re-adoption self-replaces and a redelivered stream
    * request replaces its adoption too. A CONSOLIDATED root adopts as
    * its compacted request, whose ids superset the originals it
    * replaced — any stale per-request adoptions from before the
    * consolidation overlap it by id, which the registry merges without
    * double-adjusting (spec-pinned). Per-request cost is the bounded
    * [[deleteDocs]]/[[deleteVecs]] probe — request-sized, never a
    * corpus read. Returns the number of requests adopted.
    */
  def adoptStreamRoot(s: SparkSession, dir: String, indexPath: String,
      vecSide: Boolean = false): Int = {
    // remember the root (requests or not): a later [[purge]] extends
    // physical erasure to its epochs, including for requests that only
    // land batch-side after this adoption
    adoptedRoots.compute(key(s, dir), (_, prev) => {
      val set = if (prev == null)
        scala.collection.mutable.LinkedHashSet.empty[(String, Boolean)]
      else prev
      set.synchronized { set.add((indexPath, vecSide)) }
      set
    })
    adoptRequests(s, dir, indexPath, vecSide)
  }

  /** Adopt a LABEL root ([[graft.streaming.LabelStream]]) into this
    * session's registry — [[adoptStreamRoot]] for the label artifact:
    * its ledger's requests file into the batch registry under the same
    * end-to-end identity, and a later [[purge]] extends PHYSICAL
    * erasure to the root through the re-clustering path
    * ([[purgeAdoptedLabelRoots]]) instead of the row-filter one.
    * Returns the number of requests adopted.
    */
  def adoptLabelRoot(s: SparkSession, dir: String, root: String): Int = {
    adoptedLabelRoots.compute(key(s, dir), (_, prev) => {
      val set = if (prev == null)
        scala.collection.mutable.LinkedHashSet.empty[String]
      else prev
      set.synchronized { set.add(root) }
      set
    })
    adoptRequests(s, dir, root, vecSide = false)
  }

  /** The request-adoption tail shared by [[adoptStreamRoot]] and
    * [[adoptLabelRoot]]: each `req=<id>` dir re-files under a
    * root-namespaced requestId, so re-adoption self-replaces and a
    * redelivered stream request replaces its adoption too.
    */
  private def adoptRequests(s: SparkSession, dir: String,
      indexPath: String, vecSide: Boolean): Int = {
    val reqs = graft.streaming.Tombstones.requests(s, indexPath,
      if (vecSide) "vec_id" else "doc_id")
    // sanitization is lossy ('/a/b' and '/a_b' both read '_a_b'), so the
    // tag carries a short hash of the RAW path — two distinct roots can
    // never collide into one adoption identity (same root stays
    // deterministic, so re-adoption still self-replaces)
    val tag = indexPath.replaceAll("[^A-Za-z0-9_-]", "_") +
      f"-${indexPath.hashCode & 0x7fffffff}%08x"
    reqs.foreach { case (name, ids) =>
      val rid = s"adopt-$tag-$name".replaceAll("[^A-Za-z0-9_-]", "_")
      if (vecSide) deleteVecs(s, dir, ids, rid)
      else deleteDocs(s, dir, ids, rid)
    }
    reqs.size
  }

  /** The one-row takedown posture of (session, dir) — the batch-side
    * analogue of [[graft.streaming.LexStream.indexCard]]'s tombstone
    * columns: request and masked-id counts plus the document-side stat
    * adjustments currently in force, the numbers an operator confirms
    * after filing a request. Driver-held state only (the registry IS
    * driver state) — zero cluster work.
    */
  def card(s: SparkSession, dir: String): DataFrame = {
    val ss = s
    import ss.implicits._
    val dt = docTomb(s, dir)
    val nDocReq = Option(docReqs.get(key(s, dir)))
      .map(m => m.synchronized(m.size)).getOrElse(0)
    val nVecReq = Option(vecReqs.get(key(s, dir)))
      .map(m => m.synchronized(m.size)).getOrElse(0)
    Seq((nDocReq.toLong,
        dt.map(_.ids.size.toLong).getOrElse(0L),
        dt.map(_.nDel).getOrElse(0L),
        dt.map(_.lDel).getOrElse(0L),
        nVecReq.toLong,
        vecIds(s, dir).map(_.size.toLong).getOrElse(0L),
        purgedIdsOf(purgedDocReqs, key(s, dir)).size.toLong,
        purgedIdsOf(purgedVecReqs, key(s, dir)).size.toLong))
      .toDF("n_doc_requests", "n_doc_ids", "n_docs_present",
        "tok_mass_deleted", "n_vec_requests", "n_vec_ids",
        "n_doc_ids_purged", "n_vec_ids_purged")
  }

  /** Test/ops hook: forget every request of (session, dir) — the state
    * reset a spec needs between scenarios (a production session retires
    * its registry with the session itself).
    */
  private[graft] def reset(s: SparkSession, dir: String): Unit = {
    docReqs.remove(key(s, dir))
    vecReqs.remove(key(s, dir))
    purgedDocReqs.remove(key(s, dir))
    purgedVecReqs.remove(key(s, dir))
    adoptedRoots.remove(key(s, dir))
    adoptedLabelRoots.remove(key(s, dir))
    SqlCatalog.refreshAfterTakedown(s, dir)
  }
}
