package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive near-dup clustering — the step a training-data pipeline runs
  * AFTER pair generation: near-duplication is transitive in practice (A≈B,
  * B≈C ⇒ the three are one content cluster even when A/C's sketches differ
  * by more than the pair threshold), so the dedup deliverable is connected
  * components over the pair graph, then one kept document per component.
  *
  * q43 assigns every document its component id (the component's minimum
  * doc_id — a deterministic canonical representative); q44 reduces that to
  * the survivor report (kept doc + cluster size), the transitive analogue
  * of q21's exact-hash (keep_id, n_dups).
  *
  * Algorithm: iterative min-label propagation (label(u) ← min over
  * N(u) ∪ {u}), the standard Pregel-style connected-components formulation:
  *   - per round: ONE shuffle join (labels into edge sources) + ONE
  *     map-side-combined min-aggregation on doc_id — both partition on the
  *     keys they shuffle on, no broadcast of anything corpus-sized;
  *   - rounds are bounded by the largest component's diameter. Near-dup
  *     components are dense content clusters (diameter 1–3); the frequency
  *     caps inherited from q27 also bound |E| ≤ bands·cap·n, so each round
  *     is linear in the corpus. For adversarial long-chain graphs the
  *     published O(log n)-round alternative is alternating large-star/
  *     small-star contraction (Kiveris et al., "Connected Components in
  *     MapReduce and Beyond", 2014) — same join/agg primitives, so it
  *     drops into this loop without changing the operator contract;
  *   - every round truncates lineage (localCheckpoint — on a cluster,
  *     `checkpoint` against the job's checkpoint dir): without truncation
  *     the iterated plan doubles per round and Catalyst analysis, not the
  *     data, becomes the bottleneck;
  *   - convergence is exact (a changed-label count hitting zero), not a
  *     fixed round budget — labels only ever decrease, so the loop
  *     terminates at the true component minimum that the DuckDB
  *     recursive-CTE oracle computes independently.
  *
  * Reference surface: the reference engine has no graph operator; this is
  * north-star extension surface (SURVEY.md §2 "beyond the reference"), fed
  * by q27's pair semantics so the oracle chain stays one SQL text.
  */
object Dedup {

  /** Converged (doc_id, cluster_id) labels over the q27 near-dup graph:
    * cluster_id = min doc_id reachable through hamming≤8 pairs (documents
    * with no near-dup partner are their own singleton cluster).
    */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val pairs = Similarity.queries("q27_simhash_pairs")(s, dir)
      .select(col("doc_a"), col("doc_b"))
    // undirected graph = both edge directions; persisted once, read every
    // round (at cluster scale: a staging table partitioned by src)
    val edges = pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
      .persist()
    var labels = Tables(s, dir, "documents")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // propagate each node's current label to its neighbors, then take
      // the min of (own label, neighbor labels) — partial-aggregated
      // map-side before the one exchange on doc_id
      val prop = edges.join(labels, col("src") === col("doc_id"))
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val next = labels.union(prop)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint() // truncate lineage: plan size stays O(1) per round
      changed = next.select(col("doc_id"), col("cluster_id").as("nc"))
        .join(labels, "doc_id")
        .filter(col("nc") < col("cluster_id"))
        .count()
      labels = next
    }
    edges.unpersist()
    labels
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // transitive near-dup cluster assignment: every document labeled with
    // the min doc_id of its connected component in the q27 pair graph
    "q43_neardup_clusters" -> ((s, dir) => clusterLabels(s, dir)),

    // survivor report: one row per component — the kept (minimum) doc_id
    // and how many documents merged into it. `keep_id = doc_id` rows of
    // q43 are the post-dedup corpus; this is its accounting view.
    "q44_dedup_survivors" -> ((s, dir) =>
      clusterLabels(s, dir)
        .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
        .select(col("cluster_id").as("keep_id"), col("cluster_size"))))

  // DuckDB mirrors: transitive closure as a recursive CTE over the SAME
  // pair CTE chain q27's oracle uses (Similarity.SqlSimhashPairCtes) —
  // `walk` reaches (id, lbl) whenever lbl's doc can reach id through the
  // symmetrized pair graph, so MIN(lbl) per id is the component minimum.
  // UNION (not UNION ALL) in the recursive member is the fixpoint/
  // termination condition.
  private def sqlClusters: String =
    s"""WITH RECURSIVE ${Similarity.SqlSimhashPairCtes},
       |pairs AS (${Similarity.SqlSimhashPairSelect.replace("\n", " ")}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |walk(id, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.id),
       |clusters AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
       |  FROM walk GROUP BY id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q43_neardup_clusters" ->
      s"$sqlClusters\nSELECT doc_id, cluster_id FROM clusters",

    "q44_dedup_survivors" ->
      s"""$sqlClusters
         |SELECT cluster_id AS keep_id, COUNT(*) AS cluster_size
         |FROM clusters GROUP BY cluster_id""".stripMargin)
}
