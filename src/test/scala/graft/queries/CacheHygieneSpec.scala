package graft.queries

import graft.{Caches, SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle contract: queries that persist intermediates (sketch
  * projections, gram relations, scored projections) or hold
  * localCheckpoint blocks (the clustering loop) must leave ZERO
  * persistent blocks once the consumer calls `Caches.release` — the
  * completion hook Verify and Bench invoke after every query. Without
  * this, a long-lived session leaks one block set per query; the leak is
  * invisible to the bench (which releases between reps) and fatal to a
  * resident service.
  *
  * `getPersistentRDDs` is the authoritative registry: it sees BOTH
  * DataFrame-cache blocks and checkpoint-backing RDDs (which
  * `catalog.clearCache` alone cannot release).
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val persisting = Seq(
    "q22_ngram_jaccard", "q25_minhash_lsh", "q27_simhash_pairs",
    "q42_simhash64_pairs", "q35_ann_ivf", "q39_cosine_neardup_lsh",
    "q46_tfidf_top_terms", "q43_neardup_clusters", "q44_dedup_survivors",
    "q52_cluster_prep", "q57_decontaminate", "q58_token_budget",
    "q61_mean_surprisal", "q69_pagerank", "q71_dup_ngrams",
    "q72_sequence_pack", "q74_chunk_windows", "q75_knn_graph",
    "q76_semantic_dedup", "q77_triangle_support", "q79_split_leakage",
    "q81_epoch_shuffle", "q82_shuffled_pack", "q84_hard_negatives",
    "q85_curriculum_order", "q86_source_minhash", "q87_bpe_merges",
    "q94_dup_passage", "q95_ann_recall_audit", "q96_label_separation",
    "q97_curation_pipeline", "q98_retention_cohorts",
    "q88_bigram_surprisal", "q89_source_leakage", "q90_bpe_encode",
    "q92_media_phash", "q93_pack_trained", "q99_winnow_pairs",
    "q100_source_drift", "q101_cluster_balanced",
    "q102_bloom_decontaminate", "q103_chunk_trained", "q104_span_scrub",
    "q105_quality_survivors", "q106_dsir_weights", "q107_dsir_select",
    "q108_scrub_apply", "q109_dsir_hashed", "q110_semantic_decontam",
    "q111_media_clusters", "q112_source_yield", "q113_trained_budget",
    "q114_chunk_scrubbed", "q115_source_centroids", "q117_ivf_health",
    "q119_pack_manifest", "q121_shuffled_manifest", "q122_ann_serve_batch",
    "q123_shard_plan", "q124_calibrated_select", "q125_gram_containment",
    "q126_tokenizer_fertility", "q127_soft_dedup", "q128_embedding_health",
    "q129_manifest_checksum", "q131_caption_conflicts",
    "q136_sketch_precision", "q139_contam_attribution",
    "q140_source_diversity", "q142_discounted_budget", "q147_chunk_mixing",
    "q148_bm25_topk", "q149_hybrid_rrf", "q150_clusters64",
    "q151_survivors64", "q152_retrieval_agreement", "q153_band64_health",
    "q156_mixture_select", "q157_knn_label_probe", "q164_diverse_topk",
    "q165_multimodal_pack", "q166_nb_quality", "q167_serve_eval_card",
    "q168_nb_hashed", "q169_chunk_curriculum", "q170_takedown_impact",
    "q171_length_batches", "q175_takedown_expand",
    "q176_takedown_eval_card", "q177_dedup_card", "q178_prf_topk",
    "q179_rocchio_ann", "q180_feedback_eval_card", "q181_feature_rerank",
    "q182_impact_bm25_topk", "q183_impact_recall_audit",
    "q184_label_append", "q185_bounded_hybrid",
    "q186_bounded_hybrid_recall", "q187_lex_append_topk",
    "q188_impact_append_topk", "q189_pos_append_topk",
    "q190_vec_append_serve", "q191_append_drift_card",
    "q192_label_stream", "q193_impact_k_card")

  for (q <- persisting) test(s"$q leaves zero persistent blocks after release") {
    SparkEntry.queries(q)(spark, dir).count()
    Caches.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.toString).mkString("; "))
  }
}
