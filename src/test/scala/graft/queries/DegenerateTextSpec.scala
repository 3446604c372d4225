package graft.queries

import graft.SparkTestSession
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate documents — null text, empty text, whitespace-only, single
  * token — must flow through every document operator without crashing:
  * real corpora contain all of these, and a 100 TB job that dies on row
  * 3 billion is the failure mode this guards.
  */
class DegenerateTextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-degen").toString
    Seq(
      (0L, null.asInstanceOf[String]),
      (1L, ""),
      (2L, "   \t  "),
      (3L, "solo"),
      (4L, "the and of to in is a normal document with enough tokens"))
      .toDF("doc_id", "text")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private val docQueries = Seq(
    "q17_lang_id", "q18_quality_score", "q19_token_count", "q20_fingerprint",
    "q21_dedup_exact", "q22_ngram_jaccard", "q25_minhash_lsh",
    "q26_simhash", "q27_simhash_pairs", "q42_simhash64_pairs",
    "q36_prep_pipeline", "q40_vocab_topk", "q41_repetition", "q71_dup_ngrams",
    "q94_dup_passage",
    "q43_neardup_clusters", "q44_dedup_survivors", "q150_clusters64",
    // q184 splits the degenerate corpus into old/delta shards and
    // appends — every doc (null text included) still labels
    "q184_label_append",
    "q177_dedup_card",
    "q69_pagerank",
    "q77_triangle_support",
    "q45_quality_filter",
    // q46 drops null-text docs by construction (explode of a null token
    // array yields no rows); q47/q53 read lang, absent from this
    // text-only fixture, so they are exercised at the real corpus instead
    "q46_tfidf_top_terms", "q50_pii_scan", "q51_pii_redact",
    "q52_cluster_prep", "q54_heavy_hitters", "q61_mean_surprisal",
    // curation: q56 assigns every doc (incl. null text), q57 keeps every
    // train doc with overlap 0, q58 selects a budgeted subset; q59 needs
    // a lang column and is degenerate-tested in CurationSpec instead
    "q56_hash_split", "q57_decontaminate", "q102_bloom_decontaminate",
    "q58_token_budget",
    "q72_sequence_pack", "q74_chunk_windows", "q81_epoch_shuffle",
    // q85 positions only tokenizable docs (null text is absent, the rest
    // rank); q86 needs a source column and is degenerate-tested in
    // CurationSpec's empty-corpus row instead
    "q85_curriculum_order", "q87_bpe_merges", "q88_bigram_surprisal",
    // q90 left-joins counts back to every doc (null text -> 0/0 row);
    // q93 packs only docs with >= 1 trained token; q92's sketch skips
    // empty/null payloads and pairs only near-dups
    "q90_bpe_encode", "q92_media_phash", "q93_pack_trained",
    // q99 emits pairs only (null text yields a null fingerprint array,
    // whose explode contributes no keys)
    "q99_winnow_pairs",
    // q103 emits per-chunk rows for tokenizable docs only (q74's
    // contract over the trained stream); q104/q108 re-admit every doc
    // (null text -> null/zero columns, never a crash); q106 needs a
    // source column and is degenerate-tested in DsirSpec instead
    "q103_chunk_trained", "q104_span_scrub", "q105_quality_survivors",
    "q151_survivors64",
    "q108_scrub_apply", "q114_chunk_scrubbed",
    // q123 reports per shard; q127 labels every doc (q43's domain); q125
    // emits pairs only; q129 folds to one integrity row. q124/q126/q128/
    // q130 need a source column and are fixture-tested in
    // CurationSpec/BpeSpec/EmbeddingHealthSpec instead
    "q123_shard_plan", "q125_gram_containment", "q127_soft_dedup",
    "q129_manifest_checksum", "q131_caption_conflicts",
    // q148/q154/q158/q159's modulus sample lands on doc 0 here (null
    // text -> a term-less/phrase-less query -> an empty ranked list,
    // never a crash)
    "q148_bm25_topk", "q154_phrase_topk", "q158_phrase3_topk",
    "q159_proximity_topk", "q160_lex_index_card", "q161_phrase_snippets",
    // q172's takedown set is empty here only if no doc_id % tmod = 1 —
    // with ids 0..5 and tmod 5 it masks doc 1 and serves like q148
    "q172_takedown_bm25",
    // q178's one sampled query has null text → empty round 1 → no
    // feedback → a defined empty serve, never a crash; q181 re-ranks
    // the same empty page
    "q178_prf_topk", "q181_feature_rerank",
    // q182 serves the same null-text sample over its impact lists (no
    // terms → defined empty); q183 folds the two empty pages to zero rows
    "q182_impact_bm25_topk", "q183_impact_recall_audit",
    // q187/q188/q189 serve the same sample over the appended index
    // family's three layers (the degenerate doc 3 arrives as the delta
    // shard — still appends)
    "q187_lex_append_topk", "q188_impact_append_topk",
    "q189_pos_append_topk",
    // q191 folds the degenerate corpus's band relation to one card row
    "q191_append_drift_card",
    // q193 folds the degenerate sidecar (few terms, tiny lists — all
    // complete, so the card certifies) to one row
    "q193_impact_k_card",
    // q192 adopts the degenerate base and streams doc 3 (its second
    // batch is EMPTY — a defined no-op epoch); every doc still labels
    "q192_label_stream",
    // q175 expands the same residue-1 request over q150's labels (every
    // degenerate doc is its own cluster — the request expands to itself)
    "q175_takedown_expand",
    "q162_repetition_card", "q163_retrieval_selfcheck", "q164_diverse_topk",
    "q136_sketch_precision", "q139_contam_attribution",
    "q142_discounted_budget", "q146_length_quality_grid",
    // the media table derives from documents, so the same degenerate
    // corpus exercises the multimodal operators' empty/null payloads
    "q31_media_decode", "q32_media_features", "q33_frame_sample",
    "q34_media_resize",
    // q165 packs EVERY degenerate doc (media cost keeps null text in
    // the stream) but reports per chunk, not per doc; q166 emits one
    // row per doc (null text -> null model columns, gate false)
    // q170 needs a source column and is fixture-tested in DedupSpec
    // instead (the q106/q124 convention); q167/q176/q180/q185/q186 need
    // embeddings and are fixture-tested in RetrievalSpec/
    // StagedTakedownSpec instead
    "q165_multimodal_pack", "q166_nb_quality", "q168_nb_hashed",
    "q169_chunk_curriculum", "q171_length_batches")

  for (q <- docQueries) test(s"$q survives null/empty/whitespace/short docs") {
    val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
    // pair queries legitimately return no pairs here; per-doc queries must
    // still emit a row per non-null doc (null text rows may yield nulls
    // but not crashes)
    if (!Set("q22_ngram_jaccard", "q25_minhash_lsh", "q27_simhash_pairs",
        "q42_simhash64_pairs",
        "q36_prep_pipeline", "q40_vocab_topk", // q40 is corpus-level
        "q44_dedup_survivors", // one row per cluster, not per doc
        "q177_dedup_card", // one card row by construction
        "q105_quality_survivors", // one row per cluster, not per doc
        "q151_survivors64", // one row per cluster, not per doc
        "q46_tfidf_top_terms", // ≤3 rows per non-empty doc
        "q52_cluster_prep", // filtered composite, like q36
        "q54_heavy_hitters", // corpus-level top-10
        "q77_triangle_support", // rows only for docs inside a triangle
        "q58_token_budget", // budgeted subset, not one row per doc
        "q72_sequence_pack", // one row per chunk, not per doc
        "q85_curriculum_order", // positions only tokenizable docs
        "q87_bpe_merges", // <= BpeRounds merge rows, not per doc
        "q88_bigram_surprisal", // rows only for docs with >= 1 bigram
        "q92_media_phash", // pairs only; degenerate corpus has none
        "q99_winnow_pairs", // pairs only; degenerate corpus has none
        "q93_pack_trained", // one row per chunk, not per doc
        "q103_chunk_trained", // one row per chunk, not per doc
        "q123_shard_plan", // one row per shard, not per doc
        "q125_gram_containment", // pairs only; degenerate corpus has none
        "q129_manifest_checksum", // one integrity row by construction
        "q131_caption_conflicts", // pairs only; degenerate corpus has none
        "q136_sketch_precision", // rows only where pairs exist
        "q139_contam_attribution", // rows only for contaminated docs
        "q142_discounted_budget", // budgeted subset, not one row per doc
        "q146_length_quality_grid", // one row per grid cell, not per doc
        "q148_bm25_topk", // the sampled query here has null text -> no list
        "q172_takedown_bm25", // q148's sample through the takedown mask
        "q178_prf_topk", // same sample: null text -> no round 1 -> no list
        "q181_feature_rerank", // re-ranks the same empty page
        "q182_impact_bm25_topk", // same sample over the impact lists
        "q183_impact_recall_audit", // folds two empty pages
        "q187_lex_append_topk", // same sample over the appended family
        "q188_impact_append_topk", // its impact layer
        "q189_pos_append_topk", // its positional layer
        "q191_append_drift_card", // one card row by construction
        "q193_impact_k_card", // one card row by construction
        "q175_takedown_expand", // rows only for the request's members
        "q164_diverse_topk", // same sample: no candidates -> empty serve
        "q154_phrase_topk", // same sample: null text -> no phrase -> no list
        "q158_phrase3_topk", "q159_proximity_topk", // same cut at k=3 / slop
        "q161_phrase_snippets", // same phrase cut as q154
        "q160_lex_index_card", // one card row by construction
        "q163_retrieval_selfcheck", // one card row by construction
        "q165_multimodal_pack", // one row per chunk, not per doc
        "q169_chunk_curriculum", // one row per chunk, not per doc
        "q171_length_batches", // one row per padded batch, not per doc
        "q32_media_features", "q33_frame_sample" // per-doc × 8 / × 4 rows
        ).contains(q))
      assert(rows.length >= 4, s"$q dropped degenerate docs: ${rows.length}")
    spark.catalog.clearCache()
  }
}
