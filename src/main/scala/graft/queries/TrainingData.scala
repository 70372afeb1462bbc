package graft.queries

import graft.{GraftQuery, Tables}
import graft.ops.{BloomJoin, Dedup, Multimodal, Pipeline, Profiling, Retrieval, Sampling, Similarity, Sketches, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline query surface — registration facade.
  *
  * The ~90 query definitions live in themed modules
  * (TrainingDataText / Dedup / Ann / Sampling / Sketch / Media);
  * `all` preserves the original registration order.
  */
object TrainingData {
  import TrainingDataText._
  import TrainingDataDedup._
  import TrainingDataCuration._
  import TrainingDataAnn._
  import TrainingDataSampling._
  import TrainingDataSketch._
  import TrainingDataMedia._

  def all: Seq[GraftQuery] = Seq(
    td_lang_classifier, td_classifier_calibration, td_kmv_quantiles,
    td_text_stats, td_lang_id, td_lang_purity, td_text_hygiene, td_vocab_richness, td_fingerprint, td_dedup_exact, td_dup_profile, td_dedup_roi,
    td_char_jaccard, td_cosine_topk, td_minhash_neardup,
    td_incremental_neardup, td_source_neardup, td_ngram_jaccard,
    td_containment, td_containment_dedup, td_minhash_error,
    td_dup_spans, td_dup_span_removal, td_lm_bigram, td_gopher_quality,
    td_source_cap, td_fold_accents, td_edit_neardup, td_fuzzy_decontam,
    td_line_repetition, td_c4_clean, td_blocklist_scrub,
    td_semantic_decontam,
    td_heavy_hitters, td_hll_registers, td_hll_by_source,
    td_pipeline_e2e, td_hashed_tf, td_tfidf, td_bm25, td_mrr,
    td_hybrid_rrf,
    td_dedup_components, td_cc_largestar, td_dedup_survivors, td_dedup_best,
    td_dedup_canonical,
    td_simhash_md5, td_ann_lsh_md5, td_embedding_neardup, td_ann_ivf,
    td_kmeans, td_ivf_balance, td_ann_ivf_trained, td_ann_ivf_indexed, td_pq_adc, td_ann_ivfpq,
    td_ann_sq8, td_ann_ivf_sq8, td_kmv_overlap, td_hard_negatives,
    td_ann_recall, td_content_chunks, td_content_chunks_fast,
    td_boilerplate_removal,
    td_rare_words, td_chunk_dedup, td_cooccurrence,
    td_quality_prune, td_quality_prune_cutoff, td_drift_tvd, td_corpus_diff,
    td_length_buckets,
    td_sample_hash, td_sample_stratified, td_sample_weighted,
    td_dsir_select,
    td_domain_mix, td_temperature_mix, td_bpe_encode, td_bpe_train,
    td_token_fertility,
    td_token_quantiles, td_quantiles_by_value, td_quantile_sketch,
    td_join_estimate,
    td_pack_sequences, td_decontam, td_decontam_canonical,
    td_decontam_spans, td_winnowing, td_winnowing_density,
    td_incremental_winnowing, td_winnow_index_pruned, td_embedding_drift,
    td_lsh_precision, td_curation_funnel,
    td_token_budget, td_interleave, td_train_split,
    td_split_leakage_safe, td_pii_scrub,
    td_media_meta, td_media_frames, td_media_features, td_media_neardup,
    td_quality_repetition, td_semdedup, td_epoch_shuffle, td_profile,
    td_sufficient_stats, td_chunk_embed, td_mean_pool)
}

