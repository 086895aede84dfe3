package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries so the
  * physical plans can be audited: filters/projections must reach the
  * parquet scan (PushedFilters / ReadSchema), small sides must
  * broadcast, and hot paths must sit inside WholeStageCodegen spans.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq(
      "q_scan_prune", "q_join_multi", "q_agg_group", "q_window_rank",
      "q_anti_join", "q_theta_bands", "q_minhash_pairs", "q_ann_topk",
      "q_ann_ivf", "q_embed_dup", "q_rollup_hier", "q_sessionize",
      "q_corpus_pipeline", "q_dedup_apply", "q_kmv_distinct", "q_asof_join",
      "q_seq_pack", "q_contam", "q_domain_mix", "q_repetition",
      "q_dedup_incr", "q_corpus_profile", "q_dup_clusters",
      "q_tfidf_pairs", "q_chunk_split", "q_quantile_hist",
      "q_kmeans", "q_span_dedup", "q_unigram_lm", "q_json_extract",
      "q_zorder", "q_bigrams", "q_tokenize", "q_curation_v2",
      "q_cube", "q_window_lead", "q_session_window",
      "q_bigram_lm", "q_weighted_sample", "q_winnow_pairs",
      "q_semdedup", "q_dsir", "q_pagerank", "q_cdc_upsert",
      "q_bpe_encode", "q_bm25", "q_ann_rp", "q_rrf", "q_phash",
      "q_scd2", "q_gap_fill", "q_triangles", "q_fuzzy_join",
      "q_snapshot_diff", "q_leak_split", "q_group_gate",
      "q_funnel", "q_retention", "q_rolling_range", "q_rollup_sets",
      "q_scd2_lookup", "q_incr_agg", "q_neg_sample", "q_dq_report",
      "q_outlier_mad", "q_token_budget", "q_strat_sample",
      "q_pq_encode", "q_pq_adc", "q_pq_ivf", "q_pq_residual",
      "q_allpairs", "q_sq8_encode", "q_sq8_topk", "q_mmr",
      "q_span_scrub", "q_dedup_best", "q_curation_v3",
      "q_ivf_append", "q_temp_mix", "q_ann_rerank",
      "q_shuffle_shards", "q_drift")
    val qs = SparkEntry.queries // built (and dup-checked) once
    interesting.foreach { name =>
      println(s"\n========== $name ==========")
      qs(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
