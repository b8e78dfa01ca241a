package graft

/** Plan-shape regression net: no registered analytic query may plan a
  * CartesianProduct, and a BroadcastNestedLoopJoin may appear only on
  * the bounded-input allowlist below. Every intentional cross join in
  * the repo is a broadcast nested-loop over a singleton aggregate or a
  * ≤model-row frame (d05/d12 counts, l09 query vector, l14/l15
  * centroids, l21 stats) — a CartesianProduct appearing instead means
  * someone dropped a join predicate or defeated the broadcast, the
  * classic silent scale-killer that still "passes" on 60k test rows.
  *
  * Scope: the queries whose constructors are LAZY (pure plan builders).
  * Side-effecting constructors (the d-, s05/s06 and m-families) execute
  * scratch writes, and the barrier-bearing candidate builders (l07,
  * l08, l14-l16, l21, l24) run materialization jobs at construction —
  * their plan shapes are reviewed via `graft.tools.Explain` instead. */
class PlanAuditSpec extends SparkSpec {

  private val lazyQueries = Seq(
    "q01_revenue_by_nation", "q02_hourly_stats", "q03_duration_agg",
    "q04_global_count", "q05_count_distinct", "q06_conditional_ratio",
    "q07_having", "q08_stddev", "q09_agg_of_agg", "q10_null_counts",
    "q11_minmax", "q12_prepost_compare", "q13_left_join_expr",
    "q14_semi_join", "q15_rank_join", "q16_merge_upsert",
    "q17_asof_scd2", "q18_sql_entry",
    "w01_row_number_ids", "w03_lag_features", "w04_rolling_avg",
    "w05_median_per_group", "w06_window_extras", "w24_percentile_window",
    "o03_bare_limit", "o04_set_ops", "o05_nulls_ordering",
    "x01_string_funcs", "x02_datetime_funcs", "x03_conditional_null",
    "x04_uuid", "x05_json_roundtrip", "x06_predicates", "x07_geohash",
    "x08_pivot", "x09_rollup", "x10_complex_types", "x11_array_funcs",
    "s11_generated_source",
    "p01_dead_letter_counts", "p02_valid_hourly_agg",
    "p03_normalized_projection", "p04_passthrough_count",
    "t01_tumbling_window_agg", "t02_hour_window_agg",
    "t03_session_window_agg", "t04_stream_dedup",
    "l01_text_stats", "l02_quality_score", "l03_langid",
    "l04_token_count", "l05_exact_dedup", "l06_fingerprints",
    "l09_cosine_topk", "l10_embedding_neardup", "l11_ann_buckets",
    "l12_multimodal_stats", "l35_frame_sampling",
    "l69_media_decode", "l70_video_frame_decode", "l100_image_resize",
    "l13_token_jaccard", "l17_train_split", "l18_decontamination",
    "l36_pq_index", "l37_pq_search", "l38_ivfpq_search",
    "l39_hard_negatives", "l52_ann_recall",
    "l19_repetition_filter", "l20_pii_scrub", "l22_sequence_packing",
    "l23_stratified_sample", "l25_curation_pipeline",
    "l26_incremental_dedup",
    "l27_paragraph_dedup", "l28_boilerplate_lines", "l29_heavy_hitters",
    "l30_tfidf_keywords", "l31_token_chunks", "l33_temperature_sample",
    "k01_salted_agg", "k02_approx_distinct", "k04_approx_quantile",
    "k05_salted_join", "k06_bloom_join", "k07_bucketed_range_join",
    "k08_auto_binned_range_join",
    "q19_anti_join", "q20_full_outer", "q21_correlated_subquery",
    "q22_star_join", "q23_funnel", "q24_asof_native",
    "q25_cohort_retention",
    "x12_grouping_sets", "x13_cube", "t09_sliding_window_agg",
    "l40_dsir_resample", "l41_span_dedup", "l42_domain_mixing",
    "l43_bm25_topk", "l44_curriculum_bands", "l45_contamination_score",
    "l46_source_drift", "l47_sequence_examples", "l48_class_balance",
    "l49_vocab_coverage", "l50_chunk_retrieval", "l51_corpus_datasheet",
    "l53_bpe_pairs", "l54_dataset_checksum", "l56_shard_manifest",
    "w07_time_range_window", "w08_pattern_runs", "w09_sessionization",
    "w10_anomaly_hours", "w11_gapfill", "w15_interpolate",
    "w16_seasonal_naive",
    "x17_map_funcs", "x18_unpivot", "x19_try_arith",
    "o06_offset_fetch", "l62_gopher_rules", "l64_fuzzy_dedup",
    "l71_retrieval_quality", "l72_matryoshka_audit",
    "w17_decayed_engagement", "o07_keyset_pagination",
    "t05_attribution_join", "t06_stateful_profile",
    "t07_stream_static_enrich",
    "l86_winnowing", "l87_binary_rerank", "l88_kfold_leakage",
    "l89_collocation_lift", "q33_waiting_supplier", "w20_mad_outliers",
    "l90_good_turing", "m11_dq_expectations", "x21_pseudonymize",
    "t12_sketch_merge", "l91_wilson_gates",
    "q34_top_supplier_view", "q35_dormant_customers",
    "q36_volume_shipping", "q37_market_share",
    "q38_order_count_distribution", "q39_small_qty_revenue",
    "q40_disjunctive_revenue", "w21_histogram_quantiles",
    "k14_delta_agg_merge", "l93_label_agreement",
    "x22_lateral_topk", "t13_cdc_upsert", "l94_perceptual_dedup",
    "l96_bradley_terry", "l97_ks_drift",
    "q42_priority_lateness", "q43_returned_items",
    "q44_latency_priority_mix", "q45_large_volume_orders",
    "q46_promo_revenue", "l95_prefix_cache", "w22_cusum_changepoint",
    "w23_gini_concentration", "q50_pricing_summary",
    "q51_shipping_priority", "q52_forecast_revenue",
    "q49_part_supplier_counts",
    "l103_quality_classifier", "l104_ndcg")
    // l101/l102 build behind barriers (points frame / shared candidate
    // frame) — constructors run jobs, reviewed via graft.tools.Explain

  test("ingest parse stays behind its barrier (one parse per row, " +
      "not one per pushed-down field reference)") {
    // Regression net for the r8 p-family finding: predicate pushdown
    // substitutes error_type with its defining expression, splicing the
    // whole from_json(raw) parse into the pushed filter once per field
    // reference (23 copies, measured) and below the repartition. The
    // barrier in Ingest.pipeline keeps the parse on the checkpointed
    // side, so the branch plans must contain NO from_json at all.
    import graft.operators.Ingest
    Seq("valid" -> Ingest.valid(Ingest.pipeline(spark, sfDir)),
        "invalid" -> Ingest.invalid(Ingest.pipeline(spark, sfDir)))
      .foreach { case (branch, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("from_json"),
          s"$branch() re-inlined the ingest parse — the barrier in " +
            "Ingest.pipeline was removed or bypassed")
      }
  }

  test("no lazily-planned query contains a CartesianProduct") {
    val offenders = lazyQueries.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product planned in: ${offenders.mkString(", ")}")
  }

  test("BroadcastNestedLoopJoin appears only where its input is bounded by construction") {
    val offenders = lazyQueries.filterNot(bnljBounded).flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded BroadcastNestedLoopJoin planned in: ${offenders.mkString(", ")}")
  }

  /** The exhaustive list of queries allowed to plan a
    * BroadcastNestedLoopJoin — the shape of a non-equi or free join,
    * whose cost grows with the PRODUCT of its inputs. Allowed only
    * where one side is bounded by construction, so the product is
    * linear (singleton/model broadcast) or constant (fixed panel) in
    * corpus size:
    *  - singleton-aggregate broadcasts (one row meets each probe row):
    *    o04's set-op count frames, l26's index/batch count frames,
    *    l33's 1-row min-share frame, l18's corpus-count × probe-count
    *    1-row frames, l42's 1-row budget-totals frame, l43's 1-row
    *    corpus-stats (df/avgdl) frame, l46's 1-row language-totals
    *    frame, l48's 1-row min-class-count frame
    *  - w11/w15: the hour spine explodes from a 1-row bounds aggregate
    *    and crosses a ≤|event types| dim — both sides bounded models
    *  - model-row broadcasts: l09's single query vector, k05's
    *    48-row salted dim build (16 salts × 3 literal flags), l36/l37's
    *    PQ codebook (a singleton collect_list row) and |Q|-row LUT
    *    frame, l39's |Q| × 16-centroid probe ranking
    *  - l10: the all-pairs embedding baseline over a FIXED
    *    `LlmOps.allPairsPanel`-id panel (`vec_id < 2000` pushed to the
    *    scan; vec_id unique ⇒ hard row bound) — O(panel²) forever,
    *    regardless of corpus scale. The corpus-scale near-dup paths are
    *    the banded/bucketed l07/l08/l11.
    * A name NOT on this list planning a BNLJ means a join predicate was
    * dropped or a broadcast defeated — the silent scale-killer this
    * audit exists to catch. (Names here that STOP planning a BNLJ are
    * fine — the list is an upper bound, not an expectation.) */
  private lazy val bnljBounded: Set[String] = Set(
    "o04_set_ops", "l26_incremental_dedup", "l33_temperature_sample",
    "l42_domain_mixing", "l43_bm25_topk", "l46_source_drift",
    "l48_class_balance", "l50_chunk_retrieval",
    "l09_cosine_topk", "l18_decontamination", "k05_salted_join",
    "l36_pq_index", "l37_pq_search", "l38_ivfpq_search",
    "l39_hard_negatives", "l52_ann_recall", "w11_gapfill",
    "w15_interpolate", "w16_seasonal_naive", "l10_embedding_neardup",
    "l71_retrieval_quality", // 4-row literal probe panel
    "l72_matryoshka_audit",  // 10-probe x 4-dim literal panels
    "o07_keyset_pagination", // 1-row cursor broadcast
    "l74_hybrid_rrf",        // 4-anchor more-like-this panel broadcast
    "l75_source_overlap",    // |sources|-row aggregated pair frame
    "l82_sq_error",          // 1-row amax broadcast
    "l87_binary_rerank",     // 4-probe signature panel broadcast
    "l89_collocation_lift",  // 1-row bigram-total broadcast
    "x21_pseudonymize",      // 1-row collision-summary broadcast
    "t12_sketch_merge",      // 1-row mismatch-count broadcast
    "q35_dormant_customers", // 1-row balance-average broadcast
    "w21_histogram_quantiles", // 3-row quantile panel × 32-bin summary
    "l93_label_agreement",   // two singleton aggregates crossed
    "l94_perceptual_dedup",  // two singleton aggregates crossed
    "l96_bradley_terry",     // 120-doc preference panel self-join
    "l97_ks_drift",          // sources × distinct-length grid + 1-row total
    "l104_ndcg")             // l71's 4-row literal probe panel, reused
}
