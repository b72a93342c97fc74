"""Registry-wide physical-plan audit core — the whitelists and the
scanner shared by the pytest gate (tests/test_plan_audit.py) and the
driver-visible artifact generator (tools/plan_report.py → PLANS.md).

EVERY registered query's executed plan is checked for the three
shapes that cannot survive a 100× scale-up — CartesianProduct (never
allowed), and Exchange SinglePartition / BroadcastNestedLoopJoin
(allowed only for queries on the audited whitelists below, where the
single partition or nested-loop side is BOUNDED BY CONSTRUCTION: a
≤1-row scalar aggregate, a literal-bounded table (bins / top-k
candidates / bucket summaries), or an explicit broadcast cross join
against a dimension).  A new query drifting into these shapes fails
the pytest gate AND tools/plan_report.py (exit 1), and must be either
re-planned or explicitly audited onto the list."""

from __future__ import annotations

import hashlib

# Queries whose plan contains Exchange SinglePartition — every entry
# is a ≤1-row reduction (global scalar state: totals, min/max, corpus
# averages) or a literal-bounded table (≤bins sketch rows, ≤100
# fusion candidates, per-bucket summaries, the 64-row PCA vector).
SINGLE_PARTITION_OK = {
    # ---- round-9 wave batch 8: bounded-grid windows / 1-row folds
    "mood_median_test_orders",        # cumulative window over the
    # quantized-cents value domain (the CvM audited shape) for the
    # pooled median + the 1-row (ta, n) fold over the k=5 cells
    "bartlett_variance_orders",       # 1-row log-moment fold from the
    # k=5 priority cells
    "energy_distance_drift_orders",   # cumulative window over the
    # quantized-cents grid (the Wasserstein audited shape) + 1-row fold
    "goodman_kruskal_gamma_orders",   # 1-row C/D fold from the
    # 5×4 contingency grid pair sweep
    "kendalls_w_dow_weeks_events",    # 1-row ΣT tie fold + 1-row W
    # fold over the ≤7-row rank-sum grid (the Friedman audited shape)
    "fleiss_kappa_quality_docs",      # 1-row P̄/P̄e fold
    "lin_ccc_quality_docs",           # 1-row cross-moment fold
    "icc_design_effect_events",       # 1-row ANOVA moment fold over
    # the per-user cells
    "breusch_pagan_daily_events",     # final orderBy on the ≤|types|
    # report rows (the durbin_watson audited shape)
    "chow_break_daily_events",        # final orderBy on the ≤|types|
    # report rows
    "newey_west_daily_events",        # final orderBy on the ≤|types|
    # report rows
    "ar2_yule_walker_daily_events",   # final orderBy on the ≤|types|
    # report rows
    "mcc_threshold_quality_docs",     # 1-row 4-cell confusion fold
    "srm_check_events",               # 1-row 2-arm χ² fold
    "dp_noisy_counts_events",         # final orderBy on the ≤|types|
    # report rows
    "hedges_g_quantity_returnflag",   # 1-row pooled-moment fold from
    # the 2 flag cells
    "hapax_richness_docs",            # final orderBy on the ≤|sources|
    # report rows
    "rich_club_suppliers",            # final orderBy on the 3 k rows
    "atkinson_index_users_events",    # 1-row moment fold over the
    # per-user totals
    "quade_test_dow_weeks_events",    # ≤|weeks|-row range-rank window
    # (the Friedman audited shape) + 1-row A/B folds
    "hopkins_statistic_embeddings",   # two 1-row Σu/Σw folds (each
    # from a 24-probe min-distance group)
    "mahalanobis_diag_outliers_embeddings",  # TakeOrdered top-10 on
    # the rounded score (the cosine_topk rank-key shape)
    "anderson_darling_two_sample_orders",  # cumulative window over
    # the quantized-cents grid (the CvM audited shape) + 1-row fold
    "cochran_q_funnel_events",        # 1-row Q fold from per-user
    # binary cells
    "partial_corr_daily_events",      # 1-row cross-moment fold over
    # the bounded daily grid
    "pettitt_changepoint_daily_events",  # final orderBy on the
    # ≤|types| report rows (ranks/U windows are type-partitioned)
    "twonn_intrinsic_dim_embeddings",  # 1-row MLE fold from the
    # 24-probe μ frame (NN ranks are pid-partitioned)
    "brunner_munzel_orders",          # cumulative windows over the
    # quantized-cents grid (the CvM audited shape) + 1-row folds
    "dunn_posthoc_priority_orders",   # cents-grid rank window + the
    # k²-bounded pair sweep report
    "dickey_fuller_daily_events",     # final orderBy on the ≤|types|
    # report rows
    "effective_rank_embeddings",      # 1-row trace fold from the
    # 2080-cell dimension-bounded covariance grid
    "seasonal_mann_kendall_events",   # final orderBy on the ≤|types|
    # report rows (the mann_kendall audited shape)
    "variance_ratio_daily_events",    # final orderBy on the ≤|types|
    # report rows
    "cucconi_location_scale_orders",  # cumulative window over the
    # quantized-cents grid (the CvM audited shape) + 1-row folds
    "hodges_lehmann_shift_lineitem",  # cumulative window over the
    # ≤99-value difference grid + 1-row weighted-median fold
    "weighted_kappa_quality_docs",    # 1-row p_o/p_e folds from the
    # 4×4 contingency grid
    "semdedup_yield_curve_embeddings",  # final orderBy on the 3 τ
    # report rows
    "gehan_wilcoxon_repurchase_events",  # reverse-cumulative window
    # over the dense (life × 2 groups) risk grid (the logrank audited
    # shape) + 1-row fold
    "theils_u_lang_source_docs",      # 1-row entropy folds from the
    # (lang × source) contingency grid
    "bowley_moors_shape_orders",      # final orderBy on the k=5
    # report rows (octiles from per-group cents-grid windows)
    "cohort_halflife_events",         # final orderBy on the ≤|weeks|
    # cohort report rows
    # ---- round-9 wave: bounded-grid windows / 1-row scalar folds
    "welch_anova_priority_orders",    # 1-row Σw/Σwm fold from the
    # k=5 priority cells + the final 1-row W* fold
    "dagostino_k2_totalprice",        # 1-row raw-moment fold; the Z
    # transforms are scalar math on that row
    "cochran_armitage_priority_returns",  # 1-row score-moment fold
    # from the k=5 cells
    "mantel_haenszel_weekend_purchase_events",  # 1-row MH fold from
    # the ≤|weeks| stratum cells
    "jonckheere_priority_totalprice_orders",  # 1-row JT/moment folds;
    # the two cumulative windows are (value-grid × 5)-bounded and
    # partitioned by v / by score
    "friedman_dow_weeks_events",      # 1-row A1/ΣR² folds from the
    # ≤(weeks×7) rank grid; midranks windowed per 7-row block
    "yuen_trimmed_ttest_orders",      # per-group cumulative window
    # over the quantized-cents price domain (the CvM audited shape)
    # + the final 2-group pivot fold
    "lorenz_curve_customers",         # cumulative window over the
    # whole-dollar customer-total grid + 1-row totals fold
    "holm_bonferroni_dow_events",     # ranked/running-max windows over
    # the m = |types|·7 p-value grid (the fdr_bh audited shape)
    "davies_bouldin_embeddings",      # k=10 centroid/scatter folds;
    # the k² pair sweep and the 1-row DB mean are label-bounded
    "calinski_harabasz_embeddings",   # 1-row W/B moment folds from
    # the k=10 label cells
    "term_burstiness_docs",           # TakeOrdered top-20 terms + the
    # 1-row corpus doc-count fold
    "logrank_weekend_repurchase_events",  # reverse-cumulative window
    # over the (≤day-span × 2 groups) dense risk grid + 1-row fold
    "pages_trend_dow_weeks_events",   # 1-row L fold from the
    # ≤(weeks×7) midrank grid (the Friedman audited shape)
    "wasserstein_drift_orders",       # cumulative window over the
    # quantized-cents grid (the CvM audited shape) + 1-row fold
    "rmst_repurchase_events",         # KM survival windows over the
    # ≤day-span death grid + 1-row step-integral fold
    "gesd_outliers_totalprice",       # three 1-row moment folds +
    # struct-max argmaxes (r = 3 bounded rounds by design)
    # ---- round-8 wave: bounded-grid windows / 1-row scalar folds
    "g_test_dow_events",              # marginal windows run over the
    # r×c contingency grid (≤ |types|·7 rows after the hash agg)
    "brown_forsythe_orders",          # 1-row global moment fold from
    # the k=5 group cells
    "tukey_hsd_priority_orders",      # 1-row MSW scalar broadcast over
    # the k² pair sweep of the 5-row cell frame
    "sprt_purchase_rate_events",      # ordered cumulation over the
    # bounded daily series (≤366 rows after the day agg)
    "ewma_control_chart_events",      # per-type recursion on the
    # bounded daily array; final orderBy only
    "kruskal_wallis_dow_value_events",  # final orderBy on the ≤|types|
    # report rows (ranks come from the quantized-histogram window,
    # partitioned by type)
    "page_hinkley_daily_events",      # final orderBy on the bounded
    # per-(type, day) report
    "ks_separation_quality_docs",     # cumulative window over the
    # LITERAL 1001-bucket score grid (the AUC-family audited shape)
    "pq_distortion_embeddings",       # four 1-row per-subspace moment
    # folds (agg, not rank windows) unioned into the m-row report
    "rp_distance_preservation_embeddings",  # 1-row ratio-summary fold
    # over the literal 1225-pair anchor sweep
    "pps_sampling_ht_orders",         # 1-row corpus-total fold + the
    # 1-row HT summary
    "mcnemar_paired_quality_docs",    # 1-row 4-cell fold
    "cvm_two_sample_orders",          # cumulative window over the
    # quantized-cents value domain (bounded grid) + 1-row fold
    "cliffs_delta_quantity_returnflag",  # cumulative window over the
    # ≤50-value quantity domain + 1-row U fold
    "theil_inequality_users_events",  # 1-row corpus totals + 1-row
    # decomposition fold over the ≤|event-types| group rows
    "fightin_words_lang_docs",        # 1-row vocab-size/corpus-total
    # fold (the only global step; the z grid is (lang, word)-keyed)
    "anova_two_way_interaction_events",  # 1-row grand/marginal moment
    # folds from the a×b cell grid
    "textrank_keywords_docs",         # 1-row node-count fold; ranking
    # runs on the literal ≤30-word vocabulary grid
    "hhi_concentration_customers",    # 1-row total + 1-row top-4 fold
    # ---- round-7 wave 6: bounded pivots
    "qte_quantile_lift_events",       # 2-row arm quantile frame
    # pivoted to the literal 4-row QTE report
    # ---- round-7 wave 5: 1-row scalar folds / literal-101-row folds
    "gumbel_tail_events",             # ≤366-row daily-max moment fold
    # → 1-row fit
    "poisson_surprise_events",        # 1-row day-count scalar
    "hill_tail_index_orders",         # the log fold runs on the
    # literal 101-row top-k frame + its 1-row threshold broadcast
    # ---- round-7 wave 4: 1-row scalar folds
    "james_stein_user_shrinkage_events",  # 1-row pooled-moment state
    # (m, s2w, tau2) folded back as a broadcast cross join
    "delta_method_ratio_metric_events",  # 2-row arm fold + the 1-row
    # z report
    "mde_power_events",               # 2-row arm fold + 1-row report
    # ---- round-7 wave 3: bounded daily-grid windows / 1-row scalars
    "group_sequential_monitor_events",  # cumulative-moment windows
    # over the ≤observation-days grid (the xcorr/isotonic audited
    # shape); events contribute only day-level moment deltas
    "runs_test_daily_events",         # LAG over the bounded daily
    # grid + the 1-row median broadcast + 1-row closing counts
    "negbin_overdispersion_events",   # 1-row day-count scalar
    "laspeyres_price_index_lineitem",  # 1-row base-year + 1-row
    # basket-denominator broadcasts; the basket join is part-keyed
    # ---- round-7 wave 2: 1-row scalar folds / bounded-grid windows
    "brier_decomposition_quality_docs",  # 1-row totals + the final
    # fold over the LITERAL 10-bucket calibration table (the eval
    # suite's audited bounded-sweep shape)
    "nelson_aalen_hazard_events",     # ≤366-bucket gap histogram:
    # at-risk reverse cumsum + hazard forward cumsum on the bounded
    # lifetime grid, plus the 1-row max-date broadcast (the
    # kaplan_meier audited shape)
    "hits_authority_suppliers",       # 1-row L1 normalizer — the two
    # power-iteration rounds themselves are key-partitioned join+agg
    "fano_factor_users_events",       # 1-row observation-window
    # day-count scalar broadcast
    "did_lift_events",                # 1-row date-bounds scalar + the
    # single-row conditional-aggregate result
    # ---- round-7 wave: 1-row scalar folds / literal-grid reductions
    "cramers_v_lang_source_docs",     # 1-row n/r/c totals + the 1-row
    # chi-square fold over the langs×sources bounded grid
    "hellinger_lang_by_source_docs",  # 1-row corpus-count scalar
    "granger_lag1_events",            # 1-row 10-moment fold over the
    # bounded daily frame — everything after is scalar algebra
    "entropy_rate_transitions_events",  # 1-row totals over the
    # |states|²-bounded transition grid
    "kendall_tau_chars_score_docs",   # 1-row C/D reduction + 1-row
    # tie-term folds — the dominance windows themselves partition by
    # the literal 64/63 bin keys, never single-partition
    "neyman_allocation_orders",       # 1-row allocation denominator
    "t_closeness_report_orders",      # 1-row corpus count + 1-row
    # TV report fold over the dimension-bounded group grid
    "best_split_gini_docs",           # cumulative window over the
    # LITERAL 1001-bucket score grid + 1-row totals (the best-F1
    # gate's audited shape with a Gini objective)
    # ---- round-6 wave: bounded global-scalar / tiny-grid plans
    "kaplan_meier_retention_events",  # ≤366-bucket gap histogram:
    # global reverse-cumsum + survival windows run on the bounded
    # lifetime grid, plus the 1-row max-date broadcast
    "cuped_adjusted_lift_events",     # 1-row theta/moment state
    # folded back as a broadcast cross join
    "fdr_bh_dow_value_events",        # BH step-up runs on the 35-row
    # (type × dow) test grid — bounded by the grid, not data
    "modularity_lpa_part_supplier",   # 1-row edge-count m broadcast
    "mutual_info_lang_source_docs",   # all-rows MI window over the
    # langs×sources grid (bounded by cardinality product)
    "naive_bayes_langid_docs",        # 1-row vocab/train-count state
    "xcorr_leadlag_events",           # daily two-series frame (≤366
    # rows): global row_number + the 1-row moments broadcast
    "isotonic_calibration_events",    # cumsum window over the 12-bin
    # calibration table + 1-row min/max range broadcast — bounded by
    # the literal bin count, never data volume
    "roc_auc_quality_docs",           # cumulative windows over the
    # LITERAL 1001-bucket score grid (clip-binned sweep) + 1-row agg
    "average_precision_quality_docs", # same literal-bounded grid
    "best_f1_threshold_quality_docs", # same literal-bounded grid
    "decile_lift_quality_docs",       # 1-row count/base-rate scalar
    # state only — the rank itself is the distributed two-level
    # exact_global_rank construction (VERDICT r6 #6 swap landed r7)
    "spearman_chars_score_docs",      # value-domain cumsum windows
    # (n_chars domain + the 1001-bin grid — the Mann-Whitney rule)
    # plus the 1-row moment fold
    "degree_assortativity_part_supplier",  # 1-row moment fold (the
    # edge⋈degree join itself is distributed; only the 6-scalar
    # reduction is single-partition)
    "agg_lineitem_stats",        # 1-row global aggregate result
    "benford_digits_totalprice", # 1-row total for the share divide
    "bloom_prefilter_docs",      # packed filter → 1-row broadcast map
    "bm25_score_docs",           # corpus N/avg-len scalar state
    "calibration_ece_docs",      # 1-row ECE normalizer folded over
    # the 10-bin reliability table (bin count is a literal)
    "cms_token_counts_docs",     # packed sketch → 1-row broadcast map
    "dsir_scores_docs",          # 1-row model constants (corpus/target
    # totals + vocab size) folded in as a broadcast cross join — the
    # round-4 single-lazy-plan rewrite of dsir_importance
    "association_rules_lineitem",  # 1-row basket-count scalar state
    # (countDistinct) folded back as a broadcast cross join
    "bootstrap_ci_orders",       # rank window + order-statistic fold
    # over the 64-row replicate-means table (B is a literal)
    "funnel_time_to_convert",    # 1-row percentile/mean fold over
    # the per-user conversion deltas
    "funnel_view_click_purchase",# 1-row funnel-stage counts
    "hybrid_retrieval_pipeline", # rank windows over two ≤100-row
    # top-k tables + the 20-candidate fusion/MMR (rrf_fusion shape)
    "hll_distinct_tokens_docs",  # final fold over the 256-register
    # frame — the sketch size, a literal, bounds the single partition
    "interval_join_events_windows",  # literal-bounded window table
    "ks_drift_orders",           # cumulative walk + sup fold over
    # the literal 32-bin grid (the sketch_quantiles shape)
    "jsd_sources_docs",          # 1-row vocab-size scalar state
    # (countDistinct) folded onto the bounded pair grid
    "join_size_estimate_cms",    # 1-row min over the d=4 per-row
    # inner products of two ≤d·w-cell sketches + 1-row true count
    "mannwhitney_quantity_returnflag",  # cumulative walk + final fold
    # over the ≤50-row (quantity, counts) table — the integer value
    # domain, not the corpus, bounds the single partition
    "outliers_totalprice",       # 1-row mean/stddev state
    "pack_sequences_512",        # per-bucket summaries (corpus/10k)
    "pca_outliers_embeddings",   # 1-row stddev scalar state
    # (registry.py pca_outliers_q: proj.agg(stddev_samp) is a global
    # ≤1-row reduction broadcast back onto the projection — the same
    # bounded class as outliers_totalprice)
    "pca_top_component_embeddings",  # 1-row norm reduction
    "profile_orders",            # 1-row wide profile before unpivot
    "q11_part_value_share",      # 1-row global value total
    "q14_promo_revenue",         # 1-row result
    "q15_top_supplier",          # 1-row max-revenue scalar
    "q17_small_quantity_revenue",# 1-row result
    "q19_disjunctive_revenue",   # 1-row result
    "q22_dormant_customers",     # 1-row avg-balance scalar
    "q6_forecast_revenue",       # 1-row result
    "quality_checks_orders",     # 1-row constraint report base
    "rbo_lsh_vs_exact",          # rank windows over two 10-row top-k
    # tables + the 10-depth fold — k, a literal, bounds everything
    "revenue_share_of_parent",   # windows over the 25-row hierarchy
    "rrf_fusion_docs",           # rank windows over ≤100 candidates
    "sketch_quantiles_totalprice",  # cumulative walk over ≤64 bins
    "skew_stats_lineitem_suppkey",  # 1-row skew summary state
    "table_checksum_orders",     # 1-row checksum fold
    "zorder_value_orders",       # 1-row min/max range state
    "attribution_path_removal_events",  # two 1-row scalar totals
    # (converting-journey count, credit sum) broadcast back onto the
    # 4-channel report
    "gini_user_activity_events",  # 1-row Gini summary state (the
    # rank itself is the distributed two-level construction)
    "expectations_report_tpch",  # six 1-row violation-count reports
    # unioned — each a global aggregate over a predicate filter
    "tfidf_cosine_pairs_docs",   # 1-row corpus-count scalar (n_docs)
    # broadcast into the idf weights
    "cohens_kappa_quality_docs", # 1-row 2x2 agreement-matrix fold
    "k_anonymity_report_orders", # 1-row privacy report fold over the
    # bounded quasi-identifier group frame
    "heaps_law_fit_docs",        # 1-row OLS fold over the literal
    # 10-checkpoint log-log frame (plus the 1-row n_docs scalar)
    "vocab_coverage_curve_docs", # rank window + totals over the TYPE
    # table — vocab-bounded, not corpus-bounded (the Mann-Whitney
    # design rule)
    "rtbf_cascade_report",       # three 1-row per-table count reports
    # (before/deleted) unioned — each a global aggregate
    # ---- round-10 wave: bounded grids / 1-row folds
    "somers_d_priority_price_orders",  # 1-row C/D fold from the ≤5×6
    # ordinal grid pair sweep (the goodman_kruskal audited shape)
    "gk_lambda_lang_source_docs",     # 1-row λ folds from the
    # |langs|×|sources| contingency grid (the theils_u audited shape)
    "cronbach_alpha_event_types",     # 1-row item/total variance
    # folds from per-type and per-user exact cells (the icc shape)
    "cuped_arm_lift_events",          # 1-row θ moment fold + 2-row
    # arm fold (the srm/icc audited shapes)
    "benford_first_digit_orders",     # 9-row literal digit grid +
    # 1-row total fold
    "alignment_uniformity_embeddings",  # 24-probe LIMIT + 276-pair
    # bounded folds (the hopkins/twonn probe convention)
    "harrell_c_repurchase_events",    # reverse-cumulative window over
    # the dense (life × 2 groups) risk grid + 1-row pair-count fold
    # (the gehan/logrank audited shape)
    "ansari_bradley_scale_orders",    # cumulative window over the
    # quantized-cents grid (the CvM audited shape) + 1-row AB fold
    "bradley_terry_event_types",      # MM iterations + final report
    # on the |types|²-bounded comparison grid (1-row norm fold)
    "rbo_bm25_vs_classifier_docs",    # two TakeOrdered top-20s →
    # ≤20-row rank windows + 1-row RBO fold
    "ipf_raking_dow_type_events",     # IPF half-step window rescales
    # + report on the ≤7×|types| grid
    "cohens_h_weekend_purchase_events",  # 1-row fold from the 2
    # weekend cells (the hedges_g audited shape)
    "meta_analysis_sources_docs",     # 1-row inverse-variance fold
    # over the ≤|sources| study frame
    "actuarial_life_table_events",    # cumulative/reverse-cumulative
    # windows on the bounded weekly-interval grid (the KM shape)
    "winsorized_corr_lineitem",       # 1-row percentile-cut fold +
    # 1-row moment fold (the winsorized_mean audited shape)
    # ---- round-11 wave: bounded grids / 1-row folds
    "kendall_w_dow_events",           # 7-row rank-sum grid + 1-row
    # 4·Σdev² fold (the kendalls_w audited shape)
    "pages_l_trend_dow_events",       # 1-row L fold from the ≤(weeks×7)
    # rank grid (the pages_trend audited shape)
    "buishand_range_daily_events",    # cumulative window over the
    # bounded DAY grid + 1-row moment fold (the pettitt/dickey_fuller
    # audited shape)
    "chapman_population_users_events",  # 1-row (n1, n2, m) fold from
    # the per-user capture flags
    "bowker_symmetry_priority_orders",  # 1-row χ²/df folds from the
    # densified ≤5×5 transition grid
    "shewhart_xbar_r_weekly_events",  # 1-row (X̿, R̄, k) center-line
    # fold over the ≤weeks subgroup frame
    "seq_trigram_patterns_events",    # top-10 rank window + 1-row
    # total fold over the ≤|types|³ pattern grid
    "tail_dependence_lineitem",       # cumulative windows over the
    # quantized-cents / integer-quantity VALUE grids (the
    # mannwhitney audited shape) + 1-row threshold/total folds
    "beta_moments_purchase_users",    # 1-row moment fold over the
    # per-user rate frame (the atkinson audited shape)
    # ---- round-11 wave C
    "fisher_price_index_lineitem",    # 1-row base-year scalar fold
    # (the laspeyres audited shape); the basket join is distributed
    "sample_entropy_daily_events",    # 1-row global max-day fold; the
    # pair grid is per-type windows bounded at ≤365 templates
    "breslow_day_weekend_purchase_events",  # 1-row pooled-ψ fold +
    # 1-row BD/Tarone folds over the ≤weeks strata frame (MH shape)
    "kuiper_drift_orders",            # cumulative walk + sup folds
    # over the literal 32-bin grid (the ks_drift audited shape)
    "err_bm25_graded_docs",           # cumulative walk over the
    # quantized classifier score VALUE grid (mannwhitney rule) +
    # rank/product windows on the 20-row post-limit frame
    "l_diversity_report_orders",      # 1-row min/frac fold over the
    # (priority × month) bounded group frame
    "cka_linear_embeddings",          # 1-row block-Frobenius folds
    # over the 64²-cell covariance frame (the pca audited shape)
    "self_bleu_sample_docs",          # 1-row (m, Σlen) corpus-length
    # fold + 1-row final averages; gram joins are distributed
    "zero_inflation_purchase_events", # 1-row 4-integer moment fold
    "lorenz_asymmetry_customers",     # 1-row mean/total fold + 1-row
    # boundary-statistic fold over the customer frame
    # ---- round-11 wave D
    "krippendorff_alpha_quality_docs",  # 1-row 5-scalar coincidence
    # fold (the fleiss_kappa audited shape)
    "gwet_ac1_quality_docs",          # 1-row 4-integer agreement fold
    "bland_altman_tokenizers_docs",   # 1-row (μ, SD) fold + 1-row
    # coverage fold, both broadcast back
    "fisher_g_periodicity_events",    # 1-row global max-day fold; the
    # periodogram grid is per-type windows bounded at ≤365×182 cells
    "participation_ratio_embeddings", # 1-row trace/Frobenius fold
    # over the 64²-cell covariance frame (the pca audited shape)
    "biweight_midvariance_totalprice",  # 1-row exact-percentile state
    # (median, MAD) + the 1-row weighted fold (the mad audited shape)
    "blomqvist_beta_lineitem",        # 1-row two-median state + the
    # 1-row 4-cell quadrant fold
    "ad_exponential_interarrivals_events",  # cumulative walk over the
    # integer-seconds gap VALUE grid (the mannwhitney rule) + 1-row
    # (n, Σx) fold
    # ---- round-11 wave E
    "cohort_ltv_curve_events",        # 1-row max-week fold; the age
    # fan-out is the 8-row literal grid, cum windows are per-user
    "sign_flip_test_weekend_events",  # 1-row T_obs fold + the final
    # fold over the 64-row literal flip grid
    "gk_tau_lang_source_docs",        # 1-row Gini-variation folds
    # over the bounded |source|×|lang| grid
    "dunn_index_labels_embeddings",   # 1-row min/max folds over the
    # k-row diameter and k² centroid-pair frames
    # ---- round-11 wave F
    "wilcoxon_signed_rank_weekend_events",  # global rank window over
    # the (types × weeks) calendar-bounded pair grid + 1-row W+/tie
    # folds (the sign_flip/kendalls_w audited shape)
    "conover_squared_ranks_orders",   # cumulative window over the
    # quantized |cents − μ_g| deviation grid (the ansari_bradley CvM
    # audited shape) + 1-row moment fold
    "engle_granger_click_purchase_events",  # global LAG window over
    # the calendar-bounded daily grid + two 1-row moment folds (the
    # dickey_fuller/buishand audited shape)
    "hosmer_lemeshow_quality_docs",   # 1-row percentile-cut fold (the
    # winsorized_corr shape) + 1-row χ² fold over the 10-bin grid
    # ---- round-11 wave G
    "aalen_johansen_competing_events",  # reverse/forward cumulative
    # windows over the ≤31-row life grid (the kaplan_meier/actuarial
    # audited shape) + 1-row maxd bound
    "simpson_reversal_events",        # 1-row pooled-slope fold over
    # the calendar-bounded daily grid + |types|-row strata fold (the
    # dickey_fuller audited shape)
    "tornqvist_price_index_lineitem", # 1-row base-year fold broadcast
    # over the (part, yr) cells (the fisher_price audited shape)
    # ---- round-11 wave H
    "variance_homogeneity_screen_orders",  # rank windows + final fold
    # over the k=5 priority variance cells (bounded by the group key)
    "benjamini_yekutieli_dow_events",  # ranked/running-min windows
    # over the 35-cell dow test grid (the fdr_bh audited shape)
    "embedding_norm_audit",           # 1-row percentile/extreme fold
    # (the winsorized/biweight percentile-state audited shape)
}

# Queries whose plan contains BroadcastNestedLoopJoin — every entry
# is a 1-row (or literal dimension) broadcast cross join: scalar
# state fanned back onto rows, or the explicit region×nation cross.
BNLJ_OK = {
    # ---- round-9 wave batch 8: broadcast scalar/tiny-frame joins
    "mood_median_test_orders",        # 1-row N total + 1-row median
    # crossJoins onto the cents grid / obs stream + 1-row (ta, n)
    # totals crossJoin onto the k=5 cells
    "energy_distance_drift_orders",   # 1-row (n1, n2) totals crossJoin
    # onto the cents grid
    "goodman_kruskal_gamma_orders",   # 5×4-cell broadcast inequality
    # pair join (the tukey_hsd audited shape)
    "kendalls_w_dow_weeks_events",    # 1-row b-count + 1-row tie-sum
    # crossJoins onto the 7-row rank-sum grid
    "srm_check_events",               # 1-row user-total crossJoin
    # onto the 2 arm cells
    "rich_club_suppliers",            # 3-row broadcast k-threshold
    # frame inequality-joined onto degrees/edges (bounded by 3×)
    "quade_test_dow_weeks_events",    # 1-row B-fold crossJoin onto
    # the 1-row A-fold
    "hopkins_statistic_embeddings",   # 24-row synthetic/real probe
    # frames broadcast against one corpus scan each (the
    # knn_label_accuracy audited shape) + the 1-row H fold
    "anderson_darling_two_sample_orders",  # 1-row (n1, n2, n) totals
    # crossJoin onto the cents grid
    "twonn_intrinsic_dim_embeddings",  # 24-row probe frame broadcast
    # against one corpus scan (the knn_label_accuracy audited shape)
    "brunner_munzel_orders",          # 1-row totals/means crossJoins
    # onto the cents grid
    "dunn_posthoc_priority_orders",   # 5-row cell frame inequality
    # pair join + 1-row totals crossJoin (the tukey_hsd shape)
    "effective_rank_embeddings",      # 1-row n + 64-row μ broadcasts
    # onto the dimension-bounded covariance grid
    "cucconi_location_scale_orders",  # 1-row totals crossJoin onto
    # the cents grid
    "hodges_lehmann_shift_lineitem",  # ≤50-row × ≤50-row quantity
    # grid crossJoin (the convolution) + 1-row weight total
    "weighted_kappa_quality_docs",    # 4-row marginal / 1-row total
    # broadcasts onto the bounded grid
    "semdedup_yield_curve_embeddings",  # 3-row τ broadcast inequality
    # join onto the LSH pair frame + 1-row corpus total
    "gehan_wilcoxon_repurchase_events",  # 1-row max-day bound + the
    # broadcast 2-row group frame onto the life grid (logrank shape)
    "theils_u_lang_source_docs",      # 1-row corpus-total and
    # entropy-fold crossJoins onto the bounded contingency grid
    # ---- round-9 wave: broadcast scalar/tiny-frame crossJoins
    "welch_anova_priority_orders",    # 1-row Σw totals crossJoin onto
    # the k=5 weighted cells
    "jonckheere_priority_totalprice_orders",  # broadcast 5-row literal
    # score frame onto the value grid + two 1-row moment crossJoins
    "friedman_dow_weeks_events",      # 1-row ΣR² crossJoin onto the
    # 1-row A1 fold
    "lorenz_curve_customers",         # broadcast 10-row decile-
    # threshold frame probed against the cumulative grid (inequality
    # join bounded by 10 × grid)
    "holm_bonferroni_dow_events",     # 1-row grand-moment crossJoin
    # onto the |types|·7 cell grid (the fdr_bh audited shape)
    "davies_bouldin_embeddings",      # k×k centroid pair sweep +
    # 1-row DB-mean crossJoin (k = 10 labels)
    "calinski_harabasz_embeddings",   # 1-row global-centroid fold
    # crossJoined onto the k=10 cells
    "term_burstiness_docs",           # 1-row corpus doc-count
    # crossJoin onto the top-20 term rows
    "logrank_weekend_repurchase_events",  # 1-row max-day bound + the
    # broadcast 2-row group frame onto the life grid
    "gesd_outliers_totalprice",       # three 1-row moment crossJoins
    # onto the shrinking remaining set
    "wasserstein_drift_orders",       # 1-row (n1, n2) totals crossJoin
    # onto the cents grid
    "rmst_repurchase_events",         # 1-row max-day bound + 1-row
    # gap-count crossJoins
    # ---- round-8 wave: 1-row scalar broadcasts / k-row pair sweeps
    "tukey_hsd_priority_orders",      # 1-row MSW crossJoin + the
    # 5-row×5-row inequality pair join (both broadcast literals)
    "rp_distance_preservation_embeddings",  # 50-row anchor-set
    # inequality pair join (1225 pairs, bounded by the literal id cap)
    "pps_sampling_ht_orders",         # 1-row corpus-total crossJoin
    "burrows_delta_sources_docs",     # |sources|×20-word literal grid
    # crossJoin (the rate grid both z-scores and pairs read)
    "theil_inequality_users_events",  # 1-row totals crossJoin onto
    # the ≤|event-types| group rows
    "fightin_words_lang_docs",        # 1-row vocab-totals crossJoin
    # onto the (lang, word) grid
    "anova_two_way_interaction_events",  # 1-row marginal-fold
    # crossJoins onto the 1-row totals
    "textrank_keywords_docs",         # 1-row node-count crossJoin per
    # damped round over the ≤30-node grid
    "hhi_concentration_customers",    # 1-row total + 1-row top-4
    # crossJoins onto the per-customer frame
    # ---- round-7 wave 5: 1-row scalar broadcasts
    "poisson_surprise_events",        # 1-row day-count crossJoin
    "hill_tail_index_orders",         # 1-row threshold crossJoin onto
    # the literal 101-row top-k frame
    # ---- round-7 wave 4: 1-row scalar broadcasts
    "james_stein_user_shrinkage_events",  # 1-row (m, s2w, tau2)
    # crossJoin onto the per-user frame
    # ---- round-7 wave 3: 1-row scalar broadcasts
    "negbin_overdispersion_events",   # 1-row day-count crossJoin
    "laspeyres_price_index_lineitem",  # 1-row base-year pick + 1-row
    # denominator crossJoin
    "runs_test_daily_events",         # 1-row median crossJoin onto
    # the bounded daily grid
    # ---- round-7 wave 2: 1-row scalar broadcasts
    "brier_decomposition_quality_docs",  # 1-row (n, Σy) totals
    # crossJoin onto the 10-bucket calibration table
    "nelson_aalen_hazard_events",     # 1-row max-date broadcast onto
    # the purchase-gap frame (the kaplan_meier audited shape)
    "hits_authority_suppliers",       # 1-row normalizer crossJoin
    "fano_factor_users_events",       # 1-row day-count crossJoin
    "did_lift_events",                # 1-row date-bounds crossJoin
    # ---- round-7 wave: 1-row scalar / literal-dimension broadcasts
    "cramers_v_lang_source_docs",     # 1-row totals crossJoin onto
    # the dimension-bounded contingency grid
    "hellinger_lang_by_source_docs",  # 1-row corpus count crossJoin
    "hurst_rs_daily_events",          # 3-row literal window-size
    # frame × the bounded per-type daily index
    "pacf_daily_events",              # 3-row literal lag frame (the
    # acf gate's audited shape) + 1-row moment broadcast
    "entropy_rate_transitions_events",  # 1-row totals crossJoin
    "kendall_tau_chars_score_docs",   # two 1-row tie-term broadcasts
    # onto the 1-row C/D frame
    "neyman_allocation_orders",       # 1-row denominator crossJoin
    "t_closeness_report_orders",      # segments-dimension × group
    # grid cross join (chisq class) + 1-row corpus count
    "best_split_gini_docs",           # 1-row totals crossJoin
    # ---- round-6 wave: 1-row scalar broadcasts and bounded grids
    "acf_daily_events",               # 7-row lag table × daily frame
    "kaplan_meier_retention_events",  # 1-row max-date broadcast
    "cuped_adjusted_lift_events",     # 1-row bounds + theta broadcasts
    "fdr_bh_dow_value_events",        # 1-row pooled-moment broadcast
    "silhouette_labels_embeddings",   # labels-row centroid broadcast
    # (≤ label-cardinality rows against the point frame)
    "modularity_lpa_part_supplier",   # 1-row m broadcast
    "mutual_info_lang_source_docs",   # 1-row total broadcast
    "naive_bayes_langid_docs",        # 1-row vocab/train-count state
    "xcorr_leadlag_events",           # 7-row lag table + 1-row moments
    "isotonic_calibration_events",    # 1-row range broadcast + the
    # 12-bin i≤j≤k theta grid (≤ B³ = 1728 rows by the literal bin
    # count)
    "average_precision_quality_docs", # 1-row totals broadcast
    "decile_lift_quality_docs",       # 1-row base-rate broadcast
    "best_f1_threshold_quality_docs", # 1-row n1 broadcast
    "ann_recall_lsh_vs_exact",
    "benford_digits_totalprice",
    "chisq_lang_drift_by_source",  # sources × langs expected grid —
    # an explicit cross join of two dimension-bounded aggregates
    # (≤ tens of rows each); caught by this audit on first commit,
    # audited in as bounded-by-construction
    "bloom_prefilter_docs",
    "bm25_score_docs",
    "cms_token_counts_docs",
    "association_rules_lineitem",  # 1-row basket-count crossJoin
    "bootstrap_ci_orders",       # 1-row point-mean crossJoin back
    "calibration_ece_docs",      # 1-row ECE normalizer crossJoin
    "join_size_estimate_cms",    # 1-row estimate crossJoin onto the
    # 1-row true count
    "cosine_topk_many_embeddings",
    "cross_join_region_nation",
    "hybrid_retrieval_pipeline", # 20-candidate pairwise-sim grid
    "mmr_rerank_embeddings",     # pool² (≤400-row) pairwise-sim
    # inequality join of the broadcast top-20 candidate set with
    # itself — the candidate pool, a literal, bounds both sides
    "welch_ttest_orders",        # 5×5 priority-pair grid: inequality
    # self-join of the 5-row grouped aggregate, both sides bounded
    # by the dimension's cardinality
    "dsir_scores_docs",          # 1-row model-constants crossJoin
    "funnel_view_click_purchase",
    "hard_negatives_embeddings", # bounded anchor set (10 rows)
    # broadcast against the corpus with a label-inequality predicate —
    # the cosine_topk_many shape; the nested-loop side is the anchors
    "jsd_sources_docs",          # bounded source-pair grid (C(s,2))
    # broadcast against the vocab table — the pair count, a dimension
    # property, bounds the nested-loop side; amplification is
    # pairs × vocab, documented in the query
    "knn_label_accuracy_embeddings",  # bounded probe set (50 rows)
    # broadcast with a self-exclusion predicate — same shape
    "outliers_totalprice",
    "pca_outliers_embeddings",   # 1-row stddev state crossJoin back
    "pca_top_component_embeddings",
    "profile_orders",
    "psi_drift_orders",
    "q11_part_value_share",
    "q22_dormant_customers",
    "rbo_lsh_vs_exact",          # 10-row × 10-row × 10-depth grid
    "rrf_fusion_docs",
    "sketch_quantiles_totalprice",
    "skew_stats_lineitem_suppkey",
    "zorder_value_orders",
    "attribution_path_removal_events",  # the two 1-row scalar
    # totals cross-joined back onto the 4-channel report
    "tfidf_cosine_pairs_docs",  # 1-row n_docs scalar cross join
    "heaps_law_fit_docs",       # 1-row n_docs scalar cross join into
    # the 10-row checkpoint frame
    "vocab_coverage_curve_docs",  # literal 5-row k frame × the
    # vocab-bounded type table + 1-row totals
    "centroid_drift_labels_embeddings",  # labels × labels theta join
    # over the ≤|labels|-row centroid frame — dimension-bounded grid
    "rtbf_cascade_report",      # 1-row deleted-count scalar cross
    # joins onto the 1-row before-count frames
    "hll_rolling_7d_users",  # days × daily-register interval join —
    # the probe side is the ≤span-days distinct-day frame (broadcast),
    # the build side ≤ days×256 register rows; bounded by the time
    # span, never by event volume
    # ---- round-10 wave: 1-row / literal-grid broadcast cross joins
    "somers_d_priority_price_orders",  # 1-row (nt, nx, ny) totals
    # crossJoin onto the 1-row pair fold; the grid self-join's
    # inequality condition is ≤30×30 literal rows
    "gk_lambda_lang_source_docs",     # 1-row srow/scol/mcol/mrow
    # scalar folds crossJoined into the 1-row report
    "cronbach_alpha_event_types",     # 1-row n/k/itemvar/totvar
    # scalar folds crossJoined into the 1-row report
    "cuped_arm_lift_events",          # 1-row bounds + 1-row θ
    # crossJoins onto the event stream / 2-row arm fold
    "benford_first_digit_orders",     # 1-row total crossJoin onto
    # the 9-row digit grid
    "alignment_uniformity_embeddings",  # 24-row probe-norm frame
    # joins (bounded by the probe count, never the corpus)
    "harrell_c_repurchase_events",    # 1-row max-date bounds + 2-row
    # group-grid broadcast crossJoins (the gehan audited shape)
    "ansari_bradley_scale_orders",    # 1-row (n, n1, n2, m) totals +
    # 1-row ā crossJoins onto the cents grid
    "bradley_terry_event_types",      # 1-row (tot, k) norm crossJoin
    # onto the ≤|types|-row report
    "rbo_bm25_vs_classifier_docs",    # 20-row depth grid × ≤20-row
    # common-rank frame (m ≤ d inequality) + 1-row count crossJoin
    "ipf_raking_dow_type_events",     # 1-row (nt, ndow) totals
    # crossJoin onto the bounded grid (each IPF row half-step)
    "meta_analysis_sources_docs",     # 1-row pooled (k, sw, mu)
    # crossJoin onto the ≤|sources| study frame
    "actuarial_life_table_events",    # 1-row max-date bounds
    # crossJoin onto the purchase stream (the KM/gehan shape)
    "winsorized_corr_lineitem",       # 1-row percentile cuts
    # crossJoin onto lineitem (the winsorized_mean shape)
    # ---- round-11 wave: 1-row / literal-grid broadcast cross joins
    "kendall_w_dow_events",           # |types| × 7-row literal dow
    # frame cross join (grid densification — the chisq audited shape)
    "buishand_range_daily_events",    # 1-row (n, ȳ, σ) moments
    # crossJoin onto the bounded day grid
    "chapman_population_users_events",  # 1-row date-bounds crossJoin
    # onto the event stream (the did_lift/KM audited shape)
    "bowker_symmetry_priority_orders",  # 1-row date-bounds crossJoin +
    # the 5×5 priority inequality pair grid (the tukey_hsd shape) +
    # the 1-row χ² fold crossJoined onto the 1-row customer total
    "shewhart_xbar_r_weekly_events",  # 1-row center-line crossJoin
    # onto the ≤weeks subgroup frame
    "seq_trigram_patterns_events",    # 1-row trigram-total crossJoin
    # onto the ≤10-row top-pattern report
    "chebyshev_topk_embeddings",      # 4-row probe frame broadcast
    # against one corpus scan with a self-exclusion predicate (the
    # cosine_topk_many / knn_label_accuracy audited shape)
    "median_polish_dow_type_events",  # |types| × 7-row literal dow
    # frame cross join (grid densification — the kendall_w shape)
    "tail_dependence_lineitem",       # 1-row threshold/total
    # crossJoins onto the scan / 1-row tail fold
    # ---- round-11 wave C: 1-row scalar-state crossJoins
    "fisher_price_index_lineitem",    # 1-row base-year crossJoin onto
    # the part-year frame (the laspeyres audited shape)
    "sample_entropy_daily_events",    # 1-row max-day bound crossJoin
    # onto the scan; 1-row per-type r broadcast onto ≤365-day strata
    "breslow_day_weekend_purchase_events",  # 1-row pooled-ψ crossJoin
    # onto the ≤weeks strata frame
    "err_bm25_graded_docs",           # 1-row quartile-threshold
    # crossJoin onto the classifier scores (the outliers shape)
    "cka_linear_embeddings",          # 1-row half-split bound + 1-row
    # corpus count crossJoined onto the 64²-cell / 1-row block frame
    "self_bleu_sample_docs",          # 1-row (m, Σlen) length-stats
    # crossJoin onto the sampled-doc frame
    "lorenz_asymmetry_customers",     # 1-row mean/total crossJoin
    # onto the customer frame (the outliers audited shape)
    # ---- round-11 wave D: 1-row scalar-state crossJoins
    "bland_altman_tokenizers_docs",   # 1-row LoA frame crossJoined
    # onto the diff stream for the coverage pass
    "fisher_g_periodicity_events",    # 1-row max-day bound crossJoin
    # + 1-row per-type periodogram totals broadcast onto the ordinates
    "participation_ratio_embeddings", # 1-row n/dim crossJoins onto
    # the 1-row fold
    "biweight_midvariance_totalprice",  # 1-row median/MAD crossJoins
    # onto the scan (the outliers audited shape)
    "blomqvist_beta_lineitem",        # 1-row two-median crossJoin
    # onto the scan
    "ad_exponential_interarrivals_events",  # 1-row (n, Σx) crossJoin
    # onto the bounded gap grid
    # ---- round-11 wave E: 1-row / literal-grid crossJoins
    "cohort_ltv_curve_events",        # 8-row literal age grid fanned
    # per user + 1-row max-week bound crossJoin
    "sign_flip_test_weekend_events",  # 64-row literal flip grid
    # crossJoin onto the ≤weeks paired frame + 1-row T_obs broadcast
    "gk_tau_lang_source_docs",        # 1-row total crossJoins onto
    # the bounded contingency marginals
    "dunn_index_labels_embeddings",   # 1-row k/inter/diam crossJoins
    # assembling the report row
    "jaccard_yield_curve_docs",       # 5-row literal τ grid broadcast
    # onto the shingle-candidate pair frame (the semdedup_yield shape
    # — the GRID is the broadcast side, never the pair frame)
    # ---- round-11 wave F: 1-row fold crossJoins
    "wilcoxon_signed_rank_weekend_events",  # 1-row tie-correction
    # fold crossJoined with the 1-row W+ fold
    "engle_granger_click_purchase_events",  # 1-row OLS fit broadcast
    # back over the calendar-bounded daily grid (dickey_fuller shape)
    "hosmer_lemeshow_quality_docs",   # 1-row decile-cut vector and
    # 1-row χ² fold broadcast onto the corpus scan / 10-bin grid
    # ---- round-11 wave G: 1-row fold crossJoins
    "aalen_johansen_competing_events",  # 1-row observation-end bound
    # broadcast onto the per-user first-event frame (the KM shape)
    "simpson_reversal_events",        # 1-row pooled-slope broadcast
    # onto the |types|-row strata frame
    "tornqvist_price_index_lineitem", # 1-row base-year broadcast onto
    # the (part, yr) cell frame (the fisher_price audited shape)
    # ---- round-11 wave H
    "benjamini_yekutieli_dow_events", # 1-row pooled-moment broadcast
    # onto the 35-cell dow grid (the fdr_bh audited shape)
}


# Embeddings-family queries whose physical plan legitimately contains
# ZERO whole-stage-codegen spans — name → documented reason.  Every
# other embeddings query must carry at least one codegen stage: a plan
# that lost ALL of them fell back to interpreted evaluation (janino
# 64 KB blow-up on the wide per-dimension term chains this family
# generates — the pq_distortion failure mode of VERDICT r9 #1), which
# is correct-but-multiple-×-slower at scale.  This is the STATIC
# complement to bench.py's stderr codegen tripwire (VERDICT r9 #8 /
# r10 #8): the tripwire catches the compiler stack at run time, this
# catches a plan that never entered codegen at all.
#
# IMPORTANT CALLER CONTRACT: the ``*(n)`` markers only exist on plans
# built WITHOUT AQE (CollapseCodegenStages runs per-stage under AQE,
# so an un-executed AdaptiveSparkPlan string carries none) — build the
# audited plans with ``spark.sql.adaptive.enabled=false`` (see
# tools/plan_report.py / tests/test_plan_audit.py).
CODEGEN_FREE_OK: dict[str, str] = {}


def codegen_absent(plans: dict[str, str]) -> list[str]:
    """Queries whose (AQE-disabled) physical plan carries no
    WholeStageCodegen span (no ``*(n)`` operator prefix) and are not
    audited as legitimately codegen-free.  Empty = healthy."""
    return sorted(
        name
        for name, p in plans.items()
        if "*(" not in p and name not in CODEGEN_FREE_OK
    )


def scan_violations(plans: dict[str, str]) -> dict[str, list[str]]:
    """Audit a {query_name: executed-plan-string} mapping against the
    whitelists.  Returns the violation lists (all empty = green).
    Pure function over plan strings so both the pytest gate and the
    PLANS.md generator run the IDENTICAL audit on whatever plans they
    built."""
    bad_cart, bad_sp, bad_bnlj = [], [], []
    for name, p in plans.items():
        if "CartesianProduct" in p:
            bad_cart.append(name)
        if "Exchange SinglePartition" in p and name not in SINGLE_PARTITION_OK:
            bad_sp.append(name)
        if "BroadcastNestedLoopJoin" in p and name not in BNLJ_OK:
            bad_bnlj.append(name)
    return {
        "cartesian_product": sorted(bad_cart),
        "unaudited_single_partition": sorted(bad_sp),
        "unaudited_bnlj": sorted(bad_bnlj),
    }


def registry_names_hash() -> str:
    """Stable hash of the registered query names — stamped into
    PLANS.md by tools/plan_report.py and pinned by
    tests/test_doc_sync.py, so a committed PLANS.md that was not
    regenerated after the registry changed fails the suite loudly
    (VERDICT r9 Next-round #5: the audit must be visible in driver
    artifacts, not only in pytest)."""
    from .. import registry

    joined = "\n".join(sorted(registry.Q))
    return hashlib.sha256(joined.encode()).hexdigest()[:16]
