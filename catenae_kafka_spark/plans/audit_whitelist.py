"""Reviewed plan-shape exceptions, shared by tools/plan_audit.py and
tests/test_plans.py (single source of truth: a new nested-loop join
must be justified HERE, with its reason, to pass either gate).

Every entry is a query whose CartesianProduct / BroadcastNestedLoopJoin
is a reviewed 1-row-aggregate or domain-bounded broadcast cross — never
a data-x-data product. PYUDF_WHITELIST marks the queries whose
registered surface IS the row-at-a-time Python UDF demo.
"""

from __future__ import annotations

# query -> reason a nested-loop/cartesian is acceptable THERE.
NL_WHITELIST = {
    "q_join_theta": "theta (non-equi) join IS the operator under test; bounded build side",
    "q_join_range": "interval containment join; build side is the bounded bucket table",
    "q_subquery_scalar": "1-row scalar subquery broadcast cross",
    "q_subquery_correlated": "decorrelated to a 1-row/row-per-key aggregate cross",
    "q_lateral_subquery": "lateral decorrelates to a bounded per-key aggregate",
    "q_date_spine": "spine x type-domain cross is dimension-only (rows = days x types)",
    "q_dense_grid": "spine x type-domain cross is dimension-only",
    "q_skyline": "dominance filter against a <=100-row broadcast frontier",
    "q_federated_join": "cross of two 1-row per-source summary aggregates",
    "q_knn_cosine": "documented brute-force baseline; ANN siblings are the scale path",
    "q_knn_lsh": "probe set x bucket table nested loop over the TINY probe side",
    "q_dedup_threshold_sweep": "threshold grid (5 rows) x edge table",
    "q_bootstrap_ci": "resample-index grid (<=64 rows) x 1-row moment aggregate",
    "q_chi_square": "1-row total aggregate cross",
    "q_ks_statistic": "1-row per-sample scalar cross",
    "q_zscore_outliers": "1-row moment aggregate cross",
    "q_winsorize": "1-row quantile-bound aggregate cross",
    "q_anomaly_mad": "1-row median/MAD aggregate cross",
    "q_feature_binning": "1-row quantile-boundary aggregate cross",
    "q_psi_drift": "two 1-row period aggregates crossed",
    "q_gains_deciles": "1-row total aggregate cross",
    "q_calendar_tz_contract": "constant calendar probe rows",
    "q_histogram": "1-row min/max aggregate cross for bucket width",
    "q_agg_histogram": "1-row min/max aggregate cross for bucket width",
    "q_apportion_seats": "1-row total + 1-row leftover broadcast crosses",
    "q_basket_lift": "1-row basket-count aggregate cross",
    "q_bm25": "1-row corpus-stats aggregate cross",
    "q_calibration_bins": "1-row total aggregate cross",
    "q_diff_in_diff": "four 1-row period/arm aggregates crossed",
    "q_doc_perplexity": "1-row corpus-total aggregate cross (unigram LM denominator)",
    "q_embed_outliers": "1-row moment aggregate cross",
    "q_forecast_baseline": "1-row split-boundary aggregate cross",
    "q_haar_energy": "three 1-row level-energy aggregates crossed",
    "q_hybrid_rrf": "1-row corpus-stats cross feeding both retrieval arms",
    "q_keyphrases": "1-row corpus-total cross for the contrast denominator",
    "q_kmeans_quantized": "k-row centroid table broadcast to assignment (k bounded)",
    "q_knn_ivf": "probe x nearest-centroid shortlist; centroid table bounded by k",
    "q_lang_tvd": "k(k-1)/2 language-pair table broadcast (non-equi, domain-bounded)",
    "q_multiple_testing_fdr": "1-row totals + 1-row step-up cutoff crosses",
    "q_pca_power": "dim^2-bounded Gram/eigvec tables crossed (corpus-independent)",
    "q_phrase_search": "1-row query-phrase constant cross",
    "q_poststratify": "1-row population-total aggregate cross",
    "q_rfm_segments": "1-row quantile-boundary aggregate cross",
    "q_sample_balanced": "per-class-count table (|classes| rows) broadcast cross",
    "q_seasonality_strength": "1-row square-sum aggregate cross",
    "q_segment_migration": "1-row period-boundary aggregate cross",
    "q_simpson_check": "1-row pooled-sign aggregate cross",
    "q_text_tfidf": "1-row corpus-size aggregate cross (idf denominator)",
    "q_tpch_q11": "1-row fraction-of-total threshold cross (Q11 semantics)",
    "q_vocab_coverage": "vocabulary table broadcast membership probe (domain-bounded)",
    "q_word_burstiness": "1-row corpus-moment aggregate cross",
    "q_word_pmi": "1-row corpus-total cross for the PMI denominator",
    "q_zorder_layout": "1-row min/max range aggregate cross (Z-address scaling)",
    "q_outlier_kappa": "three 1-row moment/median/MAD aggregate crosses",
    "q_permutation_test": "1-row totals + 1-row observed-statistic crosses",
    "q_json_schema_profile": "1-row row-count aggregate cross",
    "q_fk_discovery": "1-row distinct-count x 1-row orphan-count crosses per candidate",
    "q_bloom_fpr": "1-row member/bit-count aggregates crossed onto the probe summary",
    "q_rle_compressibility": "1-row distinct-count aggregate cross",
    "q_rendezvous_sharding": "8-row shard-constant broadcast cross per user (HRW scoring)",
    "q_dataset_card": "1-row dup-count + 1-row top-source aggregates crossed",
    "q_chi_residuals": "1-row grand-total aggregate cross onto the 35-cell table",
    "q_quantile_normalize": "9-row decile spine joined on a rank inequality (bounded spine)",
    "q_rank_biased_overlap": "10-row depth spine x 25-row rank table (both constants)",
    "q_negative_sampling": "anchor-slice x label-table non-equi join; bounded by the 1/11 anchor slice (pre-bucketed sampling at corpus scale, see docstring)",
    "q_bpe_merge_apply": "1-row winning-pair broadcast cross onto the corpus rewrite",
    "q_kendall_tau": "O(n^2) pairwise join on the 25-row brand rollup + 1-row count cross",
    "q_theil_sen": "O(n^2) pairwise slopes on the 25-row brand rollup",
    "q_location_ladder": "1-row bound/winsorize aggregates crossed",
    "q_two_way_anova": "1-row SS aggregates (total/factor) crossed",
    "q_embedding_isotropy": "1-row centroid-norm aggregate cross",
    "q_rls_policy_audit": "1-row total-count aggregate cross",
    "q_hash_chain_audit": "1-row top-hash aggregate cross",
    "q_horvitz_thompson": "1-row population-total aggregate cross",
    "q_attribution_window_ladder": "3-row window spine x per-user min-gap (bounded non-equi)",
    "q_anomaly_threshold_ladder": "1-row moment aggregate cross + 3-row threshold spine",
    "q_var_backtest": "1-row VaR-threshold aggregate cross",
    "q_hour_profile": "1-row total/max aggregate cross onto the 24-row profile",
    "q_keyset_pagination": "1-row cursor aggregate cross (the keyset itself)",
    "q_rolling_origin_backtest": "3-row cutoff spine joined to the <=31-row daily series",
    "q_rec_coverage": "three 1-row coverage aggregates crossed",
    "q_graph_modularity": "1-row total-weight aggregate crossed with the 5-row community rollup",
    "q_cramers_v": "5x5 marginal-grid densification cross + 1-row total cross",
    "q_jackknife_ratio": "1-row totals + 1-row pseudo-value-mean aggregate crosses",
    "q_knn_label_vote": "brute-force probe (20 rows) x corpus, same reviewed baseline as q_knn_cosine",
    "q_isotonic_calibration": "minimax triple join on the 50-value quantity domain (corpus-independent)",
    "q_bpe_train3": "1-row winning-pair broadcast cross per round (3 rounds), same as q_bpe_merge_apply",
    "q_mixture_rates": "1-row language-count + 1-row epoch-size aggregate crosses",
    "q_mcnemar": "1-row moment/median/MAD aggregate crosses, same reviewed shape as q_outlier_kappa",
    "q_ndcg_at5": "bounded knn probe (q_knn_cosine baseline) + 5-row constant discount table non-equi join",
    "q_equiheight_histogram": "1-row quantile-boundary aggregate cross (same shape as q_feature_binning)",
    "q_survey_raking": "1-row total aggregate cross onto the kr x kc cell table",
    "q_xcorr_hourly": "5-row lag spine cross onto the calendar-bounded hourly series",
    "q_wasserstein_1d": "1-row total aggregate cross onto the bounded cent-domain CDF table",
    "q_eb_shrinkage": "1-row pooled-moment aggregate crosses onto the 25-group table",
    "q_runs_test": "1-row median order-statistic broadcast cross onto the calendar-bounded day table",
    "q_littles_law": "1-row direct-totals x 1-row sweep-area aggregate cross (the conservation check)",
    "q_t_closeness": "25-group x 11-bin spine cross + 1-row global-total cross (all dimension-bounded)",
    "q_mutual_information": "1-row total + 1-row entropy scalar-subquery crosses onto the 35-cell table",
    "q_brier_decomposition": "1-row eval-totals aggregate cross onto the <=50-bin table",
}

# Queries whose registered surface IS the row-at-a-time Python UDF demo.
PYUDF_WHITELIST = {"q_udf_scalar", "q_udtf", "q_udaf_grouped", "q_udtf_native"}

# query -> reason an UNPARTITIONED window over raw fact rows is acceptable
# THERE (see plans/shape.py). EMPTY, and the goal is keeping it empty:
# every global rank scan is either the two-phase bucketed prefix sum
# (q_auc_rank / _select_order_stats) or bounded by a node the checker
# models (aggregate / limit / WindowGroupLimit / unique-key range
# filter). The two former entries were retired in round 6 by teaching
# plans/shape.py their bounding shapes: q_topk_merge_proof's merge input
# is capped by WindowGroupLimit + TakeOrderedAndProject (exact node
# matching), and q_null_ordering_contract's probe slice is capped by the
# pushed ``o_orderkey < 1e6`` unique-key range filter. Add an entry only
# with a reviewed reason why the window's input is bounded despite the
# checker not seeing it.
GW_WHITELIST: dict[str, str] = {}
