"""Reviewed plan-shape exceptions, shared by tools/plan_audit.py and
tests/test_plans.py (single source of truth: a new nested-loop join
must be justified HERE, with its reason, to pass either gate).

Every entry is a query whose CartesianProduct / BroadcastNestedLoopJoin
is a reviewed DOMAIN-bounded broadcast cross (constant spines, <=25-row
rollups, deliberate brute-force baselines) — never a data-x-data
product. The formerly-dominant "1-row aggregate cross" class needs no
entry since round 6: plans/shape.py:unbounded_nested_loop_joins accepts
a nested loop with a provably scalar side mechanically, which retired
77 of the 100 reviewed entries. PYUDF_WHITELIST marks the queries whose
registered surface IS the row-at-a-time Python UDF demo.
"""

from __future__ import annotations

# query -> reason a non-scalar nested-loop/cartesian is acceptable THERE.
NL_WHITELIST = {
    "q_attribution_window_ladder": "3-row window spine x per-user min-gap (bounded non-equi)",
    "q_cramers_v": "5x5 marginal-grid densification cross + 1-row total cross",
    "q_dedup_threshold_sweep": "threshold grid (5 rows) x edge table",
    "q_dense_grid": "spine x type-domain cross is dimension-only",
    "q_heaps_law": "10-row constant checkpoint spine non-equi joined to vocab/doc rollups (bounded x10 fan-out)",
    "q_dup_growth_curve": "10-row constant checkpoint spine non-equi joined to the key first-rank rollup (q_heaps_law class)",
    "q_isotonic_calibration": "minimax triple join on the 50-value quantity domain (corpus-independent)",
    "q_kendall_tau": "O(n^2) pairwise join on the 25-row brand rollup + 1-row count cross",
    # q_knn_cosine / q_knn_label_vote entries retired in r12: the brute-force
    # scoring moved from a crossJoin of HOF expressions into a mapInArrow
    # kernel over the corpus (no nested-loop join left in either plan).
    "q_knn_ivf": "probe x nearest-centroid shortlist; centroid table bounded by k",
    "q_embed_truncation_recall": "8-anchor bounded probe x corpus (q_knn_cosine reviewed baseline); production runs it over ANN candidates",
    "q_hard_negatives": "8-anchor bounded probe x corpus with label-exclusion residual (q_knn_label_vote class)",
    # q_lang_id entry retired in r12 session 2: the profile-cross scoring
    # moved into a mapInArrow kernel (profile collected at build, bounded
    # 10 x |languages|); no nested-loop join left in the plan.
    "q_lang_tvd": "k(k-1)/2 language-pair table broadcast (non-equi, domain-bounded)",
    "q_ndcg_at5": "bounded knn probe (q_knn_cosine baseline) + 5-row constant discount table non-equi join",
    "q_negative_sampling": "anchor-slice x label-table non-equi join; bounded by the 1/11 anchor slice (pre-bucketed sampling at corpus scale, see docstring)",
    "q_phrase_search": "1-row query-phrase constant cross",
    "q_quantile_normalize": "9-row decile spine joined on a rank inequality (bounded spine)",
    "q_rank_biased_overlap": "10-row depth spine x 25-row rank table (both constants)",
    "q_rendezvous_sharding": "8-row shard-constant broadcast cross per user (HRW scoring)",
    "q_semdedup": "corpus x coarse-quantizer broadcast cross (same reviewed class as q_knn_ivf); k ~ sqrt(N) bounds both assignment and in-cluster pair cost",
    "q_rolling_origin_backtest": "3-row cutoff spine joined to the <=31-row daily series",
    "q_runs_test": "1-row median order-statistic broadcast cross onto the calendar-bounded day table",
    "q_t_closeness": "25-group x 11-bin spine cross + 1-row global-total cross (all dimension-bounded)",
    "q_theil_sen": "O(n^2) pairwise slopes on the 25-row brand rollup",
    "q_var_backtest": "1-row VaR-threshold aggregate cross",
    "q_vocab_coverage": "vocabulary table broadcast membership probe (domain-bounded)",
    "q_xcorr_hourly": "5-row lag spine cross onto the calendar-bounded hourly series",
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
