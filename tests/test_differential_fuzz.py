"""Differential fuzz regression: Spark-vs-oracle parity on RANDOMIZED
fixtures (tools/fuzz_fixture.py), not just the fixed driver fixture.

The driver verifies every oracled query on one fixed dataset (seed 42),
so a query can pass by accident of that dataset's values. Round 12's
fuzz sweeps proved the risk real: six queries diverged on the first two
generated fixtures — ANSI DIVIDE_BY_ZERO where DuckDB yields NULL
(q_eb_shrinkage, q_outlier_kappa, q_series_corr), a same-instant
purchase dropped by a ROWS frame (q_abandoned_clicks), and two
summation-order half-boundary flips (q_tpch_q9, q_apply_in_pandas).

The degenerate profile (every value column constant) then found 28
more in one sweep — zero-variance/zero-count denominators where ANSI
Spark raised but DuckDB NULLs, a crosstab whose pivot dropped unseen
status columns, an oracle-side LN(0) crash (q_survival_km), and
empty-input semantic drift (q_retention_halflife, q_quantile_normalize).

The empty profile (zero rows, schemas intact — the empty-partition
case) found 28 more: vanishing spine/limit(1)/groupBy rows where the
oracle's scalar subqueries keep a summary row, write-then-read-back
schema inference with no footers, driver-side None crashes, and the
documented engine difference on grouping sets over an empty relation
(Spark emits no rows; the oracles now state HAVING COUNT(*) > 0).

This module pins those exact seeds (1 benign, 2 adversarial, 7
degenerate, 99 empty) and runs every fuzz-found regression plus a
breadth subset
of oracled queries through the same comparison the driver uses
(tools/check.py's _run_one). Full-registry sweeps over fresh seeds
stay a manual loop:

    python tools/fuzz_fixture.py /tmp/fz --seed N [--adversarial]
    SF_DIR=/tmp/fz python tools/check.py --jobs 8
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(stem: str):
    spec = importlib.util.spec_from_file_location(
        f"tools_{stem}", os.path.join(REPO, "tools", f"{stem}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"tools_{stem}"] = mod
    spec.loader.exec_module(mod)
    return mod


# The six round-12 fuzz-found regressions, then a breadth slice across
# operator families (joins, aggs, windows, setops, function packs,
# dedup/text/knn, TPC-H shapes, UDF surfaces).
FUZZ_QUERIES = [
    "q_abandoned_clicks",
    "q_apply_in_pandas",
    "q_series_corr",
    "q_tpch_q9",
    "q_eb_shrinkage",
    "q_outlier_kappa",
    "q_anomaly_mad",
    "q_tpch_q10",
    "q_join_asof_tolerance",
    "q_join_asof_forward",
    "q_join_asof_nearest",
    "q_interpolate",
    # the 27 zero-variance / empty-input regressions from the
    # degenerate-profile sweep (q_agg_stats is in the breadth slice)
    "q_attribution_window_ladder",
    "q_auc_rank",
    "q_corr_matrix",
    "q_cramers_v",
    "q_cuped_adjustment",
    "q_gains_deciles",
    "q_histogram",
    "q_ks_statistic",
    "q_levene_test",
    "q_littles_law",
    "q_multiple_testing_fdr",
    "q_mutual_information",
    "q_ols_multi",
    "q_palma_ratio",
    "q_psi_drift",
    "q_quantile_normalize",
    "q_regression_discontinuity",
    "q_retention_halflife",
    "q_runs_test",
    "q_seasonality_strength",
    "q_spc_control_chart",
    "q_stat_crosstab",
    "q_survival_km",
    "q_survivorship_bias",
    "q_two_way_anova",
    "q_zorder_layout",
    "q_zscore_outliers",
    # the 28 empty-input regressions from the empty-profile sweep
    # (several, e.g. q_zscore_outliers, are already listed above)
    "q_anomaly_threshold_ladder",
    "q_bpe_merge_apply",
    "q_bpe_train3",
    "q_compact_small_files",
    "q_dataset_card",
    "q_dup_growth_curve",
    "q_dynamic_partition_pruning",
    "q_freshness_slo",
    "q_fk_discovery",
    "q_grouping_id",
    "q_heaps_law",
    "q_jackknife_ratio",
    "q_lineage_files",
    "q_median_two_phase",
    "q_observe_metrics",
    "q_partition_prune",
    "q_profile_columns",
    "q_rec_coverage",
    "q_scan_csv_corrupt",
    "q_scan_file_metadata",
    "q_sink_parquet",
    "q_stream_backfill_seam",
    "q_stream_sink_partitioned",
    "q_vocab_coverage",
    "q_write_audit_publish",
    "q_agg_groupby",
    "q_agg_stats",
    "q_case_when",
    "q_join_inner",
    "q_join_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_asof",
    "q_join_range",
    "q_window_rank",
    "q_window_lag",
    "q_window_frame",
    "q_topk_per_group",
    "q_sort_multi",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_grouping_sets",
    "q_rollup",
    "q_cube",
    "q_pivot",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_funcs",
    "q_map_funcs",
    "q_json_funcs",
    "q_dedup_exact",
    "q_text_stats",
    "q_knn_cosine",
    "q_tpch_q14",
    "q_tpch_q18",
    "q_udaf_grouped",
    "q_udtf",
]

PROFILES = [
    ("benign", 1, {}),
    ("adversarial", 2, {"adversarial": True}),
    ("degenerate", 7, {"degenerate": True}),
    ("empty", 99, {"empty": True}),
]


@pytest.fixture(scope="module")
def fuzz_env(tmp_path_factory):
    fuzz = _load_tool("fuzz_fixture")
    check = _load_tool("check")
    dirs, cons = {}, {}
    for profile, seed, kwargs in PROFILES:
        d = str(tmp_path_factory.mktemp(f"fuzz_{profile}"))
        fuzz.generate(d, seed, **kwargs)
        dirs[profile] = d
        cons[profile] = check.duck_connection(d)
    yield check, dirs, cons
    for con in cons.values():
        con.close()


def test_fuzz_list_is_registered_and_oracled():
    from catenae_kafka_spark.registry import all_specs

    specs = all_specs()
    missing = [q for q in FUZZ_QUERIES if q not in specs]
    assert not missing, missing
    unoracled = [q for q in FUZZ_QUERIES if specs[q].oracle is None]
    assert not unoracled, unoracled


@pytest.mark.parametrize("profile", [p[0] for p in PROFILES])
@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_parity_on_randomized_fixture(spark, fuzz_env, profile, name):
    from catenae_kafka_spark.registry import all_specs

    check, dirs, cons = fuzz_env
    status, line, _ = check._run_one(
        spark, dirs[profile], name, all_specs()[name], cons[profile]
    )
    assert status == "ok", line
