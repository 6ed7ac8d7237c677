"""10x scale validation: replicate the sf0.1 fixtures with disjoint key
offsets (~sf1: 6M lineitem, 1M events, 50k docs), then time headline
queries at both scales. Measured results live in docs/SCALE.md.

Usage: python tools/scale10x.py [dst_dir]  (default /tmp/sfx1)

Key strides exceed the sf0.1 key ranges, so copies stay disjoint and
every join key keeps referential integrity (the k-th copy of lineitem
joins the k-th copy of orders, etc.). Note the replicated documents
table gives every doc 9 exact clones — a *pathological* near-dup
distribution (each clone cluster is a 10-clique), so the minhash pair
OUTPUT grows ~45x while input grows 10x; see the scaling table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import TABLES, catalog
from catenae_kafka_spark.registry import all_specs
from catenae_kafka_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
K = 10
STRIDES = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
HEADLINE = [
    "q_flagship_revenue",
    "q_agg_groupby",
    "q_join_asof",
    "q_dedup_minhash",
    "q_knn_cosine",
    "q_sessionize",
    "q_window_rank",
    # round-2 corpus-prep ops (linear shapes)
    "q_seq_pack",
    "q_decontaminate",
    "q_doc_chunk",
    # round-3 scale-path ops
    "q_agg_bitmap_distinct",  # bitmap partials: shuffle bounded by key x bucket
    "q_join_bloom",           # runtime bloom pruning of the fact shuffle
    "q_pagerank",             # iterative joins over node-bounded rank table
    "q_rolling_median",       # O(k)-bounded frame collect, one keyed shuffle
    "q_ngram_lm",             # pair space bounded by vocab^2, not corpus
    "q_sample_exact_k",       # TakeOrdered: O(k x partitions) movement
    # session-continuation scale-path ops
    "q_auc_rank",             # bucketed prefix sum, no global sort window
    "q_skyline",              # dominance as sorted scan, not O(n^2)
    "q_target_encode",        # broadcast partials, fact never shuffles
    "q_embed_quantize",       # map-only higher-order array ops
    "q_incremental_agg",      # partial-agg merge (IVM refresh shape)
    "q_bfs_khop",             # k broadcast frontier rounds
    # round-3 second-continuation ops
    "q_rfm_segments",         # quantile boundaries broadcast, no global NTILE
    "q_concurrency_peak",     # sweep partitioned by day, parallel across days
    "q_abandoned_clicks",     # windowed rewrite of time-range EXISTS
    "q_interpurchase_gap",    # per-customer LAG + one global agg
    "q_funnel_timing",        # conditional-MIN grouped pass + global quantiles
    "q_seasonal_decompose",   # daily rollup is the only big shuffle
    "q_graph_common_neighbors",  # shared-neighbor keyed self-join
    # round-3 sixth-pass ops
    "q_median_two_phase",     # histogram refinement: 2 scans, no global sort
    "q_cusum_alarm",          # prefix-sum closed form, one keyed window pass
    "q_lang_tvd",             # sparse common-denominator TVD, pair-broadcast
    "q_totals_reconciliation",  # keyed partial agg + one join
    "q_event_type_affinity",  # (user,day)-keyed self-join, type-bounded width
    "q_markov_accuracy",      # one window pass + |types|^2 rollup
    "q_kfold_cv",             # partial-subtraction CV: one agg, k models free
    "q_log2_histogram",       # map + ~20-key agg
    "q_sessionize_capped",    # one user-keyed shuffle, cap is window math
    "q_join_fanout_audit",    # the join it audits + tiny bucket agg
    # round-3 seventh-pass ops
    "q_max_drawdown",         # two stacked O(n) per-user window scans
    "q_spearman_corr",        # per-nation rank windows + 25-row power sums
    "q_decision_stump",       # fact scan reduces to 50-value domain
    "q_isotonic_calibration",  # same domain rollup + bounded minimax join
    "q_jackknife_ratio",      # map-side totals + shuffle-free LOO column
    "q_equiheight_histogram",  # one boundary pass + bucket agg
    "q_dedup_waterfall",      # one pass, key-digest distincts
    "q_error_budget",         # day rollup + calendar-bounded window
    "q_xcorr_hourly",         # hour rollup + 5-lag spine join
    "q_bpe_train3",           # 3 explode+count passes, broadcast rewrites
    # round-3 snapshot / round-4 ops
    "q_lttb_downsample",      # calendar-bounded daily rollup + 60-bucket argmax
    "q_itemset_triples",      # a-priori pruned in-basket triple expansion
    "q_t_closeness",          # star join to 25x11 dense grid
    "q_levene_test",          # (group, qty) cell rollup, <=150 cells
    "q_runs_test",            # daily rollup + day-table windows
    "q_littles_law",          # sessionize + boundary sweep
    "q_brier_decomposition",  # two disjoint-slice qty rollups
    "q_resource_allocation",  # shared-neighbor keyed self-join + degree join
]

# measured at sf0.1 only: the exact-complete set-similarity/fuzzy ops'
# candidate volume is Σ df² over prefix/bucket tokens — on the
# fixtures' 31-word uniform vocabulary (and the replicator's 10-clique
# clone corpus) that term is intentionally pathological and the 10×
# run measures output growth, not plan shape. MinHash (probabilistic,
# in HEADLINE) is the recommended operator for such corpora; the exact
# ops stay the oracle-checked correctness path.
SF01_ONLY = [
    "q_dedup_ngram_jaccard",
    "q_fuzzy_levenshtein",
    "q_dedup_containment",
]


#: completion marker written LAST by replicate(): checking any one
#: table file (bench/ladder used lineitem.parquet, written mid-run)
#: accepts a Ctrl-C'd partial staging forever; the marker also records
#: WHICH k built the dir, so a 100x staging accidentally pointed at the
#: 10x path re-stages instead of silently timing the wrong scale.
MARKER = "_STAGED_OK"


#: queries NOT timed at k >= 100 (canonical set — tools/scale_ladder.py
#: imports it): the replicator gives every document k exact clones, so
#: near-dup pair OUTPUT is quadratic in k (C(100,2) = 4950 pairs per
#: clique vs C(10,2) = 45; measured 128.5 s at k=100) — the wall there
#: measures the synthetic corpus, not the plan. Gate stays at k=10.
X100_EXCLUDE = frozenset({"q_dedup_minhash"})


def staged(dst: str, k: int) -> bool:
    """True iff ``dst`` holds a COMPLETE k-fold staging OF THIS SOURCE.

    The src check matters as much as the k check: a dir staged from a
    different fixture would otherwise pass and be silently timed
    against the wrong baseline (ADVICE r9)."""
    import json

    try:
        with open(os.path.join(dst, MARKER)) as fh:
            meta = json.load(fh)
        return (
            isinstance(meta, dict)
            and meta.get("k") == k
            and meta.get("src") == SRC
        )
    except (OSError, ValueError):
        return False


def replicate(spark, dst: str, k: int = K) -> None:
    """Write a k-fold key-shifted replication of sf0.1 into ``dst``.

    k=10 is the standard sfx1 (~sf1) rung; k=100 stages sfx10 (~sf10,
    60M lineitem) for the 100x ladder step. Strides only need to exceed
    the SOURCE (sf0.1) key ranges, so the same strides serve any k —
    copy offsets stay disjoint (k=100 tops out at 99 x 10M = 9.9e8,
    far inside BIGINT)."""
    import json

    # k=0 would build F.sequence(0, -1) — a DESCENDING sequence, the
    # exact pitfall the explode below guards against — and then write a
    # marker recording the bogus staging as valid (ADVICE r9)
    if k < 1:
        raise ValueError(f"replication factor k must be >= 1, got {k}")

    marker = os.path.join(dst, MARKER)
    if os.path.exists(marker):
        os.remove(marker)  # re-staging: invalidate until complete again
    c = catalog(spark, SRC)
    for t in TABLES:
        df = c.table(t)
        if t in STRIDES:
            i = F.explode(
                F.sequence(F.lit(0), F.lit(k - 1))
            ).alias("_i")
            df = df.select("*", i)
            for col, stride in STRIDES[t].items():
                df = df.withColumn(col, F.col(col) + F.col("_i") * stride)
            df = df.drop("_i")
            # spread the write so the k-fold explode of a single-file
            # source doesn't serialize through one task
            df = df.repartition(max(k, 8))
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
    with open(marker, "w") as fh:
        json.dump({"k": k, "src": SRC}, fh)


def main() -> None:
    args = sys.argv[1:]
    k = K
    if "--k" in args:
        i = args.index("--k")
        # .isdigit() alone accepts "0" — see the k<1 guard in replicate()
        if (
            i + 1 >= len(args)
            or not args[i + 1].isdigit()
            or int(args[i + 1]) < 1
        ):
            sys.exit("usage: scale10x.py [dst] [--k N>=1] [--stage-only] [query ...]")
        k = int(args[i + 1])
        del args[i : i + 2]
    stage_only = "--stage-only" in args
    if stage_only:
        args.remove("--stage-only")
    dst = args.pop(0) if args else "/tmp/sfx1"
    spark = get_spark("scale10x")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    if not staged(dst, k):
        replicate(spark, dst, k)
    if stage_only:
        print(f"staged {dst} (k={k})", flush=True)
        return
    specs = all_specs()
    only = set(args)  # optional query-name filter
    if only:
        sf01 = [n for n in SF01_ONLY if n in only]
        headline = [n for n in HEADLINE if n in only]
    else:
        sf01, headline = SF01_ONLY, HEADLINE
    if k >= 100:
        # the clone-clique pathology is quadratic in k — see X100_EXCLUDE
        headline = [n for n in headline if n not in X100_EXCLUDE]
    for name in sf01:
        t0 = time.perf_counter()
        specs[name].fn(spark, SRC).write.format("noop").mode("overwrite").save()
        print(f"sf0.1-only {name}: {time.perf_counter() - t0:.2f}s", flush=True)
    for sf_dir, label in [(SRC, "sf0.1"), (dst, f"{dst}({k}x)")]:
        for name in headline:
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            print(f"{label} {name}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
