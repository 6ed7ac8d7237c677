"""Misra–Gries heavy-hitter sketch guarantees under real eviction.

The registered query (q_heavy_hitters) runs the no-eviction exact case
against a SQL oracle; these tests force eviction with synthetic Zipf
data and assert the textbook bounds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from catenae_kafka_spark.operators.sketches import heavy_hitters

N = 20_000
K = 16


def _zipf_df(spark):
    # item v = floor(N / (id+1)) appears ~ N/(v(v+1)) times: v=1 ~10k,
    # v=2 ~3.3k, v=3 ~1.6k ... a deterministic heavy-tailed stream
    return spark.range(N).select(
        F.floor(F.lit(N) / (F.col("id") + 1)).cast("string").alias("item")
    )


def test_misra_gries_bounds_and_guarantee(spark):
    df = _zipf_df(spark).repartition(4)
    est = {r.item: r.est for r in heavy_hitters(df, "item", K).collect()}
    exact = {
        r.item: r.n
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    bound = N / (K + 1)
    # never overestimates; undercount bounded by n/(k+1)
    for item, e in est.items():
        assert e <= exact[item]
        assert exact[item] - e <= bound
    # completeness: every item above the threshold is present
    for item, freq in exact.items():
        if freq > bound:
            assert item in est, f"heavy hitter {item} (freq={freq}) missing"


def test_sketch_exact_when_cardinality_below_k(spark, sf_dir):
    from catenae_kafka_spark.catalog import catalog
    from catenae_kafka_spark.operators.sketches import q_heavy_hitters

    est = {r.item: r.est for r in q_heavy_hitters(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.n
        for r in catalog(spark, sf_dir)
        .events.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert est == exact


def test_count_min_never_underestimates_on_zipf(spark):
    """CMS structural guarantee: est(item) >= true_freq(item), on a
    skewed synthetic stream with 200 distinct items over a 4x64 sketch
    (heavy collisions, unlike the 5-type fixture)."""
    import pyspark.sql.functions as F

    from catenae_kafka_spark.operators.sketches import (
        cms_cells,
        cms_point_estimates,
    )

    rows = [(f"item_{j}",) for j in range(200) for _ in range(max(1, 200 // (j + 1)))]
    df = spark.createDataFrame(rows, "event_type string")
    cells = cms_cells(df, "event_type")
    est = {
        r.item: r.est
        for r in cms_point_estimates(
            cells, df.distinct(), "event_type"
        ).collect()
    }
    true = {
        r.event_type: r.n
        for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    for item, t in true.items():
        assert est[item] >= t, item
