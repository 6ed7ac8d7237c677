"""Property tests for analytics + dataops additions: brute-force
dominance for the skyline, pandas nunique for running distinct, and
base/delta-split invariance for incremental aggregation."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_skyline_matches_bruteforce_dominance(spark):
    from catenae_kafka_spark.operators.analytics import q_skyline

    got = q_skyline(spark, SF).toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    orders["price_cents"] = np.floor(
        orders["o_totalprice"] * 100 + 0.5
    ).astype(np.int64)
    orders["order_day"] = orders["o_orderdate"].dt.strftime("%Y-%m-%d")
    expect = set()
    for prio, grp in orders.groupby("o_orderpriority"):
        pts = grp[["o_orderkey", "price_cents", "order_day"]].to_numpy()
        for k, p, d in pts:
            dominated = any(
                (p2 >= p and d2 >= d and (p2 > p or d2 > d))
                for _, p2, d2 in pts
            )
            if not dominated:
                expect.add((prio, k))
    assert set(zip(got["o_orderpriority"], got["o_orderkey"])) == expect


def test_running_distinct_matches_pandas_nunique(spark):
    from catenae_kafka_spark.operators.analytics import q_running_distinct

    got = q_running_distinct(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "user_id", "ts"
    ).toPandas()
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    for (etype, day), row in got.set_index(["event_type", "day"]).iterrows():
        seen = ev[(ev["event_type"] == etype) & (ev["day"] <= day)][
            "user_id"
        ].nunique()
        assert row["cum_distinct_users"] == seen, (etype, day)


def test_incremental_agg_invariant_to_split_date(spark):
    """The merged partials must equal the full recompute for ANY split
    date — IVM correctness is split-independence."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    full = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("s"))
        .toPandas()
        .set_index("o_custkey")
        .sort_index()
    )
    for split in ["1996-06-15", "1999-01-01", "2002-01-01"]:
        sp = F.lit(split).cast("timestamp")
        base = orders.filter(F.col("o_orderdate") < sp)
        delta = orders.filter(F.col("o_orderdate") >= sp)
        merged = (
            base.groupBy("o_custkey")
            .agg(F.count("*").alias("pn"), F.sum(cents).alias("ps"))
            .unionByName(
                delta.groupBy("o_custkey").agg(
                    F.count("*").alias("pn"), F.sum(cents).alias("ps")
                )
            )
            .groupBy("o_custkey")
            .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
            .toPandas()
            .set_index("o_custkey")
            .sort_index()
        )
        assert merged.equals(full), split


def test_bfs_khop_distances_are_valid(spark):
    from catenae_kafka_spark.operators.graph import q_bfs_khop

    d = q_bfs_khop(spark, SF).toPandas()
    assert (d["dist"] == 0).sum() == 1  # exactly one seed
    assert d["dist"].between(0, 2).all()
    assert d["node"].is_unique
