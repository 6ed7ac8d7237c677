"""Property-based tests (Hypothesis): the custom as-of and interval
join operators must match independent pandas reference implementations
on randomized inputs — not just on the fixture data."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from catenae_kafka_spark.operators.asof import asof_join, interval_join
from catenae_kafka_spark.operators.skew import salted_join

from pyspark.sql import functions as F


def _events_strategy():
    row = st.tuples(
        st.integers(min_value=0, max_value=4),      # key
        st.integers(min_value=0, max_value=1000),   # ts (int seconds)
        st.integers(min_value=-100, max_value=100), # payload
    )
    return st.lists(row, min_size=0, max_size=30)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left_rows=_events_strategy(), right_rows=_events_strategy())
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    # unique (key, ts) on each side: merge_asof semantics with ties on
    # ts are otherwise ambiguous between implementations
    left_rows = list({(k, t): (k, t, v) for k, t, v in left_rows}.values())
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())
    left = spark.createDataFrame(
        [(k, t, v) for k, t, v in left_rows] or [(0, 0, 0)],
        "key long, lts long, lval long",
    )
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in right_rows] or [(0, 1, 0)],
        "key long, rts long, rval long",
    )
    got = asof_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        right_payload=["rts", "rval"],
    ).toPandas()

    lp = left.toPandas().sort_values(["lts", "key"]).reset_index(drop=True)
    rp = right.toPandas().sort_values(["rts", "key"]).reset_index(drop=True)
    exp = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="key", direction="backward"
    )
    g = got.sort_values(["key", "lts"]).reset_index(drop=True)
    e = exp.sort_values(["key", "lts"]).reset_index(drop=True)
    g = g[["key", "lts", "lval", "rts", "rval"]].astype("float64")
    e = e[["key", "lts", "lval", "rts", "rval"]].astype("float64")
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(points=_events_strategy(), intervals=_events_strategy())
def test_interval_join_matches_naive_reference(spark, points, intervals):
    pts = spark.createDataFrame(
        [(k, t) for k, t, _ in points] or [(0, 0)], "pid long, p long"
    ).withColumn("pid", F.monotonically_increasing_id())
    ivs = spark.createDataFrame(
        [(k, t, t + abs(v) + 1) for k, t, v in intervals] or [(0, 0, 1)],
        "iid long, lo long, hi long",
    ).withColumn("iid", F.monotonically_increasing_id())
    got = interval_join(
        pts, ivs,
        point_expr=F.col("p"), lo_expr=F.col("lo"), hi_expr=F.col("hi"),
        bucket_width=7,
    )
    n_got = got.count()
    pp, ii = pts.toPandas(), ivs.toPandas()
    n_exp = sum(
        ((ii.lo <= p) & (p < ii.hi)).sum() for p in pp.p
    )
    assert n_got == n_exp
    bad = got.filter(~((F.col("lo") <= F.col("p")) & (F.col("p") < F.col("hi"))))
    assert bad.count() == 0


def test_salted_join_equals_plain_join(spark):
    from catenae_kafka_spark.catalog import catalog

    c = catalog(spark, "/root/testdata/sf0.001")
    large = c.lineitem.select("l_orderkey", "l_quantity")
    small = c.orders.select("o_orderkey", "o_orderstatus").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = large.join(small, "l_orderkey").groupBy("o_orderstatus").count()
    salted = (
        salted_join(large, small, "l_orderkey").groupBy("o_orderstatus").count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left_rows=_events_strategy(), right_rows=_events_strategy())
def test_asof_tolerance_matches_pandas(spark, left_rows, right_rows):
    """The tolerance-masked backward as-of (q_join_asof_tolerance's
    shape) must equal pandas merge_asof(tolerance=...) on random data:
    masking the single latest-prior match is exact because an
    out-of-tolerance latest match implies no in-tolerance match."""
    TOL = 50
    left_rows = list({(k, t): (k, t, v) for k, t, v in left_rows}.values())
    right_rows = list({(k, t): (k, t, v) for k, t, v in right_rows}.values())
    left = spark.createDataFrame(
        [(k, t, v) for k, t, v in left_rows] or [(0, 0, 0)],
        "key long, lts long, lval long",
    )
    right = spark.createDataFrame(
        [(k, t, v) for k, t, v in right_rows] or [(0, 1, 0)],
        "key long, rts long, rval long",
    )
    joined = asof_join(
        left, right, on=["key"], left_ts="lts", right_ts="rts",
        right_payload=["rts", "rval"],
    )
    within = F.col("rts") >= F.col("lts") - F.lit(TOL)
    got = joined.select(
        "key", "lts", "lval",
        F.when(within, F.col("rts")).alias("rts"),
        F.when(within, F.col("rval")).alias("rval"),
    ).toPandas()

    lp = left.toPandas().sort_values(["lts", "key"]).reset_index(drop=True)
    rp = right.toPandas().sort_values(["rts", "key"]).reset_index(drop=True)
    exp = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="key",
        direction="backward", tolerance=TOL,
    )
    g = got.sort_values(["key", "lts"]).reset_index(drop=True)
    e = exp.sort_values(["key", "lts"]).reset_index(drop=True)
    g = g[["key", "lts", "lval", "rts", "rval"]].astype("float64")
    e = e[["key", "lts", "lval", "rts", "rval"]].astype("float64")
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_custom_joins_degrade_on_empty_inputs(spark):
    """Empty slices are routine at scale (a day with no fills, an
    empty interval table): the custom joins must return correctly-
    shaped empties — and a left as-of row with no right partner keeps
    its left semantics (one row, null payload) — never crash."""
    import datetime

    from pyspark.sql import functions as F

    from catenae_kafka_spark.operators.asof import asof_join, interval_join

    L = spark.createDataFrame([], "k string, lts timestamp")
    R = spark.createDataFrame([], "k string, rts timestamp, payload double")
    both = asof_join(
        L, R, on=["k"], left_ts="lts", right_ts="rts", right_payload=["payload"]
    )
    assert both.count() == 0
    L1 = spark.createDataFrame(
        [("a", datetime.datetime(2020, 1, 1))], "k string, lts timestamp"
    )
    left_only = asof_join(
        L1, R, on=["k"], left_ts="lts", right_ts="rts", right_payload=["payload"]
    ).collect()
    assert len(left_only) == 1 and left_only[0]["payload"] is None
    pts = spark.createDataFrame([], "x bigint")
    iv = spark.createDataFrame([], "lo bigint, hi bigint")
    out = interval_join(
        pts, iv, F.col("x"), F.col("lo"), F.col("hi"), bucket_width=10
    )
    assert out.count() == 0
