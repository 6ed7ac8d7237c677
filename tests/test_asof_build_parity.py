"""asof_join single-select build ≡ withColumn-chain build (r12 opt).

asof_join aligns the two union sides in one select per side instead of
a ~10-deep withColumn chain (each withColumn is a full eager analysis
pass — pure driver-side plan-build cost). The OPTIMIZED plan must be
identical: CollapseProject folds the former chain into exactly the
Project the single select produces.
"""

from __future__ import annotations

import re

from pyspark.sql import Row
from pyspark.sql import functions as F

from catenae_kafka_spark.operators.asof import asof_join


def _old_asof_join(left, right, on, left_ts, right_ts, right_payload,
                   direction="backward", right_order=None):
    """The pre-r12 withColumn-chain build, verbatim (the reference)."""
    from pyspark.sql import Window

    order_cols = list(right_order or [])
    lcols = left.columns
    l = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r = right.withColumn("_side", F.lit(0)).withColumn("_ats", F.col(right_ts))
    for i, col in enumerate(order_cols):
        l = l.withColumn(f"_tb_{i}", F.lit(None).cast(right.schema[col].dataType))
        r = r.withColumn(f"_tb_{i}", F.col(col))
    for col in right_payload:
        l = l.withColumn(f"_r_{col}", F.lit(None).cast(right.schema[col].dataType))
        r = r.withColumn(f"_r_{col}", F.col(col))
    keep = (
        on
        + ["_side", "_ats"]
        + [f"_tb_{i}" for i in range(len(order_cols))]
        + [f"_r_{c}" for c in right_payload]
    )
    l_keep = l.select(*keep, *[c for c in lcols if c not in on])
    r_keep = r.select(
        *keep,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on
        ],
    )
    u = l_keep.unionByName(r_keep)
    ats = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(
            ats,
            F.col("_side").asc(),
            *[F.col(f"_tb_{i}").asc() for i in range(len(order_cols))],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *on,
        "_side",
        *[c for c in lcols if c not in on],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_payload
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_m_{c}").alias(c) for c in right_payload]
    )


def _norm_optimized(df) -> str:
    p = df._jdf.queryExecution().optimizedPlan().toString()
    return re.sub(r"#\d+", "#N", p)


def _fixtures(spark):
    clicks = spark.createDataFrame(
        [
            Row(event_id=1, user_id=10, ts=5),
            Row(event_id=2, user_id=10, ts=9),
            Row(event_id=3, user_id=11, ts=2),
        ]
    )
    purchases = spark.createDataFrame(
        [
            Row(user_id=10, p_ts=4, purchase_value=1.5, p_event_id=100),
            Row(user_id=10, p_ts=4, purchase_value=9.9, p_event_id=101),
            Row(user_id=12, p_ts=1, purchase_value=2.0, p_event_id=102),
        ]
    )
    return clicks, purchases


def _call(fn, clicks, purchases, **kw):
    return fn(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_ts", "purchase_value"],
        **kw,
    )


def test_optimized_plan_identical_backward(spark):
    clicks, purchases = _fixtures(spark)
    new = _call(asof_join, clicks, purchases, right_order=["p_event_id"])
    old = _call(_old_asof_join, clicks, purchases, right_order=["p_event_id"])
    assert _norm_optimized(new) == _norm_optimized(old)


def test_optimized_plan_identical_forward_no_order(spark):
    clicks, purchases = _fixtures(spark)
    new = _call(asof_join, clicks, purchases, direction="forward")
    old = _call(_old_asof_join, clicks, purchases, direction="forward")
    assert _norm_optimized(new) == _norm_optimized(old)


def test_values_match_reference(spark):
    clicks, purchases = _fixtures(spark)
    new = _call(asof_join, clicks, purchases, right_order=["p_event_id"])
    old = _call(_old_asof_join, clicks, purchases, right_order=["p_event_id"])
    assert new.schema == old.schema
    assert sorted(map(tuple, new.collect())) == sorted(map(tuple, old.collect()))
