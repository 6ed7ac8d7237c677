"""Sort / limit / top-k operators (SURVEY §2B).

Scale posture: ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject — each partition keeps a k-row heap and only k·p
rows reach the driver, never a full global sort. Verify in ``.explain``.
A unique tiebreaker column keeps limit cuts deterministic across
engines (ties at the boundary would otherwise be an arbitrary subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY


@REGISTRY.register(
    "q_sort_limit",
    tags=("sort",),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (TakeOrderedAndProject, not a full sort)."""
    c = catalog(spark, sf_dir)
    return (
        c.orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@REGISTRY.register(
    "q_sort_multi",
    tags=("sort",),
    oracle="""
SELECT o_orderkey, o_orderstatus, prio_or_null, o_totalprice
FROM (
  SELECT o_orderkey, o_orderstatus, o_totalprice,
         NULLIF(o_orderpriority, '3-MEDIUM') AS prio_or_null
  FROM orders
)
ORDER BY o_orderstatus ASC,
         prio_or_null DESC NULLS LAST,
         o_totalprice ASC,
         o_orderkey ASC
LIMIT 100
""",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort: asc/desc mix, NULLS LAST, deterministic via
    unique tiebreaker + limit."""
    c = catalog(spark, sf_dir)
    return (
        c.orders.withColumn(
            "prio_or_null", F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM"))
        )
        .orderBy(
            F.col("o_orderstatus").asc(),
            F.col("prio_or_null").desc_nulls_last(),
            F.col("o_totalprice").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
        .select("o_orderkey", "o_orderstatus", "prio_or_null", "o_totalprice")
    )
