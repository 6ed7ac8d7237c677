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


@REGISTRY.register(
    "q_keyset_pagination",
    tags=("sort", "serving"),
    oracle="""
WITH ranked AS (
  SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           AS cents
  FROM orders
), page2_cursor AS (
  -- the cursor is the LAST row of page 2 under (cents, key) order
  SELECT cents, o_orderkey FROM ranked
  ORDER BY cents, o_orderkey LIMIT 1 OFFSET 99
)
SELECT r.o_orderkey, r.cents
FROM ranked r, page2_cursor c
WHERE (r.cents, r.o_orderkey) > (c.cents, c.o_orderkey)
ORDER BY r.cents, r.o_orderkey
LIMIT 50
""",
)
def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (cursor) pagination: page 3 of the order list fetched by
    the COMPOSITE-KEY predicate (cents, key) > cursor instead of
    OFFSET 100 — the serving-layer pattern that stays O(page) while
    OFFSET re-sorts and discards everything before it (and, unlike
    OFFSET, is stable under concurrent inserts before the cursor).
    The unique key in the cursor tuple is what makes pages gap-free
    and overlap-free under duplicate sort values.

    Exact: the row-value comparison is integer tuple ordering; page
    boundaries are deterministic under the total (cents, key) order.

    Scale shape: the cursor predicate pushes into the scan
    (min/max pruning skips every earlier file); TakeOrdered(50)
    replaces a global sort."""
    c = catalog(spark, sf_dir)
    ranked = c.orders.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cursor = (
        ranked.orderBy("cents", "o_orderkey")
        .limit(100)
        .orderBy(F.col("cents").desc(), F.col("o_orderkey").desc())
        .limit(1)
        .select(F.col("cents").alias("cc"), F.col("o_orderkey").alias("ck"))
    )
    return (
        ranked.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("cents") > F.col("cc"))
            | ((F.col("cents") == F.col("cc")) & (F.col("o_orderkey") > F.col("ck")))
        )
        .orderBy("cents", "o_orderkey")
        .limit(50)
        .select("o_orderkey", "cents")
    )
