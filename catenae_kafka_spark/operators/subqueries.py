"""Subquery operators: scalar, IN, correlated EXISTS, lateral.

Catalyst decorrelates these into joins (SURVEY §4.2) — the point of
registering them is to pin that the engine's SQL surface handles the
full subquery family and that decorrelation yields join plans, not
per-row re-execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog, register_views
from catenae_kafka_spark.registry import REGISTRY


@REGISTRY.register(
    "q_subquery_scalar",
    tags=("subquery",),
    oracle="""
SELECT o_orderkey, o_totalprice,
       ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4)
         AS dev_from_mean
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
""",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in both projection and predicate (evaluated once,
    broadcast — not per-row)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 4)
                 AS dev_from_mean
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders) * 1.5
        """
    )


@REGISTRY.register(
    "q_subquery_in",
    tags=("subquery",),
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (
  SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
""",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → semi join after decorrelation."""
    register_views(spark, sf_dir, ("customer", "nation", "region"))
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        )
        """
    )


@REGISTRY.register(
    "q_subquery_correlated",
    tags=("subquery",),
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
""",
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer average) — decorrelated
    into an aggregate + join, executed once, not per outer row."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM orders o
        WHERE o_totalprice > 2 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


@REGISTRY.register(
    "q_lateral_explode",
    tags=("subquery", "lateral"),
    oracle="""
SELECT doc_id, t.word AS word
FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(word)
WHERE doc_id < 20
""",
)
def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode (1→N correlated expansion)."""
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        """
        SELECT doc_id, word
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS word
        WHERE doc_id < 20
        """
    )


@REGISTRY.register(
    "q_not_in_nulls",
    tags=("subquery", "semantics"),
    oracle="""
SELECT 'with_nulls' AS variant, CAST(COUNT(*) AS BIGINT) AS n
FROM customer
WHERE c_nationkey NOT IN (
  SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END
  FROM supplier
)
UNION ALL
SELECT 'null_free' AS variant, CAST(COUNT(*) AS BIGINT) AS n
FROM customer
WHERE c_nationkey NOT IN (
  SELECT s_nationkey FROM supplier WHERE s_acctbal >= 0
)
""",
)
def q_not_in_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN under tri-valued logic — the classic SQL trap pinned as a
    semantic contract: a NULL in the subquery result makes `x NOT IN
    (...)` UNKNOWN for every x, so rows only survive against the
    non-null complement. Both variants are emitted side by side: the
    null-containing subquery collapses to 0 matches, the null-free one
    returns the real anti-join count — both engines must agree on
    both.
    Catalyst plans this as a null-aware anti join — single-key
    special case, one shuffle — not a per-row subquery."""
    register_views(spark, sf_dir, ("customer", "supplier"))
    return spark.sql(
        """
        SELECT 'with_nulls' AS variant, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        WHERE c_nationkey NOT IN (
          SELECT CASE WHEN s_acctbal < 0 THEN NULL ELSE s_nationkey END
          FROM supplier
        )
        UNION ALL
        SELECT 'null_free' AS variant, CAST(COUNT(*) AS BIGINT) AS n
        FROM customer
        WHERE c_nationkey NOT IN (
          SELECT s_nationkey FROM supplier WHERE s_acctbal >= 0
        )
        """
    )


@REGISTRY.register(
    "q_distinct_on",
    tags=("subquery", "dialect"),
    oracle="""
SELECT DISTINCT ON (o_custkey)
       o_custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice
FROM orders
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
""",
)
def q_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest order per customer — DuckDB/Postgres spell it DISTINCT ON,
    Spark spells it row_number() = 1; this query pins that the two are
    the same operator (deterministic under the full tiebreak). The
    Spark plan is the WindowGroupLimit per-group-heap shape, not a full
    sort."""
    from pyspark.sql import Window

    c = catalog(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        c.orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
    )
