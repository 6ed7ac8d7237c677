"""Projection / filter / conditional operators (SURVEY §2B).

Catenae analog: the map/filter half of ``Link.transform()`` — per-message
Python that set or dropped fields. Here each is a declarative Column
expression, so Catalyst pushes predicates and prunes columns into the
parquet scan (verify: PushedFilters/ReadSchema in ``.explain``); at
100 TB only the referenced columns and matching row groups are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY


@REGISTRY.register(
    "q_project",
    tags=("projection",),
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_up,
       ROUND(p_retailprice * 1.1, 4) AS price_up,
       p_brand || ':' || p_type AS brand_type,
       p_size + 100 AS size_off
FROM part
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection, aliasing, computed columns."""
    c = catalog(spark, sf_dir)
    return c.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_up"),
        F.round(F.col("p_retailprice") * 1.1, 4).alias("price_up"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        (F.col("p_size") + 100).alias("size_off"),
    )


@REGISTRY.register(
    "q_filter_pred",
    tags=("filter",),
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
FROM lineitem
WHERE l_quantity BETWEEN 5 AND 30
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND (l_discount < 0.03 OR l_tax > 0.04)
  AND l_linestatus = 'F'
""",
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, IN, BETWEEN, range compare."""
    c = catalog(spark, sf_dir)
    li = c.lineitem
    return li.filter(
        F.col("l_quantity").between(5, 30)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1996-01-01")
        & ((F.col("l_discount") < 0.03) | (F.col("l_tax") > 0.04))
        & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_discount")


@REGISTRY.register(
    "q_filter_like_null",
    tags=("filter",),
    oracle="""
SELECT p_partkey, p_type,
       NULLIF(p_brand, 'Brand#1') AS brand_or_null
FROM part
WHERE p_type LIKE '%O%' AND p_name IS NOT NULL
  AND NULLIF(p_brand, 'Brand#1') IS DISTINCT FROM 'Brand#2'
""",
)
def q_filter_like_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE, IS NULL / null-safe equality (<=>), NULLIF."""
    c = catalog(spark, sf_dir)
    brand_or_null = F.nullif(F.col("p_brand"), F.lit("Brand#1"))
    return (
        c.part.filter(
            F.col("p_type").like("%O%")
            & F.col("p_name").isNotNull()
            & ~brand_or_null.eqNullSafe(F.lit("Brand#2"))
        ).select("p_partkey", "p_type", brand_or_null.alias("brand_or_null"))
    )


@REGISTRY.register(
    "q_case_when",
    tags=("projection",),
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS band,
       CASE o_orderstatus WHEN 'F' THEN 'final' WHEN 'O' THEN 'open'
            ELSE 'other' END AS status_word,
       COALESCE(NULLIF(o_orderpriority, '3-MEDIUM'), 'default') AS prio
FROM orders
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN conditional projection + COALESCE/NULLIF."""
    c = catalog(spark, sf_dir)
    return c.orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
        .alias("band"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_word"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")), F.lit("default")
        ).alias("prio"),
    )
