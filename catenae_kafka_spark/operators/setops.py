"""Set operations (SURVEY §2B): union / intersect / except, all-variants.

Scale posture: UNION ALL is a zero-shuffle concatenation of children;
the distinct variants shuffle once on the full row. INTERSECT/EXCEPT
(ALL) compile to aggregate-based plans, not nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY


def _cust_side(c):
    return c.customer.select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("kind"),
    )


def _supp_side(c):
    return c.supplier.select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_name").alias("name"),
    )


@REGISTRY.register(
    "q_union_all",
    tags=("setop",),
    oracle="""
SELECT c_name AS name, c_nationkey AS nationkey, 'customer' AS kind FROM customer
UNION ALL
SELECT s_name AS name, s_nationkey AS nationkey, 'supplier' AS kind FROM supplier
""",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by column name (children have different column order —
    unionByName realigns, plain union would mis-zip)."""
    c = catalog(spark, sf_dir)
    return _cust_side(c).unionByName(_supp_side(c))


@REGISTRY.register(
    "q_union_distinct",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 8000
UNION
SELECT s_nationkey AS nationkey FROM supplier
""",
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct)."""
    c = catalog(spark, sf_dir)
    lhs = c.customer.filter(F.col("c_acctbal") > 8000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    rhs = c.supplier.select(F.col("s_nationkey").alias("nationkey"))
    return lhs.unionByName(rhs).distinct()


@REGISTRY.register(
    "q_intersect",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both a finished and an open order."""
    c = catalog(spark, sf_dir)
    f = c.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    o = c.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.intersect(o)


@REGISTRY.register(
    "q_intersect_all",
    tags=("setop",),
    oracle="""
SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity >= 30
INTERSECT ALL
SELECT l_orderkey AS okey FROM lineitem WHERE l_discount >= 0.05
""",
)
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, multiplicity = min of sides)."""
    c = catalog(spark, sf_dir)
    a = c.lineitem.filter(F.col("l_quantity") >= 30).select(
        F.col("l_orderkey").alias("okey")
    )
    b = c.lineitem.filter(F.col("l_discount") >= 0.05).select(
        F.col("l_orderkey").alias("okey")
    )
    return a.intersectAll(b)


@REGISTRY.register(
    "q_except",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct difference)."""
    c = catalog(spark, sf_dir)
    f = c.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    p = c.orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("custkey")
    )
    return f.subtract(p)


@REGISTRY.register(
    "q_except_all",
    tags=("setop",),
    oracle="""
SELECT l_orderkey AS okey FROM lineitem WHERE l_quantity >= 25
EXCEPT ALL
SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R'
""",
)
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference, multiplicity-aware)."""
    c = catalog(spark, sf_dir)
    a = c.lineitem.filter(F.col("l_quantity") >= 25).select(
        F.col("l_orderkey").alias("okey")
    )
    b = c.lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("okey")
    )
    return a.exceptAll(b)


@REGISTRY.register(
    "q_union_by_name",
    tags=("setop",),
    oracle="""
SELECT name, nationkey, acctbal FROM (
  SELECT c_name AS name, c_nationkey AS nationkey, NULL AS acctbal
  FROM customer
  UNION ALL BY NAME
  SELECT s_acctbal AS acctbal, s_name AS name, s_nationkey AS nationkey
  FROM supplier
)
""",
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union BY NAME with schema widening: the two sides present their
    columns in different orders and the customer side lacks acctbal —
    positional UNION would silently misalign (or reject); name-based
    union aligns by column name and null-fills the missing column
    (``allowMissingColumns``). DuckDB's UNION ALL BY NAME is the exact
    dialect twin. The everyday guard when appending heterogeneous
    extracts of an evolving schema."""
    c = catalog(spark, sf_dir)
    cust = c.customer.select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
    )
    supp = c.supplier.select(
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return cust.unionByName(supp, allowMissingColumns=True).select(
        "name", "nationkey", "acctbal"
    )
