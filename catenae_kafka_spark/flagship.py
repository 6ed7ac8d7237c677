"""Flagship query: revenue by nation (TPC-H Q5 shape).

lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with a date-range filter,
revenue = sum(l_extendedprice * (1 - l_discount)) grouped by nation —
one query exercising scan → filter → join×4 → agg → sort end-to-end.

Scale notes: the two fact tables (lineitem, orders) shuffle-join on
orderkey; every dimension (customer, nation, region) is broadcast so the
star lookups never shuffle the fact side. The shipdate filter and the
5-column projection push down into the parquet scan (verify:
``.explain`` shows PushedFilters + pruned ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY, QuerySpec


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = catalog(spark, sf_dir)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.lineitem.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(c.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            # Round at the data's native precision (2dp price × 2dp
            # discount → exact 4dp products): a 4dp round never sits on a
            # rounding boundary, so engine-specific float summation order
            # cannot flip the hashed value. 2dp would (sum may be ….xx5).
            F.round(F.sum(revenue), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc())
    )


FLAGSHIP_ORACLE = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
ORDER BY revenue DESC
"""

REGISTRY.add(
    QuerySpec(
        name="q_flagship_revenue",
        fn=flagship,
        oracle=FLAGSHIP_ORACLE,
        tags=("flagship", "join", "agg"),
        bench=True,
        doc="Revenue by nation: scan→filter→join×4→agg→sort (TPC-H Q5 shape).",
    )
)
