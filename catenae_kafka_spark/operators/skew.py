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


@REGISTRY.register(
    "q_join_bucketed",
    tags=("join", "bucketing"),
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
""",
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join: both sides pre-bucketed on the join key
    at write time (``bucketBy``), so the join itself reads co-located
    buckets with NO shuffle — the shuffle-once layout that amortizes a
    100 TB fact table's exchange across every later join. Result is
    identical to the plain join (the oracle). The zero-Exchange plan
    property is asserted in tests/test_bucketing.py."""
    import hashlib
    import shutil

    c = catalog(spark, sf_dir)
    tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:8]
    li_name, ord_name = f"li_bkt_{tag}", f"ord_bkt_{tag}"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (li_name, ord_name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        c.lineitem.select("l_orderkey", "l_quantity")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(li_name)
    )
    (
        c.orders.select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(ord_name)
    )
    li, od = spark.table(li_name), spark.table(ord_name)
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
    )


@REGISTRY.register(
    "q_agg_salted",
    tags=("agg", "skew"),
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value,
       ROUND(SUM(value) / COUNT(*), 6) AS avg_value
FROM events GROUP BY event_type
""",
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for pathologically hot group keys
    (event_type has ~6 values over ALL rows — at 100 TB each final
    reducer would receive billions of rows without Spark's partial
    aggregation; salting makes the two-phase shape explicit and also
    covers aggregates Spark cannot partially compute in one step).
    Phase 1 groups by (key, salt-of-row) into 16 partials per key;
    phase 2 merges the 16 partial rows per key. avg is recomposed as
    merged-sum / merged-count — never avg-of-avg.

    Results are identical to the plain groupBy (the oracle IS the
    plain GROUP BY); the salt is derived from event_id (deterministic),
    not rand(), so re-execution of a failed task cannot re-salt rows
    differently mid-shuffle."""
    c = catalog(spark, sf_dir)
    salted = c.events.withColumn("_salt", (F.col("event_id") % 16).cast("int"))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count("*").alias("pn"),
        F.sum("value").alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum"), 4).alias("sum_value"),
        F.round(F.sum("psum") / F.sum("pn"), 6).alias("avg_value"),
    )


@REGISTRY.register(
    "q_skew_report",
    tags=("skew", "dataops"),
    oracle="""
WITH per_key AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_key_rows,
       quantile_cont(n, 0.5) AS p50_key_rows,
       quantile_cont(n, 0.99) AS p99_key_rows,
       CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / COUNT(*))
         AS skew_ratio
FROM per_key
""",
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/shuffle-key skew audit — the diagnostic you run BEFORE
    pointing a 1000-executor shuffle at a key: per-key row counts
    reduced to max / avg / p50 / p99 and a max-over-mean skew ratio.
    A ratio near 1 means hash partitioning balances; >>1 means the
    hot key needs salting (q_join_salted) or AQE skew splitting.

    Two-phase: per-key counts are a map-side-combined groupBy; the
    summary aggregates the (distinct-key-sized, not row-sized) count
    table. Exact percentiles over BIGINT counts interpolate with the
    same R-7 rule in Spark (`percentile`) and DuckDB (`quantile_cont`),
    so the audit hash-matches.
    """
    c = catalog(spark, sf_dir)
    per_key = c.lineitem.groupBy("l_partkey").agg(F.count("*").alias("n"))
    return per_key.agg(
        F.sum("n").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_key_rows"),
        (F.sum("n").cast("double") / F.count("*")).alias("avg_key_rows"),
        F.expr("percentile(n, 0.5)").alias("p50_key_rows"),
        F.expr("percentile(n, 0.99)").alias("p99_key_rows"),
        (
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.count("*"))
        ).alias("skew_ratio"),
    )
