"""UDF surface (SURVEY §2B): the declarative escape hatch that replaces
catenae's per-message ``Link.transform()``.

Preference order at scale: built-in Column expr ≫ pandas_udf (Arrow
vectorized) ≫ mapInPandas (batch iterator) ≫ never row-at-a-time Python.
Every UDF here is Arrow-batched; the oracle restates the logic in SQL,
proving the Python path computes what the declarative path would.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY


# NOTE: pandas_udf decorators parse their DDL return type against the
# active SparkSession, so UDFs are defined inside each query fn — module
# import must stay session-free (the driver imports before it has one).


@REGISTRY.register(
    "q_udf_scalar",
    tags=("udf",),
    oracle="""
SELECT o_custkey,
       ROUND((SUM(o_totalprice) / 1000.0)
             * (1.0 + LEAST(COUNT(*), 10) * 0.05), 7) AS clv
FROM orders
GROUP BY o_custkey
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized) over aggregated inputs."""
    c = catalog(spark, sf_dir)

    @F.pandas_udf("double")
    def _clv_score(total: pd.Series, n_orders: pd.Series) -> pd.Series:
        return (total / 1000.0) * (1.0 + n_orders.clip(upper=10) * 0.05)

    agg = c.orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("total"),
        F.count("*").alias("n_orders"),
    )
    return agg.select(
        "o_custkey",
        # 7dp = native precision of (2dp sum / 1000) × (2dp multiplier);
        # a 4dp round would sit exactly on .xxx50 boundaries here
        F.round(_clv_score(F.col("total"), F.col("n_orders")), 7).alias("clv"),
    )


@REGISTRY.register(
    "q_udaf_grouped",
    tags=("udf",),
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
         AS wavg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): per-group Arrow batch in,
    scalar out. Equivalent SQL proves the semantics; 4dp round absorbs
    pandas-vs-SQL summation order."""
    c = catalog(spark, sf_dir)

    @F.pandas_udf("double")
    def _weighted_avg_price(price: pd.Series, qty: pd.Series) -> float:
        denom = qty.sum()
        return float((price * qty).sum() / denom) if denom else float("nan")

    return c.lineitem.groupBy("l_returnflag").agg(
        F.round(
            _weighted_avg_price(F.col("l_extendedprice"), F.col("l_quantity")), 4
        ).alias("wavg_price")
    )


@REGISTRY.register(
    "q_udtf",
    tags=("udf",),
    oracle="""
SELECT doc_id,
       unnest(string_split(text, ' ')) AS word,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
FROM documents
WHERE doc_id < 50
""",
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table function (1 row → N rows) via mapInPandas: tokenizer
    exploding each doc into word rows, Arrow-batched."""
    c = catalog(spark, sf_dir)

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            words = pdf["text"].str.split(" ")
            n = words.map(len).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(n),
                    "word": [w for ws in words for w in ws],
                    "n_words": n.repeat(n),
                }
            )

    return (
        c.documents.filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .mapInPandas(tokenize, schema="doc_id long, word string, n_words int")
    )


@REGISTRY.register(
    "q_apply_in_pandas",
    tags=("udf",),
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
), w AS (
  SELECT o_custkey, o_orderkey, cents,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n,
         CAST(SUM(cents) OVER (PARTITION BY o_custkey) AS BIGINT) AS s
  FROM o
)
SELECT o_custkey, o_orderkey,
       ROUND((CAST(cents AS DOUBLE) * n - s) / (100.0 * n), 6)
         AS price_dev
FROM w
""",
)
def q_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-customer pandas frame in/out
    (demean each customer's order prices). The window-SQL oracle proves
    the per-group Python path matches the declarative equivalent.

    Cross-engine float discipline: x - mean(x) over raw doubles is
    summation-order-dependent (pandas pairwise-sums, DuckDB doesn't —
    an adversarial fuzz fixture landed a group mean on a 6dp half
    boundary). Both sides lift 2dp prices to exact integer cents and
    demean as (cents*n - sum_cents) / (100*n): one IEEE division of
    exact integers per row, bit-identical on both engines."""
    c = catalog(spark, sf_dir)

    def demean(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["o_custkey", "o_orderkey"]].copy()
        cents = np.floor(pdf["o_totalprice"] * 100 + 0.5).astype("int64")
        n = len(cents)
        s = int(cents.sum())
        # raw value out; rounding happens Spark-side — pandas .round is
        # half-even while SQL ROUND is half-away
        out["price_dev"] = (cents.astype("float64") * n - s) / (100.0 * n)
        return out

    return (
        c.orders.select("o_custkey", "o_orderkey", "o_totalprice")
        # pre-cluster on the group key with few partitions: the grouped-
        # map exchange then reuses this partitioning instead of fanning
        # ~1k tiny pandas groups across 32 shuffle partitions, each
        # paying Arrow/python-worker fixed cost (measured ~2x)
        .repartition(8, F.col("o_custkey"))
        .groupBy("o_custkey")
        .applyInPandas(
            demean, schema="o_custkey long, o_orderkey long, price_dev double"
        )
        .withColumn("price_dev", F.round("price_dev", 6))
    )


@REGISTRY.register(
    "q_udtf_native",
    tags=("udf",),
    oracle="""
SELECT doc_id, unnest(generate_series(1, 3)) AS piece_id,
       length(text) AS n_chars
FROM documents WHERE doc_id < 30
""",
)
def q_udtf_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native Python UDTF (@udtf): one input row → N output
    rows through the registered-table-function path (vs the
    mapInPandas formulation in q_udtf)."""
    from pyspark.sql.functions import lit, udtf

    c = catalog(spark, sf_dir)

    @udtf(returnType="doc_id: bigint, piece_id: bigint, n_chars: bigint")
    class Pieces:
        def eval(self, doc_id: int, text: str, n: int):
            for i in range(1, n + 1):
                yield doc_id, i, len(text)

    spark.udtf.register("pieces", Pieces)
    c.documents.filter(F.col("doc_id") < 30).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT p.doc_id, p.piece_id, p.n_chars "
        "FROM _udtf_docs, LATERAL pieces(doc_id, text, 3) p"
    )


@REGISTRY.register(
    "q_udf_arrow",
    tags=("udf", "arrow"),
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars
FROM documents
""",
)
def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the fastest Python escape hatch — RecordBatches flow
    straight from the JVM into pyarrow.compute kernels (C++), skipping
    the Arrow→pandas conversion mapInPandas pays. Use when the logic is
    expressible in Arrow kernels but not in Column expressions; here a
    tokenize-count proves the path end-to-end against the SQL oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    c = catalog(spark, sf_dir)

    def count_tokens(batches):
        for batch in batches:
            text = batch.column("text")
            tokens = pc.split_pattern(text, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.list_value_length(tokens), pa.int32()),
                    pc.cast(pc.utf8_length(text), pa.int32()),
                ],
                ["doc_id", "n_tokens", "n_chars"],
            )

    return c.documents.select("doc_id", "text").mapInArrow(
        count_tokens, schema="doc_id long, n_tokens int, n_chars int"
    )


@REGISTRY.register(
    "q_cogroup_pandas",
    tags=("udf",),
    oracle="""
SELECT o.o_orderkey,
       CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
       ROUND(o.o_totalprice, 2) AS total_price,
       ROUND(COALESCE(SUM(l.l_extendedprice), 0.0), 2) AS sum_line_price
FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_totalprice > 450000
GROUP BY o.o_orderkey, o.o_totalprice
""",
)
def q_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF: the two-sided Python escape hatch
    (``groupBy(k).cogroup(other.groupBy(k)).applyInPandas``) — each key's
    rows from BOTH tables arrive as two aligned pandas frames, the
    catenae analog of a transform over two joined topics. Both sides
    shuffle once on the key and Arrow-batch into Python; per-group
    logic (here order-vs-lineitem reconciliation) is free-form pandas.
    The selective order filter keeps the cogroup at reconciliation
    scale; the oracle is the equivalent join+aggregate."""
    import pandas as pd

    c = catalog(spark, sf_dir)
    orders = c.orders.filter(F.col("o_totalprice") > 450000).select(
        "o_orderkey", "o_totalprice"
    )
    lines = c.lineitem.select("l_orderkey", "l_extendedprice").join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    )
    # pre-cluster BOTH cogroup sides on the key with few partitions
    # (optimization r12, same discipline as q_apply_in_pandas above):
    # the cogroup exchange requires only ClusteredDistribution, so it
    # reuses this partitioning instead of fanning the post-filter
    # reconciliation-scale groups across all shuffle partitions, each
    # paying Arrow/python-worker fixed cost — measured 3.6 s → 1.0 s
    # at sf0.01, identical output
    orders = orders.repartition(8, F.col("o_orderkey"))
    lines = lines.repartition(8, F.col("l_orderkey"))

    def reconcile(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": odf["o_orderkey"].iloc[:1],
                "n_lines": [len(ldf)],
                "total_price": [round(float(odf["o_totalprice"].iloc[0]), 2)],
                "sum_line_price": [
                    round(float(ldf["l_extendedprice"].sum()), 2)
                ],
            }
        )

    return (
        orders.groupBy("o_orderkey")
        .cogroup(lines.groupBy("l_orderkey"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, n_lines long, total_price double, "
            "sum_line_price double",
        )
    )


@REGISTRY.register(
    "q_sql_udf",
    tags=("udf", "sql-surface"),
    oracle="""
WITH ext AS (
  SELECT l_returnflag,
         l_extendedprice * (1 - l_discount) AS disc,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
)
SELECT l_returnflag,
       CAST(SUM(CAST(FLOOR(disc) AS BIGINT)) AS BIGINT) AS revenue,
       CAST(SUM(CASE WHEN qty BETWEEN 10 AND 40 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_midrange
FROM ext GROUP BY l_returnflag
""",
)
def q_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDFs (CREATE TEMPORARY FUNCTION ... RETURN
    expr) — the catalog-registered, pure-SQL user function surface.
    Unlike the Python/pandas UDFs above, a SQL UDF body is INLINED by
    the analyzer into the calling plan, so it costs nothing at
    runtime: predicates through it still push down and codegen still
    fuses it. Two functions are defined and used in one aggregate
    (a double expression and an integer band predicate); the oracle
    is the same logic with the functions expanded by hand — proving
    the inlining preserves semantics.

    Scale shape: identical to writing the expressions inline — one
    map-side-combinable aggregate over the fact scan."""
    from catenae_kafka_spark.catalog import register_views

    register_views(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE,"
        " d DOUBLE) RETURNS DOUBLE RETURN p * (1 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION in_band(q BIGINT,"
        " lo BIGINT, hi BIGINT) RETURNS INT"
        " RETURN CASE WHEN q BETWEEN lo AND hi THEN 1 ELSE 0 END"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(CAST(FLOOR(disc_price(l_extendedprice,
                                              l_discount)) AS BIGINT))
                    AS BIGINT) AS revenue,
               CAST(SUM(in_band(CAST(l_quantity AS BIGINT), 10, 40))
                    AS BIGINT) AS n_midrange
        FROM lineitem GROUP BY l_returnflag
        """
    )
