"""The remaining TPC-H query shapes (Q4, Q6–Q10, Q12–Q14, Q16, Q18–Q20).

With decorrelated.py (Q2/Q11/Q15/Q17/Q21/Q22) and the existing
composites (Q1 = q_agg_groupby, Q3 = q_top_unshipped, Q5 =
q_flagship_revenue), this module completes coverage of ALL 22 TPC-H
query shapes, adapted to the fixture schema (no partsupp /
receiptdate / commitdate / shipmode — each query keeps its benchmark's
plan topology on the columns that exist; adaptations are noted per
query).

Every query here is dialect-shared SQL: the SAME text is executed by
Spark (spark.sql) and DuckDB (the oracle), so the pair cannot drift.
Scale notes: these shapes exercise exactly the machinery the engine
already plan-tests — broadcast dim joins, semi/anti decorrelation,
two-phase aggregation, conditional aggregation, top-k — none
introduces a new physical pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from catenae_kafka_spark.catalog import register_views
from catenae_kafka_spark.registry import REGISTRY

_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate < TIMESTAMP '1995-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority
"""

_Q6 = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

_Q8 = """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
             / SUM(volume), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
"""

_Q9 = """
SELECT nation, o_year,
       CAST(SUM(amount_e4) AS DOUBLE) / 10000 AS sum_profit
FROM (
  SELECT n_name AS nation,
         EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(FLOOR((l_extendedprice * (1 - l_discount)
             - p_retailprice * 0.6 * l_quantity) * 10000 + 0.5)
           AS BIGINT) AS amount_e4
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""

_Q10 = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                           + 0.5) AS BIGINT)) AS DOUBLE) / 10000
         AS revenue,
       ROUND(c_acctbal, 2) AS c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-07-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                        + 0.5) AS BIGINT)) DESC, c_custkey
LIMIT 20
"""

_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""

_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""

_Q14 = """
SELECT ROUND(100.0
         * SUM(CASE WHEN p_type = 'PROMO'
                    THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
         / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1995-04-01'
"""

_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""

_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(SUM(l_quantity), 1) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
"""

_Q19 = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

_Q20 = """
WITH pq AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY l_partkey, l_suppkey
), pt AS (
  SELECT l_partkey, SUM(sq) AS tq FROM pq GROUP BY l_partkey
)
SELECT DISTINCT s_suppkey, s_name
FROM supplier
JOIN pq ON s_suppkey = pq.l_suppkey
JOIN pt ON pq.l_partkey = pt.l_partkey
WHERE pq.sq > 0.5 * pt.tq
"""

_SUITE: dict[str, tuple[str, str, tuple[str, ...]]] = {
    # name -> (sql, adaptation note, tables)
    "q_tpch_q4": (
        _Q4,
        "late-commit proxied by shipdate > orderdate + 90d (no "
        "receipt/commit dates); EXISTS -> semi join",
        ("orders", "lineitem"),
    ),
    "q_tpch_q6": (_Q6, "verbatim shape", ("lineitem",)),
    "q_tpch_q7": (
        _Q7,
        "verbatim shape (two-nation volume, both directions)",
        ("supplier", "lineitem", "orders", "customer", "nation"),
    ),
    "q_tpch_q8": (
        _Q8,
        "market share via conditional-sum ratio; p_type stands in "
        "for the part-type filter",
        ("lineitem", "part", "orders", "customer", "nation", "region",
         "supplier"),
    ),
    "q_tpch_q9": (
        _Q9,
        "supply cost proxied by p_retailprice * 0.6 (no partsupp); "
        "per-row profit lifted to exact 1e-4 integer units before the "
        "SUM — a multi-row double sum is summation-order-dependent "
        "and ROUND(...,2) flipped a half-cent boundary between "
        "engines on an adversarial fuzz fixture",
        ("lineitem", "part", "supplier", "orders", "nation"),
    ),
    "q_tpch_q10": (
        _Q10,
        "verbatim shape (returned-item top-20; custkey tiebreak for "
        "a deterministic LIMIT); revenue lifted to exact 1e-4 integer "
        "units before the SUM — same summation-order discipline as Q9",
        ("customer", "orders", "lineitem", "nation"),
    ),
    "q_tpch_q12": (
        _Q12,
        "shipmode proxied by l_returnflag",
        ("orders", "lineitem"),
    ),
    "q_tpch_q13": (
        _Q13,
        "comment-filter proxied by order priority",
        ("customer", "orders"),
    ),
    "q_tpch_q14": (_Q14, "PROMO type is native to the fixture", ("lineitem", "part")),
    "q_tpch_q16": (
        _Q16,
        "supplier complaints proxied by negative acctbal; NOT IN -> "
        "null-aware anti join",
        ("lineitem", "part", "supplier"),
    ),
    "q_tpch_q18": (
        _Q18,
        "verbatim shape (integer-valued quantities make the HAVING "
        "threshold float-exact)",
        ("customer", "orders", "lineitem"),
    ),
    "q_tpch_q19": (
        _Q19,
        "disjunctive brand/size/quantity predicates (no container/"
        "shipinstruct)",
        ("lineitem", "part"),
    ),
    "q_tpch_q20": (
        _Q20,
        "available-stock proxied by majority share of a part's "
        "shipped volume (no partsupp); exact because quantities are "
        "integer-valued doubles",
        ("supplier", "lineitem"),
    ),
}


def _make(name: str, sql: str, note: str, tables: tuple[str, ...]):
    def _q(spark: SparkSession, sf_dir: str, _sql=sql, _tables=tables) -> DataFrame:
        register_views(spark, sf_dir, _tables)
        return spark.sql(_sql)

    _q.__name__ = name
    _q.__doc__ = (
        f"TPC-H {name.split('_')[-1].upper()} shape; {note}. "
        "Dialect-shared SQL: the oracle is the identical text."
    )
    # register AFTER the docstring is set so the spec records it
    return REGISTRY.register(name, tags=("tpch",), oracle=sql)(_q)


for _name, (_sql, _note, _tables) in _SUITE.items():
    _make(_name, _sql, _note, _tables)
