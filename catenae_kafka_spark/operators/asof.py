"""As-of and range/interval joins (SURVEY §2B + §4.3).

Spark has no native ASOF or interval join. Both are implemented as
compositions of built-in operators chosen for their 100 TB behavior:

- ``asof_join``: union-both-sides + window ``last(..., ignorenulls)`` —
  ONE shuffle on the join key, a per-key sort, zero row explosion.
  The naive alternative (theta join ``l.ts >= r.ts`` then max-per-left)
  materializes O(n·m) pairs per key; the union-window form is the
  merge-join an engine like DuckDB runs natively for ASOF.
- ``interval_join``: bucketize the time axis — explode each interval
  into the buckets it covers (intervals here are bounded, so the
  per-interval bucket count is a small constant), equi-join points on
  bucket, then apply the residual range predicate. Turns a
  broadcast-nested-loop into a shuffled hash join that scales linearly;
  bucket_width should be chosen ≈ the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import REGISTRY


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
    right_order: list[str] | None = None,
) -> DataFrame:
    """As-of join: for each left row, the right row with the greatest
    ``right_ts <= left_ts`` (``direction="backward"``) or the smallest
    ``right_ts >= left_ts`` (``direction="forward"``) within the same
    ``on`` key group.

    Returns all left columns plus ``right_payload`` columns (null when
    no matching right row exists). Single shuffle on ``on``; forward is
    the same merge-scan with the time axis walked in reverse (window
    ordered descending), not a second algorithm.

    ``right_order``: optional right-side tiebreak columns. When several
    right rows share the boundary ``right_ts``, the match is otherwise
    NONDETERMINISTIC (the window's last-write-wins depends on partition
    order — surfaced by an adversarial fuzz fixture with duplicate
    (key, ts) pairs). With ``right_order``, the row with the GREATEST
    tiebreak tuple wins, deterministically; pass a unique column (an
    event id) for full determinism.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    order_cols = list(right_order or [])
    lcols = left.columns
    # Each side is aligned in ONE select, not a withColumn chain: every
    # withColumn is a full eager analysis pass over the growing plan
    # (~10 passes / ~0.2 s of q_join_asof's sf0.1 plan-build, r12 opt,
    # guide §5). Same columns in the same order as the former
    # withColumn+select chain — CollapseProject made the optimized plan
    # identical either way (pinned by tests/test_asof_build_parity.py).
    l_keep = left.select(
        *on,
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ats"),
        *[
            F.lit(None).cast(right.schema[col].dataType).alias(f"_tb_{i}")
            for i, col in enumerate(order_cols)
        ],
        *[
            F.lit(None).cast(right.schema[col].dataType).alias(f"_r_{col}")
            for col in right_payload
        ],
        *[c for c in lcols if c not in on],
    )
    r_keep = right.select(
        *on,
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ats"),
        *[F.col(col).alias(f"_tb_{i}") for i, col in enumerate(order_cols)],
        *[F.col(col).alias(f"_r_{col}") for col in right_payload],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in on
        ],
    )
    u = l_keep.unionByName(r_keep)
    # right rows (side=0) sort before left rows at equal ts → inclusive
    # <= (backward) / >= (forward: time axis walked descending)
    ats = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    # tiebreak columns sort ascending AFTER _side, so among right rows
    # at the boundary ts the greatest tiebreak tuple is written last
    # and last(ignorenulls) picks it; left rows (side=1, null _tb)
    # still sort after every tied right row
    w = (
        Window.partitionBy(*on)
        .orderBy(
            ats,
            F.col("_side").asc(),
            *[F.col(f"_tb_{i}").asc() for i in range(len(order_cols))],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *on,
        "_side",
        *[c for c in lcols if c not in on],
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_payload
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_m_{c}").alias(c) for c in right_payload]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_expr: Column,
    lo_expr: Column,
    hi_expr: Column,
    bucket_width: int,
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi``, via time-bucket equi-join + residual filter.

    ``point_expr``/``lo_expr``/``hi_expr`` must be integer-valued (e.g.
    epoch seconds). Output: all columns of both inputs.
    """
    p = points.withColumn("_p", point_expr).withColumn(
        "_bucket", F.floor(F.col("_p") / bucket_width)
    )
    i = (
        intervals.withColumn("_lo", lo_expr)
        .withColumn("_hi", hi_expr)
        .withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("_lo") / bucket_width),
                    F.floor((F.col("_hi") - 1) / bucket_width),
                )
            ),
        )
    )
    joined = p.join(i, "_bucket").filter(
        (F.col("_p") >= F.col("_lo")) & (F.col("_p") < F.col("_hi"))
    )
    return joined.drop("_bucket", "_p", "_lo", "_hi")


@REGISTRY.register(
    "q_join_asof",
    tags=("join", "asof"),
    bench=True,
    oracle="""
WITH p AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id AS event_id, c.user_id AS user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_s,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts >= p.ts
""",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest prior purchase for every click, per user.

    Tie semantics (both sides): among simultaneous purchases the
    highest event_id wins — the oracle tie-dedups via arg_max before
    its native ASOF, the Spark scan tiebreaks in-window via
    right_order (no extra shuffle)."""
    c = catalog(spark, sf_dir)
    ev = c.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_ts", "purchase_value"],
        right_order=["p_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts_s"),
        "purchase_value",
    )


@REGISTRY.register(
    "q_join_asof_forward",
    tags=("join", "asof"),
    oracle="""
WITH p AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id AS event_id, c.user_id AS user_id,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_s,
       p.value AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN p
  ON c.user_id = p.user_id AND c.ts <= p.ts
""",
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: EARLIEST subsequent purchase for every click,
    per user — the event-attribution direction (what did this click lead
    to). Same single-shuffle merge-scan as backward, time axis
    reversed. Same tie semantics as q_join_asof: highest event_id wins
    among simultaneous purchases (arg_max dedup in the oracle,
    right_order in the scan)."""
    c = catalog(spark, sf_dir)
    ev = c.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_ts", "purchase_value"],
        direction="forward",
        right_order=["p_event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts_s"),
        "purchase_value",
    )


@REGISTRY.register(
    "q_join_asof_tolerance",
    tags=("join", "asof"),
    oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT c.event_id, p.ts AS p_ts, p.value AS p_value,
         ROW_NUMBER() OVER (PARTITION BY c.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM c JOIN p ON c.user_id = p.user_id
   AND p.ts <= c.ts AND p.ts >= c.ts - INTERVAL 7 DAY
)
SELECT c.event_id AS event_id, c.user_id AS user_id,
       STRFTIME(m.p_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_s,
       m.p_value AS purchase_value
FROM c LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (event_id)
""",
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof's
    ``tolerance``): latest prior purchase per click, but only if it is
    at most 7 days old — older matches are nulled out, the row is kept.
    Implemented as the single-shuffle backward merge-scan followed by a
    map-side tolerance mask: the latest prior match being out of
    tolerance implies NO in-tolerance match exists, so masking is exact
    (no second scan, no row explosion). Ties (simultaneous purchases)
    break to the highest event_id on both sides — without the tiebreak
    the match is nondeterministic (found by the adversarial fuzz
    fixture's duplicate (user, ts) pairs)."""
    c = catalog(spark, sf_dir)
    ev = c.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="p_ts",
        right_payload=["p_ts", "purchase_value"],
        right_order=["p_event_id"],
    )
    within = F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    return out.select(
        "event_id",
        "user_id",
        F.when(within, F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss")).alias(
            "purchase_ts_s"
        ),
        F.when(within, F.col("purchase_value")).alias("purchase_value"),
    )


@REGISTRY.register(
    "q_join_range",
    tags=("join", "range"),
    oracle="""
SELECT o_orderkey, COUNT(*) AS n_in_window
FROM orders JOIN lineitem
  ON l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 3 DAY
WHERE o_orderdate >= TIMESTAMP '1995-03-01'
  AND o_orderdate < TIMESTAMP '1995-04-01'
GROUP BY o_orderkey
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: lineitems shipped within 3 days of (any) March-1995
    order's date — bucketed equi-join, not a nested loop."""
    c = catalog(spark, sf_dir)
    day = 86400
    orders = c.orders.filter(
        (F.col("o_orderdate") >= "1995-03-01") & (F.col("o_orderdate") < "1995-04-01")
    ).select("o_orderkey", "o_orderdate")
    points = c.lineitem.select("l_orderkey", "l_linenumber", "l_shipdate")
    joined = interval_join(
        points,
        orders,
        point_expr=F.unix_timestamp("l_shipdate"),
        lo_expr=F.unix_timestamp("o_orderdate"),
        hi_expr=F.unix_timestamp("o_orderdate") + 3 * day,
        bucket_width=3 * day,
    )
    return joined.groupBy("o_orderkey").agg(F.count("*").alias("n_in_window"))


@REGISTRY.register(
    "q_join_asof_nearest",
    tags=("join", "asof"),
    oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
b AS (
  SELECT c.event_id, c.user_id, c.ts AS c_ts, p.ts AS b_ts, p.value AS b_val
  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
), f AS (
  SELECT c.event_id, p.ts AS f_ts, p.value AS f_val
  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT b.event_id, b.user_id,
       CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
            WHEN b_ts IS NULL THEN STRFTIME(f_ts, '%Y-%m-%d %H:%M:%S')
            WHEN f_ts IS NULL THEN STRFTIME(b_ts, '%Y-%m-%d %H:%M:%S')
            WHEN (c_ts - b_ts) <= (f_ts - c_ts)
              THEN STRFTIME(b_ts, '%Y-%m-%d %H:%M:%S')
            ELSE STRFTIME(f_ts, '%Y-%m-%d %H:%M:%S') END AS purchase_ts_s,
       CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
            WHEN b_ts IS NULL THEN f_val
            WHEN f_ts IS NULL THEN b_val
            WHEN (c_ts - b_ts) <= (f_ts - c_ts) THEN b_val
            ELSE f_val END AS purchase_value
FROM b JOIN f ON b.event_id = f.event_id
""",
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof
    direction='nearest'): each click matches its temporally CLOSEST
    purchase, before or after, ties to the earlier one. Composed as
    the backward and forward merge-scans (each one shuffle) joined on
    the probe key — completing the as-of family
    (backward/forward/tolerance/nearest). Simultaneous-purchase ties
    break to the highest event_id in both scans (arg_max dedup in the
    oracle, right_order here)."""
    c = catalog(spark, sf_dir)
    ev = c.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id").alias("p_event_id"),
    )
    back = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="p_ts",
        right_payload=["p_ts", "purchase_value"],
        right_order=["p_event_id"],
    ).select(
        "event_id", "user_id", "ts",
        F.col("p_ts").alias("b_ts"), F.col("purchase_value").alias("b_val"),
    )
    fwd = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="p_ts",
        right_payload=["p_ts", "purchase_value"], direction="forward",
        right_order=["p_event_id"],
    ).select(
        F.col("event_id").alias("f_event_id"),
        F.col("p_ts").alias("f_ts"), F.col("purchase_value").alias("f_val"),
    )
    j = back.join(fwd, back.event_id == fwd.f_event_id)
    # full µs precision (timestamp→double = fractional epoch seconds):
    # unix_timestamp truncates to whole seconds and could pick the
    # other direction than the oracle's interval comparison when the
    # sub-second parts of the two gaps differ
    b_gap = F.col("ts").cast("double") - F.col("b_ts").cast("double")
    f_gap = F.col("f_ts").cast("double") - F.col("ts").cast("double")
    pick_b = (
        F.col("f_ts").isNull()
        | (F.col("b_ts").isNotNull() & (b_gap <= f_gap))
    )
    fmt = "yyyy-MM-dd HH:mm:ss"
    return j.select(
        "event_id",
        "user_id",
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None))
        .when(pick_b, F.date_format("b_ts", fmt))
        .otherwise(F.date_format("f_ts", fmt))
        .alias("purchase_ts_s"),
        F.when(F.col("b_ts").isNull() & F.col("f_ts").isNull(), F.lit(None))
        .when(pick_b, F.col("b_val"))
        .otherwise(F.col("f_val"))
        .alias("purchase_value"),
    )


@REGISTRY.register(
    "q_interpolate",
    tags=("asof", "timeseries"),
    oracle="""
WITH b AS MATERIALIZED (
  SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
         date_trunc('hour', MAX(ts)) AS hi
  FROM events GROUP BY user_id
), grid AS MATERIALIZED (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS gt
  FROM b
), e2 AS MATERIALIZED (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events GROUP BY user_id, ts
), bwd AS MATERIALIZED (
  SELECT g.user_id, g.gt, e.ts AS t0, e.value AS y0
  FROM grid g ASOF JOIN e2 e
    ON g.user_id = e.user_id AND g.gt >= e.ts
), fwd AS MATERIALIZED (
  SELECT g.user_id, g.gt, e.ts AS t1, e.value AS y1
  FROM grid g ASOF JOIN e2 e
    ON g.user_id = e.user_id AND g.gt < e.ts
)
SELECT w.user_id, STRFTIME(w.gt, '%Y-%m-%d %H:%M:%S') AS grid_ts,
       CAST(floor((y0 + (y1 - y0)
         * (epoch(date_trunc('second', w.gt)) - epoch(date_trunc('second', t0)))
         / (epoch(date_trunc('second', t1)) - epoch(date_trunc('second', t0))))
         * 1000000) AS BIGINT) AS v_micro
FROM bwd w JOIN fwd f ON w.user_id = f.user_id AND w.gt = f.gt
""",
)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation resampling onto a regular hourly grid — the
    time-series twin of forward-fill (LOCF keeps a stale value;
    interpolation estimates the in-between). Each user's grid point
    brackets its neighbors via the backward and forward as-of
    merge-scans (one user_id shuffle each) and lerps between them;
    boundary points without both neighbors are dropped, and a grid
    point landing exactly on a reading degenerates to that reading
    (the forward neighbor ties back to it). Simultaneous readings
    (duplicate (user, ts)) resolve to the highest event_id on both
    sides — arg_max dedup in the oracle, right_order in the scans."""
    c = catalog(spark, sf_dir)
    bounds = c.events.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("gt"),
    )
    readings = c.events.select(
        "user_id",
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_v"),
        F.col("event_id").alias("r_eid"),
    )
    bwd = asof_join(
        grid, readings, on=["user_id"], left_ts="gt", right_ts="r_ts",
        right_payload=["r_ts", "r_v"], right_order=["r_eid"],
    ).select(
        "user_id", "gt", F.col("r_ts").alias("t0"), F.col("r_v").alias("y0")
    )
    # STRICT forward neighbor (t1 > gt), matching the oracle's
    # g.gt < e.ts exactly: probe the inclusive forward merge-scan at
    # gt + 1µs (timestamps are µs resolution, so >= gt+1µs ≡ > gt).
    # An inclusive probe at gt itself would return the reading AT a
    # grid point landing on one — a degenerate t1 == t0 bracket the
    # oracle never produces (it brackets on to the NEXT reading).
    grid_eps = grid.withColumn(
        "gt_eps", F.col("gt") + F.expr("INTERVAL 1 MICROSECOND")
    )
    fwd = asof_join(
        grid_eps.select("user_id", "gt", "gt_eps"),
        readings, on=["user_id"], left_ts="gt_eps", right_ts="r_ts",
        right_payload=["r_ts", "r_v"], direction="forward",
        right_order=["r_eid"],
    ).select(
        F.col("user_id").alias("f_uid"), F.col("gt").alias("f_gt"),
        F.col("r_ts").alias("t1"), F.col("r_v").alias("y1"),
    )
    j = bwd.join(
        fwd, (bwd.user_id == fwd.f_uid) & (bwd.gt == fwd.f_gt)
    ).filter(F.col("t0").isNotNull() & F.col("t1").isNotNull())
    span = F.unix_timestamp("t1") - F.unix_timestamp("t0")
    num = F.unix_timestamp("gt") - F.unix_timestamp("t0")
    # association matches the oracle exactly: (y1-y0)*num THEN /span —
    # the other grouping differs in the last ulp and flips a 6dp round
    v = F.col("y0") + (F.col("y1") - F.col("y0")) * num / span
    # micro-unit floor, NOT round: Spark's round(double) goes through the
    # shortest-decimal string (71.2865775 -> .578) while DuckDB rounds
    # the exact binary (…74999 -> .577); 2dp inputs make exact-half
    # results common. floor of the identical IEEE double is engine-proof.
    return j.select(
        "user_id",
        F.date_format("gt", "yyyy-MM-dd HH:mm:ss").alias("grid_ts"),
        F.floor(v * 1_000_000).cast("long").alias("v_micro"),
    )
