"""Streaming operators: watermarked windows, dedup, joins.

The semantic upgrades over catenae (which had wall-clock timers only —
no event time, no watermarks, no late-data policy):

- event-time windows (tumbling/sliding/session) with watermark-driven
  state eviction — state is bounded by the watermark delay, not by a
  fixed-capacity dict (catenae's CircularOrderedDict);
- ``dropDuplicatesWithinWatermark``: the state-store-backed replacement
  for catenae's CircularOrderedSet dedup;
- stream-static enrichment (replaces Aerospike/Mongo per-message
  lookups) and stream-stream time-bounded joins (impossible in catenae
  without hand-rolled buffering).

At scale: streaming state lives in the state store (RocksDB provider in
production confs — session.py), keyed by group key, sharded by shuffle
partition; watermark delay bounds total state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    window_size: str,
    aggs: list,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    wm = events.withWatermark(ts_col, watermark)
    group_cols = [F.window(ts_col, window_size)] + [F.col(k) for k in (keys or [])]
    return wm.groupBy(*group_cols).agg(*aggs)


def sliding_window_agg(
    events: DataFrame,
    window_size: str,
    slide: str,
    aggs: list,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    wm = events.withWatermark(ts_col, watermark)
    group_cols = [F.window(ts_col, window_size, slide)] + [
        F.col(k) for k in (keys or [])
    ]
    return wm.groupBy(*group_cols).agg(*aggs)


def session_window_agg(
    events: DataFrame,
    gap: str,
    aggs: list,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    wm = events.withWatermark(ts_col, watermark)
    group_cols = [F.session_window(ts_col, gap)] + [F.col(k) for k in (keys or [])]
    return wm.groupBy(*group_cols).agg(*aggs)


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """First-seen-wins dedup with watermark-bounded state (catenae's
    CircularOrderedSet, but with a principled eviction policy)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def enrich(stream: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Stream-static join: per-row dimension lookup without a KV store.
    The static side is broadcast by Catalyst when small — each
    micro-batch joins map-side."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Time-bounded stream-stream inner join: rows match when
    ``left_ts <= right_ts <= left_ts + max_delay`` for the same key.
    Watermarks on both sides bound the join buffer state."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= F.expr(f"{left_ts} + INTERVAL {max_delay}"))
    )
    return l.join(r, cond)
