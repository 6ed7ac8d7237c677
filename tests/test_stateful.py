"""Stateful streaming ops vs python reference models."""

from __future__ import annotations

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_circular_dedup_matches_reference_model(spark):
    """The applyInPandasWithState op must reproduce catenae's
    CircularOrderedSet semantics exactly: per user, emit an event iff
    its type is not among the last 3 distinct types seen (FIFO)."""
    out = all_specs()["q_stream_circular_dedup"].fn(spark, SF)
    got = {(r.user_id, r.event_id) for r in out.collect()}

    rows = (
        catalog(spark, SF)
        .events.select("user_id", "event_id", "event_type", "ts")
        .orderBy("ts", "event_id")
        .collect()
    )
    state: dict[int, list[str]] = {}
    expected = set()
    for r in rows:
        recent = state.setdefault(r.user_id, [])
        if r.event_type not in recent:
            expected.add((r.user_id, r.event_id))
            recent.append(r.event_type)
            if len(recent) > 3:
                recent.pop(0)
    assert got == expected


def test_ema_final_state_counts_every_event(spark):
    out = all_specs()["q_stream_ema"].fn(spark, SF)
    total = out.agg(F.sum("n_seen")).collect()[0][0]
    assert total == catalog(spark, SF).events.count()


def test_tws_gated_with_clear_error(spark):
    """transformWithState needs protobuf (absent here): the op must
    refuse with an actionable message, not crash mid-query; and the
    driver contract must only list q_stream_ema_tws where it can run."""
    import pytest

    from catenae_kafka_spark.streaming.stateful import (
        streaming_ema_tws,
        tws_available,
    )

    if tws_available():
        out = all_specs()["q_stream_ema_tws"].fn(spark, SF)
        assert out.count() > 0
    else:
        assert "q_stream_ema_tws" not in all_specs()
        with pytest.raises(RuntimeError, match="protobuf"):
            streaming_ema_tws(catalog(spark, SF).events)


def test_ttl_sessions_exact_gap_partition(spark):
    """q_stream_state_ttl: the TTL-evicted streaming sessions equal the
    batch event-time 2h-gap partition EXACTLY (the property that earns
    the query its full SQL oracle), and no events are lost or doubled.
    Gap comparison uses raw µs timestamps (not unix_timestamp, which
    truncates to seconds and miscounts gaps within 1 s of the 2 h
    boundary)."""
    from pyspark.sql import Window

    out = {
        r.user_id: (r.n_sessions, r.total_events)
        for r in all_specs()["q_stream_state_ttl"].fn(spark, SF).collect()
    }
    events = catalog(spark, SF).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expected = {
        r.user_id: (r.ns, r.n)
        for r in events.select(
            "user_id",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
                    > 7200.0
                ),
                1,
            )
            .otherwise(0)
            .alias("new_s"),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("ns"), F.count("*").alias("n"))
        .collect()
    }
    assert out == expected
    assert any(ns > 1 for ns, _ in out.values())
