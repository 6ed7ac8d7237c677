"""Stateful streaming ops vs python reference models."""

from __future__ import annotations

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.registry import all_specs

SF = "/root/testdata/sf0.001"


def test_circular_dedup_matches_reference_model(spark, weakcheck):
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
    weakcheck(
        "q_stream_circular_dedup",
        exact_match_vs_reference_model=got == expected,
        n_emitted=len(got),
        n_input_events=len(rows),
    )


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


def test_circular_dedup_capacity_properties(spark):
    """Second-facet audit (batch 71): structural FIFO-capacity
    properties checked WITHOUT replaying the reference model — (a) the
    output is a subset of the input rows, (b) the first occurrence of
    every (user, type) is always emitted, (c) a user's emissions never
    exceed first-occurrences by more than re-admissions allow: between
    two emissions of the same (user, type) there are >= 3 emissions of
    OTHER types for that user (an evicted type needs 3 distinct others
    to push it out of the 3-slot FIFO)."""
    out = all_specs()["q_stream_circular_dedup"].fn(spark, SF)
    got = [(r.user_id, r.event_id) for r in out.collect()]
    assert len(set(got)) == len(got)

    rows = (
        catalog(spark, SF)
        .events.select("user_id", "event_id", "event_type", "ts")
        .orderBy("ts", "event_id")
        .collect()
    )
    by_id = {(r.user_id, r.event_id): r.event_type for r in rows}
    assert set(got) <= set(by_id)  # (a) subset of input

    first_occ = set()
    seen_types = set()
    for r in rows:
        if (r.user_id, r.event_type) not in seen_types:
            seen_types.add((r.user_id, r.event_type))
            first_occ.add((r.user_id, r.event_id))
    assert first_occ <= set(got)  # (b) first occurrences always emitted

    # (c) re-admission spacing: per user, replay the emitted sequence in
    # event order; between consecutive emissions of one type there must
    # be >= 3 distinct other types emitted for that user
    emitted = set(got)
    per_user: dict[int, list[str]] = {}
    for r in rows:
        if (r.user_id, r.event_id) in emitted:
            per_user.setdefault(r.user_id, []).append(r.event_type)
    for seq in per_user.values():
        last_idx: dict[str, int] = {}
        for i, t in enumerate(seq):
            if t in last_idx:
                between = set(seq[last_idx[t] + 1 : i])
                assert len(between) >= 3, seq[last_idx[t] : i + 1]
            last_idx[t] = i
