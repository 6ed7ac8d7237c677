"""SCD2 history + streaming-upsert invariants (sf0.001 smoke scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from catenae_kafka_spark.catalog import catalog
from catenae_kafka_spark.operators.history import q_scd2_history, q_stream_upsert


def test_scd2_intervals_partition_each_users_timeline(spark, sf_dir):
    hist = q_scd2_history(spark, sf_dir).cache()
    rows = hist.orderBy("user_id", "valid_from").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    ev_counts = {
        r.user_id: r.n
        for r in catalog(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(by_user) == set(ev_counts)
    for uid, ivs in by_user.items():
        # exactly one current row, and it is the last interval
        assert [iv.is_current for iv in ivs] == [False] * (len(ivs) - 1) + [True]
        # intervals are contiguous: each valid_to == next valid_from
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            # a change row means the state actually changed
            assert a.state != b.state
        # interval event counts partition the user's events
        assert sum(iv.n_events for iv in ivs) == ev_counts[uid]
    hist.unpersist()


def test_stream_upsert_matches_batch_latest_per_key(spark, sf_dir):
    got = {
        r.user_id: (r.last_type, r.last_ts, r.n_events)
        for r in q_stream_upsert(spark, sf_dir).collect()
    }
    w_desc = F.struct("ts", "event_id")
    expected = {
        r.user_id: (r.last_type, r.last_ts, r.n_events)
        for r in catalog(spark, sf_dir)
        .events.groupBy("user_id")
        .agg(
            F.max(F.struct("ts", "event_id", "event_type")).alias("m"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("m.event_type").alias("last_type"),
            F.date_format("m.ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            "n_events",
        )
        .collect()
    }
    assert got == expected
