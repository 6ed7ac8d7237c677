"""Property-based tests (Hypothesis) for the pipeline operators added
round 1: sessionization and connected-components clustering must match
independent pure-Python references on randomized inputs, and the
deterministic-hash mixing ops must satisfy their structural invariants
(partition, reproducibility) by construction.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

GAP = 100  # session gap for the property tests (seconds)


def _sessionize_spark(spark, rows):
    """Same lag -> flag -> running-sum shape as q_sessionize, on
    integer-second events (user, ts)."""
    df = spark.createDataFrame(rows or [(0, 0)], "user long, ts_s long")
    w = Window.partitionBy("user").orderBy("ts_s")
    flagged = df.select(
        "user",
        "ts_s",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w) > GAP),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return {
        (r["user"], r["ts_s"]): r["session_no"]
        for r in sess.collect()
    }


def _sessionize_ref(rows):
    """Independent reference: walk each user's sorted timestamps."""
    out = {}
    by_user: dict[int, list[int]] = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        sess = 0
        prev = None
        for t in sorted(ts):
            if prev is None or t - prev > GAP:
                sess += 1
            out[(u, t)] = sess
            prev = t
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=2000),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_sessionize_matches_reference(spark, rows):
    assert _sessionize_spark(spark, rows) == _sessionize_ref(rows)


def _cc_ref(edges):
    """Union-find reference for connected components (min-label)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_spark(spark, edges):
    """The PRODUCTION connected_components (pointer-jumping min-label
    propagation) over an explicit edge list — property-tested against
    the union-find reference below."""
    from catenae_kafka_spark.operators.llm_dedup import connected_components

    e = spark.createDataFrame(edges, "id_a long, id_b long")
    labels = connected_components(e)
    return {r["id"]: r["comp"] for r in labels.collect()}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_match_union_find(spark, edges):
    assert _cc_spark(spark, edges) == _cc_ref(edges)


def test_split_partitions_and_reproduces(spark):
    """Structural invariants of the train/test split: every doc gets
    exactly one split, re-running yields identical assignments, and the
    split survives an arbitrary repartition (layout independence —
    the property df.sample does NOT have)."""
    from catenae_kafka_spark.operators.reshape import q_split_train_test

    sf = "/root/testdata/sf0.001"
    a = q_split_train_test(spark, sf)
    b = q_split_train_test(spark, sf)
    pa = {r["doc_id"]: r["split"] for r in a.collect()}
    pb = {r["doc_id"]: r["split"] for r in b.collect()}
    assert pa == pb
    n_docs = a.count()
    assert len(pa) == n_docs  # one assignment per doc
    assert set(pa.values()) <= {"train", "valid", "test"}
    # layout independence: recompute after a shuffle-inducing repartition
    from catenae_kafka_spark.catalog import catalog

    docs = catalog(spark, sf).documents.repartition(7, "lang")
    h = (F.col("doc_id") * 2654435761) % 100
    split = F.when(h < 80, "train").when(h < 90, "valid").otherwise("test")
    pc = {
        r["doc_id"]: r["split"]
        for r in docs.select("doc_id", split.alias("split")).collect()
    }
    assert pc == pa
