"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator, registered as a real
``spark.read.format(...)`` source.

This is the engine's demonstration of the *pluggable source edge*: the
same mechanism a production deployment would use to wrap an in-house
feed (REST pages, proprietary binary logs, a message queue without a
JVM connector) as a first-class, partition-parallel Spark source —
entirely in Python, no JVM code. The generator is arithmetic on the row
index (multiplicative-hash pseudo-randomness, same trick as the
sampling ops), so the exact same table is expressible in DuckDB SQL via
``generate_series`` — making a *custom source* fully oracle-checkable.

Scale posture: ``partitions()`` returns disjoint index ranges, so
generation parallelizes across executors with zero coordination; filter
pushdown is irrelevant (no IO), and downstream pruning happens in
Spark. Row production is per-partition and streams through Arrow
batches like any Python-side source.

SERIALIZATION DISCIPLINE (load-bearing): every class here is defined
INSIDE a factory function, so cloudpickle serializes it BY VALUE.
``spark.dataSource.register`` pickles the class itself into (a) task
workers and (b) the driver-side streaming-source runner process —
neither shares the driver's ``sys.path``, and the streaming runner does
not even see SparkFiles/addPyFile, so a module-level class hits
ModuleNotFoundError the moment the engine is driven from outside the
repo (verified failure). Same rule as the stateful closures in
``streaming/stateful.py``.
"""

from __future__ import annotations

MULT = 2654435761  # Knuth multiplicative-hash constant
EVENT_TYPES = ("click", "view", "signup", "purchase", "error")


def _build_events_source():
    """Factory: classes defined here pickle by value (see module doc)."""
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    mult = MULT
    event_types = EVENT_TYPES

    @dataclass
    class _Range(InputPartition):
        start: int
        end: int

    class SyntheticEventsReader(DataSourceReader):
        def __init__(self, options):
            self.n_rows = int(options.get("rows", 1000))
            self.n_parts = int(options.get("partitions", 8))

        def partitions(self):
            step = max(1, self.n_rows // self.n_parts)
            bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
            return [
                _Range(start=bounds[i], end=bounds[i + 1])
                for i in range(len(bounds) - 1)
            ]

        def read(self, partition):
            for i in range(partition.start, partition.end):
                h = (i * mult) % 10_000
                yield (
                    i,  # event_id
                    i % 1000,  # user_id
                    event_types[i % len(event_types)],  # event_type
                    h / 100.0,  # value: 0.00..99.99, exact at 2dp
                )

    class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
        """Micro-batched variant: offsets are plain row indexes, each
        ``read`` emits the next ``batch_rows`` generated rows, and a
        drained source reports an unchanged offset (no data) — the
        minimal honest contract of a replayable streaming source.
        ``readBetweenOffsets`` regenerates any range deterministically,
        so recovery/replay is exact — what checkpointed sources must
        guarantee."""

        def __init__(self, options):
            self.n_rows = int(options.get("rows", 1000))
            self.batch_rows = int(options.get("batchRows", 250))

        def initialOffset(self):
            return {"idx": 0}

        def _gen(self, start, end):
            for i in range(start, end):
                h = (i * mult) % 10_000
                yield (i, i % 1000, event_types[i % len(event_types)], h / 100.0)

        def read(self, start):
            lo = start["idx"]
            hi = min(lo + self.batch_rows, self.n_rows)
            # a copyable LIST iterator, not a generator: Spark's
            # prefetch cache copy.copy()s the returned iterator, which
            # generators don't support
            return iter(list(self._gen(lo, hi))), {"idx": hi}

        def readBetweenOffsets(self, start, end):
            return iter(list(self._gen(start["idx"], end["idx"])))

    class SyntheticEventsDataSource(DataSource):
        """``spark.read.format("synthetic_events")`` after registration."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_events"

        def schema(self) -> str:
            return "event_id long, user_id long, event_type string, value double"

        def reader(self, schema) -> SyntheticEventsReader:
            return SyntheticEventsReader(self.options)

        def simpleStreamReader(self, schema):
            return SyntheticEventsStreamReader(self.options)

    return SyntheticEventsDataSource


def _build_kv_source():
    """Factory for the KV sink classes (by-value pickling, see above)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamWriter,
        DataSourceWriter,
        WriterCommitMessage,
    )

    class _KVCommit(WriterCommitMessage):
        def __init__(self, path: str, rows: int):
            self.path = path
            self.rows = rows

    def _spool(base, iterator):
        import json
        import os
        import uuid

        spool_dir = os.path.join(base, "_spool")
        os.makedirs(spool_dir, exist_ok=True)
        path = os.path.join(spool_dir, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(path, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _KVCommit(path, n)

    class KVStoreWriter(DataSourceWriter):
        """Two-phase-commit KV sink (the catenae Aerospike/Mongo-
        connector analog as a first-class Spark sink): each task writes
        its partition to an uncommitted spool file and reports it in a
        commit message; only the driver's ``commit`` publishes them
        atomically (rename into the committed dir). ``abort`` discards
        spools — a failed/speculated task never half-writes the store.
        This is exactly the WriterCommitMessage contract JVM sinks use,
        in Python."""

        def __init__(self, options):
            self.base = options.get("path")
            if not self.base:
                raise ValueError("kv_store sink requires option 'path'")

        def write(self, iterator):
            return _spool(self.base, iterator)

        def commit(self, messages):
            import os

            committed = os.path.join(self.base, "committed")
            os.makedirs(committed, exist_ok=True)
            for m in messages:
                os.rename(
                    m.path, os.path.join(committed, os.path.basename(m.path))
                )

        def abort(self, messages):
            import os

            for m in messages:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    class KVStoreStreamWriter(DataSourceStreamWriter):
        """Streaming variant of the KV sink: per-epoch two-phase commit.
        Tasks spool each micro-batch partition; ``commit(messages,
        batchId)`` publishes the epoch atomically under
        ``committed/epoch=<id>/``. Re-delivered epochs (restart replay)
        overwrite the same directory — idempotent, so the sink is
        exactly-once downstream of Spark's WAL, which is precisely the
        foreachBatch discipline catenae's external KV writers needed by
        hand."""

        def __init__(self, options):
            self.base = options.get("path")
            if not self.base:
                raise ValueError("kv_store sink requires option 'path'")

        def write(self, iterator):
            return _spool(self.base, iterator)

        def commit(self, messages, batchId):
            import os
            import shutil

            epoch = os.path.join(self.base, "committed", f"epoch={batchId}")
            shutil.rmtree(epoch, ignore_errors=True)  # idempotent re-delivery
            os.makedirs(epoch, exist_ok=True)
            for m in messages:
                os.rename(m.path, os.path.join(epoch, os.path.basename(m.path)))

        def abort(self, messages, batchId):
            import os

            for m in messages:
                try:
                    os.remove(m.path)
                except OSError:
                    pass

    class KVStoreDataSource(DataSource):
        """``df.write.format("kv_store").option("path", ...)`` after
        registration."""

        @classmethod
        def name(cls) -> str:
            return "kv_store"

        def writer(self, schema, overwrite: bool):
            return KVStoreWriter(self.options)

        def streamWriter(self, schema, overwrite: bool):
            return KVStoreStreamWriter(self.options)

    return KVStoreDataSource


def stream_reader(options: dict):
    """A standalone streaming reader instance (for contract tests that
    drive the offset protocol directly; production code uses
    ``register`` + ``spark.readStream.format``)."""
    return _build_events_source()(options).simpleStreamReader(None)


import threading

_REGISTER_LOCK = threading.Lock()


def _ensure_active_session(spark) -> None:
    """Pin ``spark`` as the JVM's thread-local active session.

    Python data-source WRITE lookups resolve through the JVM's
    active-session thread-local, and py4j child threads start with none
    — so ``df.write.format("kv_store").save()`` fails
    DATA_SOURCE_NOT_FOUND from any Python thread other than the one
    that created the session, even though the source is registered
    (reproduced deterministically on local[32]: main thread ok, child
    thread fails; reads are unaffected). Must run in the CALLING
    thread, before the write."""
    try:
        jvm = spark._jvm
        try:
            jvm.org.apache.spark.sql.classic.SparkSession.setActiveSession(
                spark._jsparkSession
            )
        except Exception:  # noqa: BLE001 — pre-4.0 class location
            jvm.org.apache.spark.sql.SparkSession.setActiveSession(
                spark._jsparkSession
            )
    except Exception:  # noqa: BLE001 — session pinning must never block a query
        pass


def _register_once(spark, name: str, build) -> None:
    """Thread-safe, once-per-session registration: a process-wide lock
    serializes ``spark.dataSource.register`` calls (registration
    replaces the registry entry and is not meant to race lookups) and a
    per-session memo avoids re-pickling the class on every query. The
    memo lives ON the session object — a module-level set keyed by
    id(spark) would go stale when a stopped session's address is reused
    by a new one (id() is only unique among LIVE objects), silently
    skipping registration on the fresh session."""
    with _REGISTER_LOCK:
        done = getattr(spark, "_cks_registered_sources", None)
        if done is None:
            done = set()
            spark._cks_registered_sources = done
        if name in done:
            return
        spark.dataSource.register(build())
        done.add(name)


def register(spark) -> None:
    """Idempotent registration of the custom format (call from the
    thread that will use it — see _ensure_active_session)."""
    _ensure_active_session(spark)
    _register_once(spark, "synthetic_events", _build_events_source)


def register_kv(spark) -> None:
    _ensure_active_session(spark)
    _register_once(spark, "kv_store", _build_kv_source)
