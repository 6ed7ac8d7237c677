"""Arbitrary stateful streaming operators (SURVEY §2B streaming:
``applyInPandasWithState``) — the escape hatch for state machines that
built-in windowed aggregation cannot express.

Catenae analog: ``Link`` instance attributes mutated per message plus
``CircularOrderedDict/Set`` bounded structures (A9). Here state is
explicit, per-key, checkpointed in the state store, and processed in
Arrow batches:

- ``streaming_ema``: per-user exponential moving average — inherently
  order-dependent (no builtin agg can express it), carried across
  micro-batches via GroupState.
- ``circular_dedup``: catenae's CircularOrderedSet semantics exactly —
  first-seen-wins dedup over a FIFO-bounded capacity window (capacity
  eviction, unlike the watermark eviction of
  dropDuplicatesWithinWatermark).

Scale: state is (key → a few floats / a short list), sharded by the
groupBy shuffle, RocksDB-backed in production confs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_ALPHA = 0.1

EMA_OUTPUT_SCHEMA = "user_id long, ema double, n_seen long"
EMA_STATE_SCHEMA = "ema double, n_seen long"

DEDUP_OUTPUT_SCHEMA = "user_id long, event_id long, event_type string"
DEDUP_STATE_SCHEMA = "recent array<string>"


def streaming_ema(events: DataFrame) -> DataFrame:
    """Per-user EMA over the value column; one row per (user, batch)
    with the state so far — the latest n_seen row per user is the final
    answer.

    The state function is a CLOSURE on purpose: module-level functions
    are cloudpickled by reference, and Python workers (which do not
    inherit the driver's sys.path insertions) then fail with
    ModuleNotFoundError when the engine is driven from outside the repo.
    """
    alpha = EMA_ALPHA

    def ema_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ema, n_seen = state.get if state.exists else (None, 0)
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for v in pdf["value"]:
                ema = float(v) if ema is None else (1 - alpha) * ema + alpha * float(v)
                n_seen += 1
        state.update((ema, n_seen))
        yield pd.DataFrame({"user_id": [key[0]], "ema": [ema], "n_seen": [n_seen]})

    return events.groupBy("user_id").applyInPandasWithState(
        ema_fn,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_available() -> bool:
    """True when transformWithState's python-side dependency (protobuf,
    used by its state-server protocol) is importable. Not bundled in
    this container, so the TWS query registers only where it can run —
    same gating discipline as the Kafka connector edge."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except ImportError:
        return False


def streaming_ema_tws(events: DataFrame) -> DataFrame:
    """Same per-user EMA, on Spark 4's transformWithState API v2
    (``transformWithStateInPandas``): named state variables created in
    ``init`` instead of one opaque state tuple, plus (unused here)
    timers, TTL, list/map state. Requires the RocksDB state store
    provider — the caller sets
    spark.sql.streaming.stateStore.providerClass — and protobuf
    (``tws_available``; raises a clear error when absent). The
    processor class is defined inside this function so cloudpickle
    serializes it by value (same worker-import reason as the closures
    above)."""
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package for "
            "its state-server protocol; it is not installed in this "
            "environment. Use streaming_ema (applyInPandasWithState) — "
            "identical semantics, no protobuf dependency."
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    alpha = EMA_ALPHA

    class EmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ema", EMA_STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            ema, n_seen = self._state.get() if self._state.exists() else (None, 0)
            for pdf in rows:
                pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
                for v in pdf["value"]:
                    ema = (
                        float(v)
                        if ema is None
                        else (1 - alpha) * ema + alpha * float(v)
                    )
                    n_seen += 1
            self._state.update((ema, n_seen))
            yield pd.DataFrame(
                {"user_id": [key[0]], "ema": [ema], "n_seen": [n_seen]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=EmaProcessor(),
        outputStructType=EMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def circular_dedup(events: DataFrame, capacity: int = 3) -> DataFrame:
    """Bounded-capacity FIFO dedup: catenae CircularOrderedSet.add
    semantics per key — emit a row iff its signature is not in the set;
    insertion evicts the oldest entry beyond capacity. (Closure for the
    same worker-import reason as streaming_ema.)"""

    def dedup_fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (recent,) = state.get if state.exists else ([],)
        recent = list(recent)
        out: list[tuple[int, int, str]] = []
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for row in pdf.itertuples(index=False):
                sig = row.event_type
                if sig not in recent:
                    out.append((key[0], row.event_id, sig))
                    recent.append(sig)
                    if len(recent) > capacity:
                        recent.pop(0)
        state.update((recent,))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "event_type"])

    return events.groupBy("user_id").applyInPandasWithState(
        dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
