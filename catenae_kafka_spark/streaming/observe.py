"""Streaming observability (catenae A13 analog: structured logging /
lifecycle hooks, upgraded to Spark's listener bus).

Catenae exposed a logger and a ``suicide`` shutdown hook; the engine
gets *metrics as data*: a ``StreamingQueryListener`` that accumulates
per-query micro-batch progress (rows, duration, state size) into plain
dicts usable by tests, dashboards, or a ``foreachBatch`` shipping hook.
On a cluster, the same listener is where SLO alerts (watermark lag,
state growth, batch duration creep) hang off — driver-side only, no
executor cost.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QueryMetrics:
    """Accumulated per-query totals (one streaming query = one entry)."""

    name: str = ""
    n_batches: int = 0
    input_rows: int = 0
    # peak total state rows across batches — the number that must stay
    # bounded for a watermark-disciplined query
    peak_state_rows: int = 0
    batch_durations_ms: list = field(default_factory=list)

    @property
    def rows_per_sec(self) -> float:
        total_s = sum(self.batch_durations_ms) / 1000.0
        return self.input_rows / total_s if total_s > 0 else 0.0


class MetricsListener(StreamingQueryListener):
    """Accumulates progress events; attach with ``spark.streams
    .addListener`` (or via ``attach``)."""

    def __init__(self) -> None:
        self.by_query: dict[str, QueryMetrics] = defaultdict(QueryMetrics)

    # -- StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.by_query[str(event.id)].name = event.name or str(event.id)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        m = self.by_query[str(p.id)]
        m.name = p.name or m.name
        m.n_batches += 1
        m.input_rows += p.numInputRows or 0
        m.batch_durations_ms.append(
            (p.durationMs or {}).get("triggerExecution", 0)
        )
        for op in p.stateOperators or []:
            rows = op.numRowsTotal or 0
            if rows > m.peak_state_rows:
                m.peak_state_rows = rows

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # -- convenience -----------------------------------------------------
    def attach(self, spark: SparkSession) -> "MetricsListener":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def totals(self) -> dict[str, dict]:
        return {
            m.name: {
                "n_batches": m.n_batches,
                "input_rows": m.input_rows,
                "peak_state_rows": m.peak_state_rows,
                "rows_per_sec": round(m.rows_per_sec),
            }
            for m in self.by_query.values()
        }
