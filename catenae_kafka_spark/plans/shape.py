"""Physical-plan shape inspection shared by tools/plan_audit.py and
tests/test_plans.py.

The one global invariant enforced here: NO registered batch query may
run an UNPARTITIONED window (a single-partition global sort) whose
input is raw fact-table rows. A global window is fine over a summary —
anything downstream of an aggregate (per-value counts, bucket totals,
top-k spills) is bounded by the value domain, not the corpus — but a
global ``ROW_NUMBER()/NTILE()`` directly over a 100 TB scan serializes
the whole table through one task. The scale-safe rewrite is the
q_auc_rank two-phase bucketed prefix sum (see
operators/mlstats.py:_select_order_stats).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Tables big enough that a single-partition sort of their raw rows is a
#: scale bug. region/nation (and other <=10k-row dims) are exempt.
FACT_TABLES = (
    "events",
    "lineitem",
    "orders",
    "documents",
    "embeddings",
    "customer",
    "part",
    "supplier",
)


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def global_windows_over_fact_rows(df: DataFrame) -> list[str]:
    """Return a violation string per unpartitioned Window node whose
    subtree reaches a fact-table scan with NO aggregate in between.

    Inspects ``queryExecution().sparkPlan()`` (the physical tree before
    adaptive wrapping, so it walks as a real tree). An intervening
    Aggregate means the window's input is a groupBy summary — bounded
    by the key domain — which is the sanctioned two-phase shape."""
    plan = df._jdf.queryExecution().sparkPlan()  # noqa: SLF001
    bad: list[str] = []
    for node in _walk(plan):
        if node.nodeName() != "Window":
            continue
        try:
            if not node.partitionSpec().isEmpty():
                continue
        except Exception:  # noqa: BLE001 — non-WindowExec lookalike
            continue
        hits: list[str] = []
        for child in _children(node):
            hits.extend(_unbounded_fact_scans(child))
        for hit in hits:
            bad.append(
                "unpartitioned Window over raw rows of "
                f"{hit} (no aggregate/limit between scan and sort)"
            )
    return bad


#: A node whose output row count no longer tracks the corpus: aggregates
#: (bounded by the key domain) and limits (bounded by k). A path from a
#: global window down to a fact scan that crosses one of these is fine.
_BOUNDING = ("Aggregate", "Limit", "TakeOrderedAndProject")


def _unbounded_fact_scans(node) -> list[str]:
    """Fact tables reachable from ``node`` along a path with no bounding
    (aggregate/limit) node — i.e. raw corpus rows flowing upward."""
    name = node.nodeName()
    if any(b in name for b in _BOUNDING):
        return []
    if "Scan" in name:
        s = node.simpleString(500)
        return [t for t in FACT_TABLES if f"{t}.parquet" in s]
    out: list[str] = []
    for c in _children(node):
        out.extend(_unbounded_fact_scans(c))
    return out
