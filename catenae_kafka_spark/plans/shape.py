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

import re

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

#: The unique (primary-key) column of each fact table, used by the
#: key-range-filter bounding rule below. lineitem has no single unique
#: column (its PK is composite), so a key-range filter never bounds it.
UNIQUE_KEY = {
    "orders": "o_orderkey",
    "events": "event_id",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _walk(node):
    yield node
    for c in _children(node):
        yield from _walk(c)


def global_windows_over_fact_rows(df: DataFrame) -> list[str]:
    """Return a violation string per unpartitioned Window node whose
    subtree reaches a fact-table scan with NO bounding node in between.

    Inspects ``queryExecution().sparkPlan()`` (the physical tree before
    adaptive wrapping, so it walks as a real tree). Bounding nodes —
    aggregates, limits, WindowGroupLimit, and constant key-range
    filters — mean the window's input no longer tracks the corpus size;
    see ``_unbounded_fact_scans`` for the exact rules."""
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
                f"{hit} (no aggregate/limit/key-bound between scan and sort)"
            )
    return bad


#: Exact physical node names whose output row count no longer tracks
#: the corpus. Limits are bounded by k; TakeOrderedAndProject is Spark's
#: fused top-k; WindowGroupLimit emits at most k rows PER PARTITION KEY,
#: which is the same soundness class as an aggregate (bounded by the key
#: domain, not the corpus). Matched EXACTLY — substring matching would
#: make 'Limit' silently absorb future node types (it used to match
#: WindowGroupLimit by accident, making a whitelist entry dead code).
_LIMIT_NODES = frozenset(
    {
        "GlobalLimit",
        "LocalLimit",
        "CollectLimit",
        "TakeOrderedAndProject",
        "WindowGroupLimit",
    }
)

#: Strict subset for the nested-loop auditor's ``_scalar_bounded``:
#: nodes whose TOTAL output is <= a constant k, regardless of how many
#: partitions or partition keys the input has. WindowGroupLimit (k rows
#: PER key — key domain can scale with the corpus, same class as a
#: grouped aggregate) and bare LocalLimit (k rows PER partition) are
#: deliberately excluded: they bound a global window's sort input in
#: ``_unbounded_fact_scans``, but they do NOT make a nested-loop build
#: side constant-sized.
_CONSTANT_LIMIT_NODES = frozenset(
    {"GlobalLimit", "CollectLimit", "TakeOrderedAndProject"}
)

#: ``col#123L <op> <intlit>`` with the column reference IMMEDIATELY left
#: of the operator — `(o_orderkey#14L % 41) = 0` must NOT match.
_KEY_BOUND_RE = re.compile(r"(\w+)#\d+L? (?:<|<=|=) (\d+)")


def _is_aggregate(name: str) -> bool:
    # HashAggregate / ObjectHashAggregate / SortAggregate
    return name.endswith("Aggregate")


def _top_level_conjuncts(cond: str) -> list[str]:
    """Split a physical Filter condition string into its TOP-LEVEL
    conjuncts (pieces ANDed at parenthesis depth 0 after stripping any
    fully-enclosing parens). A bound that only appears under an OR or a
    NOT does not cap the row count, so the caller must see each
    conjunct in isolation and reject the disjunctive/negated ones."""
    cond = cond.strip()
    # strip balanced fully-enclosing parens: '((a) AND (b))' -> '(a) AND (b)'
    while cond.startswith("(") and cond.endswith(")"):
        depth = 0
        enclosing = True
        for i, ch in enumerate(cond):
            depth += ch == "("
            depth -= ch == ")"
            if depth == 0 and i < len(cond) - 1:
                enclosing = False
                break
        if not enclosing:
            break
        cond = cond[1:-1].strip()
    parts: list[str] = []
    depth = 0
    start = 0
    i = 0
    while i < len(cond):
        ch = cond[i]
        depth += ch == "("
        depth -= ch == ")"
        if depth == 0 and cond.startswith(" AND ", i):
            parts.append(cond[start:i])
            i += 5
            start = i
            continue
        i += 1
    parts.append(cond[start:])
    return [p.strip() for p in parts if p.strip()]


def _key_bounded_tables(filter_node) -> set[str]:
    """Fact tables whose UNIQUE key is capped by an integer literal in
    this Filter's condition (``key < C`` / ``key <= C`` / ``key = C``).
    A unique key admits at most C rows below C regardless of corpus
    size, so a window over such a slice is constant-bounded — this is
    the q_null_ordering_contract shape (pushed ``o_orderkey < 1e6``).

    The bound must be a TOP-LEVEL CONJUNCT: ``key < C OR ...`` admits
    every row matching the other disjunct, and ``NOT (key < C)`` admits
    the unbounded complement, so matches inside a disjunction or a
    negation are rejected (ADVICE r6)."""
    try:
        cond = filter_node.condition().toString()
    except Exception:  # noqa: BLE001
        return set()
    bounded_cols: set[str] = set()
    for conjunct in _top_level_conjuncts(cond):
        if " OR " in conjunct or conjunct.startswith("NOT"):
            continue
        bounded_cols.update(
            m.group(1) for m in _KEY_BOUND_RE.finditer(conjunct)
        )
    return {t for t, key in UNIQUE_KEY.items() if key in bounded_cols}


def _unbounded_fact_scans(node, bounded: frozenset[str] = frozenset()) -> list[str]:
    """Fact tables reachable from ``node`` along a path with no bounding
    node — i.e. raw corpus rows flowing upward. ``bounded`` carries the
    tables a key-range Filter above this node already capped."""
    name = node.nodeName()
    if name in _LIMIT_NODES or _is_aggregate(name):
        return []
    if name == "Filter":
        bounded = bounded | _key_bounded_tables(node)
    if "Scan" in name:
        s = node.simpleString(500)
        return [
            t
            for t in FACT_TABLES
            if f"{t}.parquet" in s and t not in bounded
        ]
    out: list[str] = []
    for c in _children(node):
        out.extend(_unbounded_fact_scans(c, bounded))
    return out


#: Physical join nodes with no join keys: cost is |left| x |right|
#: unless one side is a constant-row build.
_NL_JOINS = ("BroadcastNestedLoopJoin", "CartesianProduct")


def unbounded_nested_loop_joins(df: DataFrame) -> list[str]:
    """Return a violation string per nested-loop/cartesian join with NO
    scalar-bounded side.

    A nested loop whose build side is provably <= a constant number of
    rows (an UNGROUPED aggregate, or a constant limit) is the reviewed
    "1-row aggregate cross" shape — cost |fact| x O(1), fine at any
    scale — and is accepted mechanically, no whitelist entry needed.
    Everything else (spine tables, bounded-domain rollups, deliberate
    all-pairs baselines) still requires a reviewed NL_WHITELIST reason:
    a GROUPED aggregate is bounded by its key domain, which may itself
    scale with the corpus, so it never auto-passes here."""
    plan = df._jdf.queryExecution().sparkPlan()  # noqa: SLF001
    bad: list[str] = []
    for node in _walk(plan):
        name = node.nodeName()
        if name not in _NL_JOINS:
            continue
        if any(_scalar_bounded(c) for c in _children(node)):
            continue
        bad.append(f"{name} with no scalar-bounded side")
    return bad


def _scalar_bounded(node) -> bool:
    """True when this subtree provably emits a CONSTANT number of rows:
    an ungrouped aggregate (exactly 1), a GLOBAL constant limit (<= k
    total — see _CONSTANT_LIMIT_NODES; per-key WindowGroupLimit and
    per-partition LocalLimit do NOT qualify, their output scales with
    the key/partition count), or a composition of such through
    row-preserving operators. Scans, joins, windows, and generators are
    data-sized — False."""
    name = node.nodeName()
    if _is_aggregate(name):
        try:
            return bool(node.groupingExpressions().isEmpty())
        except Exception:  # noqa: BLE001 — aggregate lookalike
            return False
    if name in _CONSTANT_LIMIT_NODES:
        return True
    if "Scan" in name or "Join" in name or name in ("Window", "Generate"):
        return False
    ch = _children(node)
    if not ch:
        return False
    return all(_scalar_bounded(c) for c in ch)
