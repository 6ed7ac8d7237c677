"""Seeded randomized fixture generator for differential fuzzing.

The driver verifies every oracled query on ONE fixed fixture
(/root/testdata, seed=42). A query can therefore pass by accident of
that fixture's values — e.g. a filter that never sees a tie, a join
that never sees a key with no match, an aggregate that never sees a
negative balance. This module generates fixture directories with the
SAME ten tables, schemas (arrow-exact), name formats, and categorical
domains as the driver fixture, but freshly randomized content — so the
existing oracle harness (`SF_DIR=<dir> python tools/check.py`) becomes
a differential fuzzer: any Spark-vs-DuckDB mismatch on a generated dir
is a value-dependence bug the fixed fixture could never catch.

Two profiles per seed:

- benign: same distributional character as the driver fixture
  (uniform keys, 2-decimal money grids, distinct-ish dates). Every
  oracled query must pass here; a failure is a straight bug.
- adversarial: the ugly shapes — skewed foreign keys (zipfian
  customers, hot parts), coarse value grids that force ties in GROUP
  BY / ORDER BY keys, duplicate (user, ts) event pairs, a burst of
  orders on one date, planted exact- and near-duplicate documents,
  planted near-duplicate embedding pairs (cosine >= 0.9), boundary
  dates at the domain edges.
- empty (``--empty``): every table truncated to ZERO rows with the
  schemas intact — the empty-partition/empty-day case a production
  pipeline hits routinely. Exercises agg-over-nothing semantics
  (Spark emits no rows for ROLLUP/CUBE over an empty relation; scalar
  SUM is NULL while scalar COUNT is 0), write-then-read-back schema
  inference, and driver-side None handling.
- degenerate (``--profile degenerate``): the zero-information limit —
  every money/value column CONSTANT (zero variance everywhere), all
  customers in one nation, all orders on one date by one customer,
  one event type at one timestamp, all documents byte-identical,
  all embeddings the same vector. This is the profile that stresses
  the NULL-on-zero-division parity class (corr/variance/shrinkage
  denominators): ANSI Spark raises on x/0 while DuckDB yields NULL,
  so any unguarded ratio diverges here by construction.

Money-like doubles stay on 2-decimal grids in BOTH profiles (as in
TPC-H and the driver fixture): cross-engine float discipline for
multi-row double sums is the operators' job only up to the house
quantization rules (see memory: integer-micro lifting), and the
fuzzer's goal is value coverage, not float-order torture.

Usage:
    python tools/fuzz_fixture.py /tmp/fuzz_s1 --seed 1
    python tools/fuzz_fixture.py /tmp/fuzz_s2 --seed 2 --adversarial
    SF_DIR=/tmp/fuzz_s1 python tools/check.py --jobs 8
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# --- domain constants mirrored from /root/testdata (sf0.001 probe) ---

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
N_NATIONS = 25
MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
ORDERSTATUS = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
P_ADJS = ["small", "blue", "cold", "new", "hot", "old", "red", "large"]
P_NOUNS = ["widget", "rod", "ring", "anvil", "bolt", "plate", "gizmo", "gear"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
DOC_VOCAB = (
    "the a fast slow big small key order sort table scan merge part "
    "window hash join batch stream spark dup group query row data "
    "filter customer line value column vector agg"
).split()
EMB_DIM = 64

SIZES = {
    "customer": 150,
    "supplier": 10,
    "part": 200,
    "orders": 1500,
    "events": 1000,
    "documents": 500,
    "embeddings": 500,
}

_EPOCH = np.datetime64("1970-01-01", "us")


def _ts(days_arr, extra_us=None):
    """Array of numpy us-timestamps from float days-since-epoch."""
    us = (np.asarray(days_arr, dtype="int64") * 86_400_000_000)
    if extra_us is not None:
        us = us + np.asarray(extra_us, dtype="int64")
    return _EPOCH + us.astype("timedelta64[us]")


_DAY0_ORDERS = (np.datetime64("1995-01-01") - np.datetime64("1970-01-01")).astype(int)
_DAYN_ORDERS = (np.datetime64("2001-08-01") - np.datetime64("1970-01-01")).astype(int)
_DAY0_EVENTS = (np.datetime64("2024-01-01") - np.datetime64("1970-01-01")).astype(int)


def _write(dst: str, name: str, schema: pa.Schema, cols: dict) -> None:
    table = pa.Table.from_pydict(cols, schema=schema)
    pq.write_table(table, os.path.join(dst, f"{name}.parquet"))


#: constant replacements applied by the degenerate profile — every
#: non-key column collapses to one in-domain value, so any ratio whose
#: denominator is a variance/spread is exactly 0 in every group
_TS_DEGEN_ORDER = np.datetime64("1998-06-15T00:00:00.000000")
_TS_DEGEN_SHIP = np.datetime64("1998-07-15T00:00:00.000000")
_TS_DEGEN_EVENT = np.datetime64("2024-01-15T12:00:00.000000")
_DEGEN_TEXT = "the fast spark table scan joins the slow batch stream"
_DEGEN_OVERRIDES: dict[str, dict[str, object]] = {
    "nation": {"n_regionkey": 2},
    "customer": {"c_nationkey": 7, "c_acctbal": 1000.0, "c_mktsegment": "BUILDING"},
    "supplier": {"s_nationkey": 7, "s_acctbal": 1000.0},
    "part": {
        "p_name": "red widget",
        "p_brand": "Brand#5",
        "p_type": "STANDARD",
        "p_size": 25,
        "p_retailprice": 910.0,
    },
    "orders": {
        "o_custkey": 3,
        "o_orderstatus": "O",
        "o_totalprice": 25000.0,
        "o_orderdate": _TS_DEGEN_ORDER,
        "o_orderpriority": "3-MEDIUM",
    },
    "lineitem": {
        "l_partkey": 5,
        "l_suppkey": 2,
        "l_quantity": 10.0,
        "l_extendedprice": 1000.0,
        "l_discount": 0.05,
        "l_tax": 0.04,
        "l_returnflag": "N",
        "l_linestatus": "O",
        "l_shipdate": _TS_DEGEN_SHIP,
    },
    "events": {
        "ts": _TS_DEGEN_EVENT,
        "user_id": 3,
        "event_type": "click",
        "value": 1.0,
        "props": '{"k": 5}',
    },
    "documents": {
        "text": _DEGEN_TEXT,
        "lang": "en",
        "source": "src0",
        "n_chars": len(_DEGEN_TEXT),
    },
    "embeddings": {"embedding": [0.125] * EMB_DIM, "label": 5},
}


def _flatten_degenerate(dst: str) -> None:
    for name, overrides in _DEGEN_OVERRIDES.items():
        path = os.path.join(dst, f"{name}.parquet")
        table = pq.read_table(path)
        for col, value in overrides.items():
            i = table.schema.get_field_index(col)
            field = table.schema.field(i)
            arr = pa.array([value] * len(table), type=field.type)
            table = table.set_column(i, field, arr)
        pq.write_table(table, path)


def _truncate_all(dst: str) -> None:
    for f in os.listdir(dst):
        if f.endswith(".parquet"):
            p = os.path.join(dst, f)
            t = pq.read_table(p)
            pq.write_table(t.slice(0, 0), p)


def generate(
    dst: str,
    seed: int,
    adversarial: bool = False,
    degenerate: bool = False,
    empty: bool = False,
) -> str:
    """Write the ten-table fixture into ``dst``; returns ``dst``."""
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)

    # region — fixed dimension (queries filter on literal region names)
    _write(
        dst,
        "region",
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
        {"r_regionkey": np.arange(5, dtype="int32"), "r_name": REGIONS},
    )

    # nation — fixed names, randomized (adversarial: skewed) region map
    if adversarial:
        n_regionkey = np.where(np.arange(N_NATIONS) < 20, 2, rng.integers(0, 5, N_NATIONS))
    else:
        n_regionkey = rng.integers(0, 5, N_NATIONS)
    _write(
        dst,
        "nation",
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
        {
            "n_nationkey": np.arange(N_NATIONS, dtype="int32"),
            "n_name": [f"NATION_{i}" for i in range(N_NATIONS)],
            "n_regionkey": n_regionkey.astype("int32"),
        },
    )

    # customer
    nc = SIZES["customer"]
    if adversarial:
        # coarse balance grid (ties, incl. zero and negative), skewed nations
        acctbal = rng.choice([-846.69, -100.0, 0.0, 0.01, 500.5, 500.5, 5000.0, 9916.12], nc)
        c_nation = rng.choice(np.arange(N_NATIONS), nc, p=_zipf_p(N_NATIONS))
    else:
        acctbal = np.round(rng.uniform(-999.99, 9999.99, nc), 2)
        c_nation = rng.integers(0, N_NATIONS, nc)
    _write(
        dst,
        "customer",
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
        {
            "c_custkey": np.arange(nc, dtype="int64"),
            "c_name": [f"Customer#{i:09d}" for i in range(nc)],
            "c_nationkey": c_nation.astype("int32"),
            "c_acctbal": acctbal,
            "c_mktsegment": rng.choice(MKTSEGMENTS, nc),
        },
    )

    # supplier
    ns = SIZES["supplier"]
    _write(
        dst,
        "supplier",
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
        {
            "s_suppkey": np.arange(ns, dtype="int64"),
            "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
            "s_nationkey": rng.integers(0, N_NATIONS, ns).astype("int32"),
            "s_acctbal": np.round(rng.uniform(500.0, 6100.0, ns), 2),
        },
    )

    # part
    npart = SIZES["part"]
    retail = (
        rng.choice([900.0, 905.5, 910.0, 915.25, 919.9], npart)
        if adversarial
        else np.round(900.0 + rng.uniform(0, 19.9, npart), 2)
    )
    _write(
        dst,
        "part",
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
        {
            "p_partkey": np.arange(npart, dtype="int64"),
            "p_name": [
                f"{rng.choice(P_ADJS)} {rng.choice(P_NOUNS)}" for _ in range(npart)
            ],
            "p_brand": [f"Brand#{rng.integers(1, 26)}" for _ in range(npart)],
            "p_type": rng.choice(P_TYPES, npart),
            "p_size": rng.integers(1, 51, npart).astype("int32"),
            "p_retailprice": retail,
        },
    )

    # orders
    no = SIZES["orders"]
    if adversarial:
        o_cust = rng.choice(np.arange(nc), no, p=_zipf_p(nc))
        days = rng.integers(_DAY0_ORDERS, _DAYN_ORDERS + 1, no)
        burst = rng.random(no) < 0.3  # 30% of orders on one date
        days[burst] = (np.datetime64("1998-06-15") - np.datetime64("1970-01-01")).astype(int)
        days[0], days[1] = _DAY0_ORDERS, _DAYN_ORDERS  # domain edges
        total = rng.choice([1320.51, 25000.0, 25000.0, 100000.0, 499705.05], no)
    else:
        o_cust = rng.integers(0, nc, no)
        days = rng.integers(_DAY0_ORDERS, _DAYN_ORDERS + 1, no)
        total = np.round(rng.uniform(1320.0, 499706.0, no), 2)
    _write(
        dst,
        "orders",
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        {
            "o_orderkey": np.arange(no, dtype="int64"),
            "o_custkey": o_cust.astype("int64"),
            "o_orderstatus": rng.choice(ORDERSTATUS, no),
            "o_totalprice": total,
            "o_orderdate": _ts(days),
            "o_orderpriority": rng.choice(PRIORITIES, no),
        },
    )

    # lineitem — 0..7 lines per order (some orders intentionally childless)
    lines_per = rng.integers(1, 8, no)
    lines_per[rng.random(no) < 0.02] = 0  # ~2% childless orders (outer-join paths)
    if adversarial:
        lines_per[0] = 7  # the burst customer's mega-order keeps max fan-out
    l_orderkey = np.repeat(np.arange(no, dtype="int64"), lines_per)
    nl = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, k + 1) for k in lines_per if k > 0]).astype("int32")
    if adversarial:
        l_part = rng.choice(np.arange(npart), nl, p=_zipf_p(npart))  # hot parts
        eprice = rng.choice([914.44, 1000.0, 1000.0, 50000.0, 104998.18], nl)
    else:
        l_part = rng.integers(0, npart, nl)
        eprice = np.round(rng.uniform(914.0, 104999.0, nl), 2)
    order_days = days[l_orderkey]
    _write(
        dst,
        "lineitem",
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
        {
            "l_orderkey": l_orderkey,
            "l_partkey": l_part.astype("int64"),
            "l_suppkey": rng.integers(0, ns, nl).astype("int64"),
            "l_linenumber": l_linenumber,
            "l_quantity": rng.integers(1, 51, nl).astype("float64"),
            "l_extendedprice": eprice,
            "l_discount": np.round(rng.integers(0, 11, nl) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, nl) * 0.01, 2),
            "l_returnflag": rng.choice(RETURNFLAGS, nl),
            "l_linestatus": rng.choice(LINESTATUS, nl),
            "l_shipdate": _ts(order_days + rng.integers(1, 121, nl)),
        },
    )

    # events
    ne = SIZES["events"]
    day = rng.integers(_DAY0_EVENTS, _DAY0_EVENTS + 30, ne)
    micro = rng.integers(0, 86_400_000_000, ne)
    user = rng.integers(0, 15, ne)
    if adversarial:
        # duplicate (user, ts) pairs: copy the first 50 events' identity
        day[50:100], micro[50:100], user[50:100] = day[:50], micro[:50], user[:50]
        value = rng.choice([0.03, 1.0, 1.0, 50.5, 327.53], ne)
    else:
        value = np.round(rng.uniform(0.03, 327.53, ne), 2)
    _write(
        dst,
        "events",
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
        {
            "event_id": np.arange(ne, dtype="int64"),
            "ts": _ts(day, micro),
            "user_id": user.astype("int64"),
            "event_type": rng.choice(
                EVENT_TYPES, ne, p=[0.5, 0.05, 0.1, 0.05, 0.3] if adversarial else None
            ),
            "value": value,
            "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)],
        },
    )

    # documents — planted exact dups + one-word near-dups in adversarial mode
    nd = SIZES["documents"]
    texts = [
        " ".join(rng.choice(DOC_VOCAB, rng.integers(8, 101)))
        for _ in range(nd)
    ]
    if adversarial:
        for i in range(0, 40, 2):  # 20 exact-duplicate pairs
            texts[i + 1] = texts[i]
        for i in range(40, 80, 2):  # 20 near-duplicate pairs (one word off)
            words = texts[i].split()
            words[len(words) // 2] = "neardup"
            texts[i + 1] = " ".join(words)
    _write(
        dst,
        "documents",
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
        {
            "doc_id": np.arange(nd, dtype="int64"),
            "text": texts,
            "lang": rng.choice(LANGS, nd),
            "source": rng.choice(SOURCES, nd),
            "n_chars": np.array([len(t) for t in texts], dtype="int64"),
        },
    )

    # embeddings — unit-norm float32; adversarial plants cosine>=0.9 pairs
    nv = SIZES["embeddings"]
    vecs = rng.standard_normal((nv, EMB_DIM)).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    if adversarial:
        for i in range(0, 40, 2):  # planted near-identical pairs
            jitter = rng.standard_normal(EMB_DIM).astype("float32") * 0.02
            v = vecs[i] + jitter
            vecs[i + 1] = v / np.linalg.norm(v)
    _write(
        dst,
        "embeddings",
        pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
        {
            "vec_id": np.arange(nv, dtype="int64"),
            "embedding": [v for v in vecs],
            "label": rng.integers(0, 10, nv).astype("int32"),
        },
    )
    if degenerate:
        _flatten_degenerate(dst)
    if empty:
        _truncate_all(dst)
    return dst


def _zipf_p(n: int, s: float = 1.1) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1) ** s
    return p / p.sum()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("dst")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--adversarial", action="store_true")
    ap.add_argument("--degenerate", action="store_true")
    ap.add_argument("--empty", action="store_true")
    a = ap.parse_args()
    generate(a.dst, a.seed, a.adversarial, a.degenerate, a.empty)
    print(
        f"wrote randomized fixture to {a.dst} (seed={a.seed}, "
        f"adversarial={a.adversarial}, degenerate={a.degenerate}, "
        f"empty={a.empty})"
    )
