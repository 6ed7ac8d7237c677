"""Unit tests for bench.py's pure guard computations — the 10x-rung
ratio/no-super-linear gate must behave under errored/missing base
timings without dividing by zero or None."""

from __future__ import annotations

import importlib.util
import os


def _bench():
    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", p)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_ratio_guard_flags_only_super_linear():
    m = _bench()
    g = m._ratio_guard(
        {"a": 2.0, "b": 40.0, "c": 1.0},
        {"a": 1.0, "b": 2.0, "c": 1.0},
        slack=15.0,
    )
    assert g["ratios"] == {"a": 2.0, "b": 20.0, "c": 1.0}
    assert g["worst"] == 20.0
    assert g["breached"] == {"b": 20.0}


def test_ratio_guard_skips_missing_and_zero_base():
    m = _bench()
    g = m._ratio_guard(
        {"a": 2.0, "b": 3.0, "c": 4.0},
        {"a": 1.0, "b": None, "d": 9.9},  # b errored, c never measured
        slack=15.0,
    )
    assert g["ratios"] == {"a": 2.0}
    assert g["breached"] == {}
    g0 = m._ratio_guard({"a": 1.0}, {"a": 0.0}, slack=15.0)
    assert g0["ratios"] == {} and g0["worst"] is None


def test_sf_from_dir():
    m = _bench()
    assert m.sf_from_dir("/root/testdata/sf0.1") == 0.1
    assert m.sf_from_dir("/nowhere") == -1.0


def test_host_block_reports_load_and_interval_steal():
    """VERDICT r9 #4: the bench JSON must carry in-record host-load
    attribution. steal% is computed over each adjacent sample interval
    from cumulative /proc/stat jiffies; missing /proc data degrades to
    absent keys, never a crash."""
    m = _bench()
    live = m._host_sample("probe")
    assert live["label"] == "probe"  # on this Linux host both facets exist
    assert live["load1"] is not None and live["_total"] is not None
    s = [
        {"label": "start", "load1": 1.0, "_steal": 100, "_total": 10_000},
        {"label": "mid", "load1": 2.0, "_steal": 150, "_total": 10_500},
        {"label": "end", "load1": 1.5, "_steal": 150, "_total": 11_500},
    ]
    b = m._host_block(s)
    assert b["load1"] == {"start": 1.0, "mid": 2.0, "end": 1.5}
    assert b["steal_pct"] == {"start->mid": 10.0, "mid->end": 0.0}
    # a sample with unreadable /proc/stat contributes no interval
    s[1]["_total"] = None
    assert m._host_block(s)["steal_pct"] == {}
    # non-monotonic totals (counter reset) are skipped, not negative
    s2 = [
        {"label": "a", "load1": None, "_steal": 500, "_total": 9_000},
        {"label": "b", "load1": None, "_steal": 100, "_total": 5_000},
    ]
    assert m._host_block(s2)["steal_pct"] == {}


def test_scale_rung_skips_unstaged_dir_when_gated():
    """The 100x rung must never replicate 1.7 GB inside the driver's
    bench run — a blown budget there loses the round's only bench
    record. With stage_if_missing=False an absent staging records a
    skip (with the restore command) and returns before touching Spark."""
    m = _bench()
    out: dict = {}
    m._scale_rung(
        None,  # spark unused on the skip path
        {},
        out,
        key="sfx10",
        dst="/tmp/definitely-not-staged-xyz",
        k=100,
        slack=15.0,
        n_runs=1,
        stage_if_missing=False,
    )
    blk = out["sfx10"]
    assert "tools/scale10x.py" in blk["skipped"]
    assert blk["k_vs_sf01"] == 100
    assert not blk.get("guard_failed")  # a skip is not a guard failure


def _scale10x():
    p = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "scale10x.py",
    )
    spec = importlib.util.spec_from_file_location("scale10x_mod", p)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_replicate_rejects_k_below_one():
    """ADVICE r9: k=0 builds F.sequence(0, -1) — a DESCENDING sequence
    staging two copies with negative key offsets — and would then write
    a marker recording the bogus dir as a valid staging."""
    import pytest

    m = _scale10x()
    for k in (0, -3):
        with pytest.raises(ValueError, match="must be >= 1"):
            m.replicate(None, "/tmp/never-written", k)


def test_staged_rejects_wrong_src_and_wrong_k(tmp_path):
    """ADVICE r9: the marker records WHICH source fixture built the dir;
    a staging of a different src must not pass as complete or it gets
    silently timed against the wrong baseline."""
    import json

    m = _scale10x()
    marker = tmp_path / m.MARKER
    marker.write_text(json.dumps({"k": 10, "src": "/some/other/fixture"}))
    assert not m.staged(str(tmp_path), 10)
    marker.write_text(json.dumps({"k": 100, "src": m.SRC}))
    assert not m.staged(str(tmp_path), 10)
    marker.write_text(json.dumps({"k": 10, "src": m.SRC}))
    assert m.staged(str(tmp_path), 10)
    marker.unlink()
    assert not m.staged(str(tmp_path), 10)
