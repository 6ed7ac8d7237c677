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
