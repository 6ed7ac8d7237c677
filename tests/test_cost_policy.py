"""Mechanical guard for the cost-recording policy (VERDICT r7 #8).

tools/query_costs.json orders the driver rotation cheapest-first and is
min-merged, so a single sequential sf0.001 sweep recording its near-zero
wall times would permanently invert the ordering, and a parallel sweep's
contention-inflated times are equally invalid. Round 7 prevented this by
convention at the call site; these tests pin the policy INSIDE
_record_costs so any future caller inherits it.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_check():
    spec = importlib.util.spec_from_file_location(
        "tools_check", os.path.join(REPO, "tools", "check.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["tools_check"] = mod
    spec.loader.exec_module(mod)
    return mod


def _costs_bytes() -> bytes:
    with open(os.path.join(REPO, "tools", "query_costs.json"), "rb") as fh:
        return fh.read()


def test_record_costs_rejects_non_driver_sf():
    check = _load_check()
    before = _costs_bytes()
    assert (
        check._record_costs(
            {"q_join_inner": 0.001}, sf_dir="/root/testdata/sf0.001", jobs=1
        )
        is False
    )
    assert (
        check._record_costs(
            {"q_join_inner": 99.0}, sf_dir="/root/testdata/sf0.1", jobs=1
        )
        is False
    )
    assert _costs_bytes() == before, "refused write must not touch the file"


def test_record_costs_rejects_parallel_run():
    check = _load_check()
    before = _costs_bytes()
    assert (
        check._record_costs(
            {"q_join_inner": 0.001},
            sf_dir=f"/root/testdata/{check.DRIVER_SF}",
            jobs=8,
        )
        is False
    )
    assert _costs_bytes() == before


def test_record_costs_accepts_sequential_driver_sf(tmp_path, monkeypatch):
    check = _load_check()
    # redirect the costs file into tmp_path so the real one is untouched
    fake_tools = tmp_path / "tools"
    fake_tools.mkdir()
    (fake_tools / "query_costs.json").write_text('{"q_old": 5.0}')
    real_dirname = os.path.dirname
    monkeypatch.setattr(
        check.os.path,
        "dirname",
        lambda p: str(fake_tools) if p.endswith("check.py") else real_dirname(p),
    )
    ok = check._record_costs(
        {"q_old": 2.0, "q_new": 1.25},
        sf_dir=f"/root/testdata/{check.DRIVER_SF}",
        jobs=1,
    )
    assert ok is True
    written = json.loads((fake_tools / "query_costs.json").read_text())
    assert written == {"q_old": 2.0, "q_new": 1.25}  # min-merged
