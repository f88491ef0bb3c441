"""bench_diff adjudication contract (round-9 verdict task #6): a real
injected slowdown must survive adjudication, while a co-tenant "hot
window" sweeping a time-contiguous third of the suite must produce zero
survivors once re-measurement sees calm values.  Also pins the
isolated-session floor: a query whose re-measurement sits at its
recorded healthy floor can never survive as a flag, even when that
floor is far above its warm base.

_remeasure is monkeypatched -- these tests exercise the adjudication
LOGIC, not the co-tenant host."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench_diff():
    spec = importlib.util.spec_from_file_location(
        "bench_diff", os.path.join(_REPO, "tools", "bench_diff.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write(tmp_path, name, queries, floors=None):
    doc = {"queries": queries}
    if floors:
        doc["floors"] = floors
    p = str(tmp_path / name)
    with open(p, "w") as fh:
        json.dump(doc, fh)
    return p


def _run(bench_diff, monkeypatch, base_path, cur_path, remeasured):
    monkeypatch.setattr(bench_diff, "_remeasure", lambda names: {
        n: remeasured[n] for n in names if n in remeasured
    })
    monkeypatch.setattr(sys, "argv", ["bench_diff.py", base_path, cur_path])
    return bench_diff.main()


# 60 synthetic queries, q00..q59, warm base 0.5 s each -- large enough
# for canary selection to find unflagged same-magnitude neighbors
_BASE = {f"q{i:02d}": 0.5 for i in range(60)}


def test_injected_slowdown_survives(bench_diff, monkeypatch, tmp_path):
    cur = dict(_BASE)
    cur["q07"] = 1.8  # a real 3.6x regression
    base_path = _write(tmp_path, "base.json", _BASE)
    cur_path = _write(tmp_path, "cur.json", cur)
    # re-measurement reproduces the slowdown; canaries re-run at base
    remeasured = dict(_BASE)
    remeasured["q07"] = 1.8
    rc = _run(bench_diff, monkeypatch, base_path, cur_path, remeasured)
    assert rc == 1, "a reproduced 3.6x regression must survive"


def test_hot_window_produces_zero_survivors(bench_diff, monkeypatch, tmp_path):
    """A load window slows a contiguous third of the bench run 3x; by
    adjudication time the window has passed and every query re-measures
    at its base -- zero survivors, exit 0."""
    cur = dict(_BASE)
    for i in range(20, 40):  # the window's third
        cur[f"q{i:02d}"] = 1.5
    base_path = _write(tmp_path, "base.json", _BASE)
    cur_path = _write(tmp_path, "cur.json", cur)
    rc = _run(bench_diff, monkeypatch, base_path, cur_path, dict(_BASE))
    assert rc == 0, "calm re-measurement must dismiss the whole window"


def test_floor_kills_isolated_session_false_positive(
    bench_diff, monkeypatch, tmp_path
):
    """The pareto_revenue_share shape: warm base 0.5 s but a healthy
    isolated-session cost of 1.4 s.  Without a floor the 2.8x re-run
    survives forever; with the recorded floor it is dismissed."""
    cur = dict(_BASE)
    cur["q11"] = 1.4  # in-bench hiccup puts it over FLAG_RATIO
    remeasured = dict(_BASE)
    remeasured["q11"] = 1.4  # re-runs at its isolated floor, every time

    base_path = _write(tmp_path, "base.json", _BASE)
    cur_path = _write(tmp_path, "cur.json", cur)
    assert _run(
        bench_diff, monkeypatch, base_path, cur_path, remeasured
    ) == 1, "sanity: without a floor this false-positive survives"

    floored = _write(
        tmp_path, "base_floored.json", _BASE, floors={"q11": 1.4}
    )
    assert _run(
        bench_diff, monkeypatch, floored, cur_path, remeasured
    ) == 0, "the recorded floor must dismiss the re-run at floor"
