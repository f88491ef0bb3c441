"""Generated artifacts must stay in lockstep with the live registry.

Round 4 shipped with tests/result_manifest.json, OPERATORS.md, PLANS.md and
SURVEY.md's status line all stale against the registry because a late commit
added queries without rerunning the generators.  This test makes that class
of drift a pytest failure: register a query -> regenerate the artifacts
(tools/gen_result_manifest.py, tools/gen_operators_md.py,
tools/plan_audit.py) or the suite goes red.

Pure string/JSON compares — no SparkSession is started.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from etl_rf_matrix_controller_spark.plans import registry

REPO = Path(__file__).resolve().parent.parent

registry.load_all()


def test_result_manifest_covers_every_oracled_query() -> None:
    manifest = json.loads((REPO / "tests" / "result_manifest.json").read_text())
    missing = sorted(set(registry.ORACLES) - set(manifest))
    extra = sorted(set(manifest) - set(registry.ORACLES))
    assert not missing, (
        f"result_manifest.json missing {len(missing)} oracled queries "
        f"(run tools/gen_result_manifest.py): {missing[:10]}"
    )
    assert not extra, (
        f"result_manifest.json has {len(extra)} entries not in the registry "
        f"(run tools/gen_result_manifest.py): {extra[:10]}"
    )


def test_operators_md_counts_match_registry() -> None:
    text = (REPO / "OPERATORS.md").read_text()
    m = re.search(r"(\d+) declared, (\d+) DuckDB-oracle-checked", text)
    assert m, "OPERATORS.md count line not found (run tools/gen_operators_md.py)"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"OPERATORS.md says {m.group(1)} declared but registry has "
        f"{len(registry.QUERIES)} (run tools/gen_operators_md.py)"
    )
    assert int(m.group(2)) == len(registry.ORACLES)
    rows = re.findall(r"^\| `([a-z0-9_]+)` \|", text, flags=re.M)
    assert set(rows) == set(registry.QUERIES), (
        "OPERATORS.md rows != registry (run tools/gen_operators_md.py)"
    )


def test_plans_md_rows_match_registry() -> None:
    text = (REPO / "PLANS.md").read_text()
    rows = set(re.findall(r"^\| ([a-z0-9_]+) \|", text, flags=re.M))
    rows.discard("query")  # header
    missing = sorted(set(registry.QUERIES) - rows)
    extra = sorted(rows - set(registry.QUERIES))
    assert not missing, (
        f"PLANS.md missing {len(missing)} queries "
        f"(run tools/plan_audit.py): {missing[:10]}"
    )
    assert not extra, (
        f"PLANS.md has {len(extra)} stale rows "
        f"(run tools/plan_audit.py): {extra[:10]}"
    )


def test_benchnotes_header_is_current_round() -> None:
    """BENCHNOTES.md was the one artifact class round 5 let go stale (its
    header still said "round 4" at round close).  The current round is
    always 1 + the newest driver-recorded BENCH_r{N}.json (the driver
    commits BENCH_r{N} after round N's snapshot, so during round N+1's
    session the newest bench file is r{N}).  Round-boundary grace
    (round-8 verdict hygiene note): the driver drops BENCH_r{N}.json
    into the tree AFTER the round-N session closes, so the first run of
    round N+1 would otherwise start red by design — tolerate a header
    that lags by exactly one round (== max recorded), and only fail
    when it is 2+ rounds stale or ahead of the boundary."""
    rounds = [
        int(m.group(1))
        for p in REPO.glob("BENCH_r*.json")
        if (m := re.match(r"BENCH_r(\d+)\.json", p.name))
    ]
    assert rounds, "no BENCH_r*.json driver artifacts found"
    current = max(rounds) + 1
    header = (REPO / "BENCHNOTES.md").read_text().splitlines()[0]
    m = re.search(r"round (\d+)", header)
    assert m, f"BENCHNOTES.md header has no round marker: {header!r}"
    assert int(m.group(1)) in (current, current - 1), (
        f"BENCHNOTES.md header says round {m.group(1)} but this is round "
        f"{current} — add the round-{current} section and bump the header"
    )


def test_survey_status_counts_match_registry() -> None:
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(r"\((\d+) queries registered,\n(\d+) with DuckDB oracles", text)
    assert m, "SURVEY.md implementation-status count line not found"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"SURVEY.md says {m.group(1)} queries but registry has "
        f"{len(registry.QUERIES)} (run tools/gen_operators_md.py)"
    )
    assert int(m.group(2)) == len(registry.ORACLES)


def test_bench_base_covers_registry() -> None:
    """BENCH_BASE.json (the regression-diff baseline) must cover the FULL
    registry: round 6 shipped with a 223-query base, leaving the 140
    queries added since round 3 invisible to tools/bench_diff.py.  Rebase
    (archive the old file, copy an idle-run BENCH_DETAIL.json) whenever
    queries are added."""
    base = json.loads((REPO / "BENCH_BASE.json").read_text())["queries"]
    missing = sorted(set(registry.QUERIES) - set(base))
    extra = sorted(set(base) - set(registry.QUERIES))
    assert not missing, (
        f"BENCH_BASE.json missing {len(missing)} queries (rebase from an "
        f"idle-run BENCH_DETAIL.json): {missing[:10]}"
    )
    assert not extra, (
        f"BENCH_BASE.json has {len(extra)} stale queries: {extra[:10]}"
    )
