"""Record isolated-session floors for declared queries into
BENCH_BASE.json (round-9 verdict: de-alias bench adjudication).

BENCH_BASE's per-query numbers are warm minima from a JIT-mature
400-query bench; bench_diff's adjudicator runs candidates in a FRESH
session, where some queries pay a large fixed cost (session-first scan
listing, codegen for a wide plan) and re-measure 2-3x their warm base
even when perfectly healthy -- a standing false positive
(pareto_revenue_share, round 9).  This tool measures what a query costs
in a fresh session under the adjudicator's own protocol (one untimed
warm-up + min-of-2 timed noop-sink runs) and stores it as
``floors[name]`` in BENCH_BASE.json; bench_diff then compares
re-measurements against max(warm_base * canary_drift, floor).

Queries are measured in small chunks, each in its OWN subprocess
session, so the floor reflects isolated-session cost, not a warm bench.

Usage:
    python tools/bench_floor.py --only q1,q2 [--chunk 4]
    python tools/bench_floor.py --all          # every query; slow
Run once per BENCH_BASE rebase (or for queries bench_diff keeps
mis-flagging); floors for de-registered queries are dropped on merge.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(REPO, "BENCH_BASE.json")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from etl_rf_matrix_controller_spark.plans import registry
from etl_rf_matrix_controller_spark.session import get_spark

registry.load_all()
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="bench-floor")
spark.sparkContext.setLogLevel("ERROR")
names = {names!r}
out = {{}}
for name in names:  # adjudicator protocol: warm-up + min-of-2 timed
    fn = registry.QUERIES[name]
    try:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    finally:
        spark.catalog.clearCache()
    best = float("inf")
    for _ in range(2):
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        finally:
            spark.catalog.clearCache()
    out[name] = round(best, 3)
print("FLOORS::" + json.dumps(out))
spark.stop()
"""


def main() -> int:
    args = sys.argv[1:]
    chunk = 4
    if "--chunk" in args:
        chunk = int(args[args.index("--chunk") + 1])
    with open(BASE) as fh:
        doc = json.load(fh)
    registered = set(doc["queries"])
    if "--only" in args:
        names = [
            n for n in args[args.index("--only") + 1].split(",") if n
        ]
        unknown = [n for n in names if n not in registered]
        if unknown:
            print(f"not in BENCH_BASE queries: {unknown}")
    elif "--all" in args:
        names = sorted(registered)
    else:
        print(__doc__)
        return 2

    floors: dict[str, float] = {
        k: v
        for k, v in doc.get("floors", {}).items()
        if k in registered  # drop de-registered strays on merge
    }
    for i in range(0, len(names), chunk):
        batch = names[i : i + chunk]
        code = _CHILD.format(repo=REPO, names=batch)
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("FLOORS::")
            ),
            None,
        )
        if line is None:
            print(f"chunk {batch} failed:\n{proc.stderr[-2000:]}")
            return 1
        got = json.loads(line[len("FLOORS::") :])
        floors.update(got)
        for k, v in got.items():
            print(f"{k}: floor {v:.3f}s (warm base {doc['queries'].get(k)})")
    doc["floors"] = dict(sorted(floors.items()))
    with open(BASE, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(f"wrote {len(floors)} floors to BENCH_BASE.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
