"""Bench regression diff: compare the current per-query bench map against a
previous round's detail file and flag steady-state regressions.

Usage:
    python tools/bench_diff.py [BASE_DETAIL.json] [CURRENT_DETAIL.json]

Defaults: base = BENCH_BASE.json (the previous round's checked-in detail),
current = BENCH_DETAIL.json (what ``python bench.py`` just wrote).  Both
files are the bench.py sidecar format ({"queries": {name: sec}, ...}).

Host is co-tenant (multi-second timing noise), so only ratios > 1.5x on
queries slower than 0.2 s are flagged; added/removed queries are listed.
Exit code 1 only if a flagged regression exists — noise-tolerant by design.
"""

from __future__ import annotations

import json
import os
import sys

FLAG_RATIO = 1.5
MIN_SEC = 0.2  # below this, timer noise dominates; never flag


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, "BENCH_BASE.json")
    cur_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "BENCH_DETAIL.json")
    if not os.path.exists(base_path):
        print(f"no base file at {base_path}; nothing to diff")
        return 0
    with open(base_path) as fh:
        base = json.load(fh)["queries"]
    with open(cur_path) as fh:
        cur = json.load(fh)["queries"]

    added = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    flagged: list[tuple[str, float, float, float]] = []
    rows: list[tuple[str, float, float, float]] = []
    for name in sorted(set(base) & set(cur)):
        b, c = base[name], cur[name]
        ratio = c / b if b > 0 else float("inf")
        rows.append((name, b, c, ratio))
        if ratio > FLAG_RATIO and c > MIN_SEC:
            flagged.append((name, b, c, ratio))

    rows.sort(key=lambda r: -r[3])
    print(f"| query | base s | cur s | ratio |")
    print(f"|---|---|---|---|")
    for name, b, c, ratio in rows[:15]:
        mark = " **FLAG**" if (name, b, c, ratio) in flagged else ""
        print(f"| {name} | {b:.3f} | {c:.3f} | {ratio:.2f}x{mark} |")
    tb = sum(base[n] for n in set(base) & set(cur))
    tc = sum(cur[n] for n in set(base) & set(cur))
    print(f"\nshared-query total: {tb:.1f} s -> {tc:.1f} s "
          f"({tc / tb:.2f}x) over {len(rows)} queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    if flagged:
        print(f"\nFLAGGED regressions (> {FLAG_RATIO}x and > {MIN_SEC}s): "
              f"{[f[0] for f in flagged]}")
        print("re-run bench.py to rule out co-tenant noise before acting")
        return 1
    print("\nno steady-state regressions flagged")
    return 0


if __name__ == "__main__":
    sys.exit(main())
