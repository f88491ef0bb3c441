"""Retention sweep for the persistent bucketed index root.

The index family is write-once per (kind, corpus fingerprint, builder
version): regenerated testdata or a version bump mints a NEW tag and the
old location simply stops being referenced -- across many sessions and
stress corpora the root accumulates stale tables (VERDICT round-7 nit).
This CLI computes the LIVE tags (the standard testdata scale dirs x the
two index source tables) and deletes everything else, plus crashed
publishers' .build-/.old- residue and manifest-RETIRED generations past
the grace period (the reclamation leg of concurrent-reader-safe
compaction -- compact_index retires, this sweep deletes).

Usage: python tools/prune_indexes.py [--dry-run] [--retired-age-s N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_rf_matrix_controller_spark.plans.gram_index import (  # noqa: E402
    corpus_fingerprint,
    index_root,
    prune_stale_indexes,
)

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
SOURCE_TABLES = ("documents", "embeddings")


def main() -> int:
    dry = "--dry-run" in sys.argv
    retired_age_s = None
    if "--retired-age-s" in sys.argv:
        retired_age_s = int(sys.argv[sys.argv.index("--retired-age-s") + 1])
    live = {
        corpus_fingerprint(d, t)
        for d in SF_DIRS
        for t in SOURCE_TABLES
        if os.path.exists(os.path.join(d, f"{t}.parquet"))
    }

    def du(path: str) -> int:
        total = 0
        for r, _d, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(r, f))
                except OSError:
                    pass
        return total

    before = du(index_root())
    removed = prune_stale_indexes(
        live, dry_run=dry, retired_age_s=retired_age_s
    )
    after = du(index_root()) if not dry else before
    verb = "would remove" if dry else "removed"
    print(f"live tags: {sorted(live)}")
    for p in removed:
        print(f"  {verb} {os.path.basename(p)}")
    print(
        f"{verb} {len(removed)} locations; root "
        f"{before / 1e6:.1f} MB -> {after / 1e6:.1f} MB"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
