"""Snapshot every declared query's sf0.001 result hash into
tests/result_manifest.json -- the byte-stability regression net.

Any refactor that silently changes a query's output (row set, schema, or
a single float bit) fails tests/test_result_manifest.py locally BEFORE
the driver's next correctness sample lands on it.  Regenerate ONLY when
a result change is deliberate (new query, intentional semantics change),
and say so in the commit message.

The two no-oracle sketch queries (HLL, approx-percentile) are excluded:
their outputs depend on engine-internal sketch merge order, which is not
part of the repo's determinism contract.

Usage: python tools/gen_result_manifest.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from conftest import result_hash  # noqa: E402

from etl_rf_matrix_controller_spark.plans import registry  # noqa: E402
from etl_rf_matrix_controller_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
MANIFEST = "tests/result_manifest.json"


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="result-manifest")
    spark.sparkContext.setLogLevel("ERROR")
    manifest = {}
    for name in sorted(registry.QUERIES):
        if name not in registry.ORACLES:
            continue  # sketch internals: rows-only by design
        manifest[name] = result_hash(registry.QUERIES[name](spark, SF_DIR))
        print(name, manifest[name][:16])
    with open(MANIFEST, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST}: {len(manifest)} entries")
    spark.stop()


if __name__ == "__main__":
    main()
