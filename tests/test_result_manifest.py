"""Byte-stability regression net: every oracle-bearing declared query's
sf0.001 result must hash exactly to the checked-in manifest
(tests/result_manifest.json, regenerated only deliberately via
tools/gen_result_manifest.py).

This is the local tripwire for the driver's correctness gate: the driver
samples ~50 of the declared queries per round, so a refactor that
silently perturbs an unsampled query's output could otherwise ship and
only surface rounds later.  The manifest compares the same canonical
form the gate hashes (sorted columns, canonicalized sorted rows), so
"manifest green" == "the driver would see the same bytes it saw when the
manifest was cut".
"""

from __future__ import annotations

import json
import os

from etl_rf_matrix_controller_spark.plans import registry

MANIFEST = os.path.join(os.path.dirname(__file__), "result_manifest.json")


def test_results_match_manifest(spark):
    from tests.conftest import result_hash

    with open(MANIFEST) as f:
        manifest = json.load(f)
    registry.load_all()
    oracle_names = sorted(registry.ORACLES)
    missing = [n for n in oracle_names if n not in manifest]
    assert not missing, (
        f"queries missing from manifest (regenerate deliberately): {missing}"
    )
    stale = [n for n in manifest if n not in registry.ORACLES]
    assert not stale, f"manifest entries for unknown queries: {stale}"
    # Overlapped independent jobs (guide §2.6): the 411 recomputes are
    # independent, and run sequentially the suite's single biggest test
    # (~5.6 min) left the session mostly idle between tiny jobs.  Eight
    # driver threads back-fill the tails (336 -> ~135 s measured); per-query hashes are
    # order-independent, index publishes are atomic with thread-unique
    # staging (plans/gram_index.py), and registration races re-resolve.
    from concurrent.futures import ThreadPoolExecutor

    def check(name: str):
        h = result_hash(
            registry.QUERIES[name](spark, "/root/testdata/sf0.001")
        )
        return name, h

    diffs = {}
    with ThreadPoolExecutor(max_workers=8) as pool:
        for name, h in pool.map(check, oracle_names):
            if h != manifest[name]:
                diffs[name] = (manifest[name][:16], h[:16])
    assert not diffs, (
        f"{len(diffs)} queries changed results vs manifest "
        f"(intentional? regenerate via tools/gen_result_manifest.py): {diffs}"
    )
