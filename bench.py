"""Benchmark harness: run every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the JVM-side noop sink (count() would
let Catalyst prune the whole projection; noop executes the full plan but
writes nothing).
"""

from __future__ import annotations

import json
import os
import sys
import time

from etl_rf_matrix_controller_spark.plans import registry
from etl_rf_matrix_controller_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="etl-rf-matrix-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + file listing outside the timed region.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        best = float("inf")
        for _ in range(2):  # steady-state: min of 2 runs damps GC noise
            try:
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # one bad query must not kill the bench
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                break
            finally:
                spark.catalog.clearCache()  # drop per-query persists
        if best < float("inf"):
            timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "declared_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
