"""Run the end-to-end curation pipeline at a given scale and print the
per-stage accounting + manifest summary (the BENCHNOTES record).

Usage: python tools/curate_e2e.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from etl_rf_matrix_controller_spark.operators.curate_run import (  # noqa: E402
    curate_training_set,
)
from etl_rf_matrix_controller_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_curate_e2e"


def main() -> None:
    spark = get_spark(app_name="curate-e2e")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    res = curate_training_set(spark, SF_DIR, OUT)
    dt = time.perf_counter() - t0
    man = res["manifest"]
    print(json.dumps({"stages": res["stages"]}, indent=1))
    print(
        f"shards: {len(man['shards'])}, total_docs: {man['total_docs']}, "
        f"total_tokens: {man['total_tokens']}"
    )
    print(f"wall: {dt:.1f}s at {SF_DIR}")
    spark.stop()


if __name__ == "__main__":
    main()
