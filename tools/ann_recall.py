"""ANN recall measurement: how many of the true top-k neighbors do the
LSH and IVF variants return?  Honest numbers for the recall/cost tradeoff
documented in BENCHNOTES.md.

Usage: python tools/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from etl_rf_matrix_controller_spark.plans import registry  # noqa: E402
from etl_rf_matrix_controller_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    registry.load_all()
    spark = get_spark(app_name="ann-recall")
    spark.sparkContext.setLogLevel("ERROR")

    def pairs(name):
        return {
            (r.query_id, r.cand_id)
            for r in registry.QUERIES[name](spark, SF_DIR).collect()
        }

    truth = pairs("knn_brute_force")
    for name in (
        "ann_lsh_topk",
        "ann_lsh_multiprobe",
        "ann_ivf_topk",
        "knn_quantized_i8",
    ):
        approx = pairs(name)
        hit = len(truth & approx)
        scanned = (
            "full scan, int8"
            if "quantized" in name
            else ("~1/256 buckets" if "lsh" in name else "~1/n_lists")
        )
        print(
            f"{name}: recall@3 = {hit}/{len(truth)} = {hit / len(truth):.2f} "
            f"(returned {len(approx)} pairs; {scanned})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
