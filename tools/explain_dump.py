"""Dump .explain('formatted') for declared queries to plans/<round>/<q>_<tag>.txt.

Usage: python tools/explain_dump.py <tag> <query> [<query> ...] [--sf DIR]
                                    [--round rNN]

``--round`` defaults to r11 (the current optimization round's dump dir).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    rnd = "r11"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        args = args[:i] + args[i + 2 :]
    tag, names = args[0], args[1:]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from etl_rf_matrix_controller_spark.plans import registry
    from etl_rf_matrix_controller_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(repo, "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
