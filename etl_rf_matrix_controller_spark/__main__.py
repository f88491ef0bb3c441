"""CLI entry point: run any declared query from the shell.

The reference is a runnable application (``python etl_controller.py``);
this gives the engine the same property for its query surface::

    python -m etl_rf_matrix_controller_spark --list
    python -m etl_rf_matrix_controller_spark route_latest_state
    python -m etl_rf_matrix_controller_spark q1_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 5 --explain

Prints the result via DataFrame.show (driver-side, bounded by --limit);
--explain prints the formatted physical plan instead of executing.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m etl_rf_matrix_controller_spark",
        description="Run a declared query against a testdata scale dir.",
    )
    p.add_argument("query", nargs="?", help="declared query name")
    p.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.001",
        help="scale-factor directory of parquet tables",
    )
    p.add_argument(
        "--limit", type=int, default=20, help="max rows to show (default 20)"
    )
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of running",
    )
    p.add_argument(
        "--list", action="store_true", help="list declared query names"
    )
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    from etl_rf_matrix_controller_spark.plans import registry

    args = build_parser().parse_args(argv)
    registry.load_all()
    queries = registry.QUERIES
    if args.list or not args.query:
        for name in sorted(queries):
            print(name)
        return 0
    if args.query not in queries:
        print(f"unknown query: {args.query!r} (use --list)", file=sys.stderr)
        return 2
    owns_spark = spark is None
    if owns_spark:
        from etl_rf_matrix_controller_spark.session import get_spark

        spark = get_spark(app_name=f"cli-{args.query}")
    try:
        df = queries[args.query](spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0
    finally:
        if owns_spark:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
