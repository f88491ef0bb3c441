"""One-command correctness gate: run every declared query (or a subset)
against its DuckDB oracle at a given scale factor, mirroring the driver's
count+schema+value-hash compare exactly.

Usage:
    python tools/gate.py                        # full sweep at sf0.01
    python tools/gate.py /root/testdata/sf0.1   # 10x stress gate
    python tools/gate.py --subset set_except,bm25_retrieval_topk
    python tools/gate.py /root/testdata/sf0.01 --subset dedup_exact_docs

Prints one line per query (MATCH / rows-only / FAIL) and a final
``DONE. failures: [...]`` line; exit code 1 if any failure.  This is the
loop the verify skill, the driver, and the judge all run — kept here so
it is one command instead of a heredoc.
"""

from __future__ import annotations

import os
import sys
import threading
import traceback

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    subset: set[str] | None = None
    if "--subset" in args:
        i = args.index("--subset")
        subset = {s.strip() for s in args[i + 1].split(",") if s.strip()}
        args = args[:i] + args[i + 2:]
    sf_dir = args[0].rstrip("/") if args else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as e
    from conftest import assert_oracle_match
    from etl_rf_matrix_controller_spark.session import get_spark

    spark = get_spark(app_name="gate")
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = e.queries(), e.oracle_sql()
    names = sorted(qs)
    if subset is not None:
        unknown = subset - set(names)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 2
        names = sorted(subset)

    con = duckdb.connect()
    # Pathological-oracle guard rails (a runaway oracle once spilled
    # >80 GB of DuckDB temp into the repo tree): spill OUTSIDE the repo,
    # cap memory so DuckDB spills instead of OOMing the host, and
    # interrupt any oracle that exceeds a wall-clock budget so the gate
    # fails fast instead of filling the disk.
    tmp = os.environ.get("GATE_DUCKDB_TMP", "/tmp/duckdb_gate_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory = '{tmp}'")
    con.execute(
        f"SET memory_limit = '{os.environ.get('GATE_DUCKDB_MEM', '24GB')}'"
    )
    budget = float(os.environ.get("GATE_ORACLE_BUDGET_SEC", "300"))
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    class OracleWatchdog:
        """Interrupt DuckDB if ONE oracle exceeds the wall-clock budget.
        The timer callback re-checks an 'armed' flag under a lock before
        interrupting, so a timer that fires in the window between the
        oracle finishing and cancel() can never deliver a stray
        interrupt to the NEXT oracle; it wraps only the DuckDB execution
        (via assert_oracle_match's duck_ctx), so Spark-side time is
        never misattributed as an oracle timeout."""

        def __init__(self) -> None:
            self._lock = threading.Lock()
            self._armed = False
            self._timer: threading.Timer | None = None

        def _fire(self) -> None:
            with self._lock:
                if self._armed:
                    con.interrupt()

        def __enter__(self) -> "OracleWatchdog":
            self._armed = True
            self._timer = threading.Timer(budget, self._fire)
            self._timer.start()
            return self

        def __exit__(self, *exc) -> None:
            with self._lock:
                self._armed = False
            self._timer.cancel()

    failures: list[str] = []
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir)
            if name in osql:
                assert_oracle_match(
                    sdf, con, osql[name], name=name, duck_ctx=OracleWatchdog
                )
                print(name, "MATCH", flush=True)
            else:
                n = sdf.count()
                status = "rows-only:" if n > 0 else "VACUOUS rows-only:"
                if n == 0:
                    failures.append(name)
                print(name, status, n, flush=True)
        except Exception:
            failures.append(name)
            print(name, "FAIL", flush=True)
            traceback.print_exc()

    print(f"DONE. failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
