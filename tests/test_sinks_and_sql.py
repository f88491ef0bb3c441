"""Sinks (CSV export) and the SQL API surface."""

from __future__ import annotations

import csv
import glob

from tests.conftest import SF_DIR


def test_export_routes_csv(spark, tmp_path):
    """S5: the denormalizing CSV export writes header + per-file-ordered
    rows (etl_controller.py:3283-3301)."""
    from etl_rf_matrix_controller_spark.operators.joins import (
        export_routes_csv,
        routes_csv_denorm,
    )

    df = routes_csv_denorm(spark, SF_DIR)
    out = str(tmp_path / "routes_csv")
    export_routes_csv(df, out)
    files = sorted(glob.glob(out + "/part-*.csv"))
    assert files, "no csv part files written"
    total, header = 0, None
    for fpath in files:
        with open(fpath) as fh:
            rows = list(csv.reader(fh))
        header = rows[0]
        body = rows[1:]
        total += len(body)
        ids = [int(r[0]) for r in body]
        assert ids == sorted(ids), "rows not sorted within file"
    assert header == [
        "output_id",
        "input_id",
        "output_name",
        "input_name",
        "nation_name",
        "total_price",
    ]
    assert total == df.count()


def test_sql_api_matches_dataframe(spark):
    """The SQL surface and the DataFrame operators agree."""
    from etl_rf_matrix_controller_spark.operators.joins import join_broadcast_dim
    from etl_rf_matrix_controller_spark.sources.views import sql

    via_sql = sql(
        spark,
        SF_DIR,
        """
        SELECT n.n_name AS nation_name,
               count(*) AS order_cnt,
               round(sum(o.o_totalprice), 2) AS sum_price
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        """,
    )
    via_df = join_broadcast_dim(spark, SF_DIR)
    a = {(r.nation_name, r.order_cnt) for r in via_sql.collect()}
    b = {(r.nation_name, r.order_cnt) for r in via_df.collect()}
    assert a == b
