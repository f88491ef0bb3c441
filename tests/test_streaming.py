"""Batch == stream assertions: the same window aggregations must produce
identical results via Structured Streaming (availableNow) and batch SQL."""

from __future__ import annotations

from etl_rf_matrix_controller_spark.streaming.windows import (
    session_windows,
    session_windows_stream,
    tumbling_hour_counts,
    tumbling_hour_counts_stream,
)
from tests.conftest import SF_DIR, spark_rows


def _assert_same(batch_df, stream_df, name):
    b_cols, b_rows = spark_rows(batch_df)
    s_cols, s_rows = spark_rows(stream_df)
    assert b_cols == s_cols, f"{name}: schema {b_cols} != {s_cols}"
    assert b_rows == s_rows, f"{name}: batch/stream rows differ"


def test_tumbling_batch_eq_stream(spark):
    _assert_same(
        tumbling_hour_counts(spark, SF_DIR),
        tumbling_hour_counts_stream(spark, SF_DIR),
        "tumbling_hour_counts",
    )


def test_session_batch_eq_stream(spark):
    _assert_same(
        session_windows(spark, SF_DIR),
        session_windows_stream(spark, SF_DIR),
        "session_windows",
    )


def test_latest_state_batch_eq_stream(spark):
    from etl_rf_matrix_controller_spark.operators.state import route_latest_state
    from etl_rf_matrix_controller_spark.streaming.state import stream_latest_state

    _assert_same(
        route_latest_state(spark, SF_DIR),
        stream_latest_state(spark, SF_DIR),
        "route_latest_state",
    )
