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


def test_sliding_batch_eq_stream(spark):
    from etl_rf_matrix_controller_spark.streaming.windows import (
        sliding_window_counts,
        sliding_window_counts_stream,
    )

    _assert_same(
        sliding_window_counts(spark, SF_DIR),
        sliding_window_counts_stream(spark, SF_DIR),
        "sliding_window_counts",
    )


def test_session_batch_eq_stream(spark):
    _assert_same(
        session_windows(spark, SF_DIR),
        session_windows_stream(spark, SF_DIR),
        "session_windows",
    )


def test_foreach_batch_merge_state(spark, tmp_path):
    """foreachBatch MERGE sink: final parquet state == batch latest-state."""
    from etl_rf_matrix_controller_spark.operators.state import route_latest_state
    from etl_rf_matrix_controller_spark.streaming.sinks import run_merge_stream
    from pyspark.sql import functions as F

    state = run_merge_stream(spark, SF_DIR, str(tmp_path / "state"))
    got = state.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.round("value", 2).alias("last_value"),
        F.col("ts").alias("last_ts"),
    )
    _assert_same(route_latest_state(spark, SF_DIR), got, "merge_state")


def test_watermark_drops_too_late_rows(spark):
    """Late data within the watermark lands in its event-time window; data
    later than the watermark is dropped from append-mode output."""
    import pandas as pd
    from pyspark.sql import functions as F

    import shutil
    import time as _time

    src = str(spark.sparkContext.applicationId)
    mk = lambda data: spark.createDataFrame(  # noqa: E731
        [(pd.Timestamp(t).to_pydatetime(), k) for t, k in data],
        "ts timestamp, k string",
    )
    path = f"/tmp/wmtest_{src}"
    shutil.rmtree(path, ignore_errors=True)
    # Three files with distinct mtimes = three micro-batches, in order.
    # Batch 1 advances the watermark past the 10:00 window; batch 2's
    # eviction emits that window; batch 3's straggler arrives after
    # finalization and must be dropped (a row late-but-before-finalization
    # would still be merged -- Spark finalizes at batch boundaries).
    mk(
        [
            ("2024-01-01 10:05:00", "a"),
            ("2024-01-01 10:20:00", "a"),
            ("2024-01-01 13:00:00", "a"),  # watermark -> 12:50
        ]
    ).coalesce(1).write.mode("overwrite").parquet(path + "/b1")
    _time.sleep(1.2)
    mk([("2024-01-01 13:10:00", "a")]).coalesce(1).write.mode("append").parquet(
        path + "/b1"
    )
    _time.sleep(1.2)
    mk([("2024-01-01 10:30:00", "a")]).coalesce(1).write.mode("append").parquet(
        path + "/b1"
    )
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(path + "/b1")
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    got = {(str(r.ws), r.n) for r in spark.table("wm_test").collect()}
    # The 10:00 window closed with 2 rows; the straggler was watermark-dropped.
    assert ("2024-01-01 10:00:00", 2) in got, got
    assert dropped == 1, f"expected 1 watermark-dropped row, saw {dropped}"


def test_dedup_ids_batch_eq_stream(spark):
    """Streaming dropDuplicatesWithinWatermark == batch id-dedup (on the
    raw events stream, which has unique ids -- the redelivery case is
    batch-only synthesized; here we assert the streaming dedup keeps all
    unique rows and drops nothing)."""
    from etl_rf_matrix_controller_spark.streaming.windows import (
        _events_stream,
        run_stream_to_memory,
    )
    from pyspark.sql import functions as F

    stream = (
        _events_stream(spark, SF_DIR)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream")
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .distinct()
    )
    assert got.count() == batch.count()
    assert got.select("event_id").distinct().count() == got.count()


def test_interval_join_batch_eq_stream(spark):
    """Stream-stream watermarked interval join == batch interval join on
    the matched (error, click) pairs.  The batch declared query is the
    left-outer + count form; the stream twin produces the matched pairs,
    so the batch side is re-derived as the inner pair set here."""
    from etl_rf_matrix_controller_spark.sources.tables import load_table
    from etl_rf_matrix_controller_spark.streaming.windows import (
        interval_join_clicks_stream,
    )
    from pyspark.sql import functions as F

    got = interval_join_clicks_stream(spark, SF_DIR).select("error_id", "c_id")

    events = load_table(spark, SF_DIR, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    want = errors.join(
        clicks,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") <= F.col("error_ts"))
        & (F.col("c_ts") > F.col("error_ts") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("error_id", "c_id")
    _assert_same(want, got, "interval_join_clicks")


def test_latest_state_batch_eq_stream(spark):
    from etl_rf_matrix_controller_spark.operators.state import route_latest_state
    from etl_rf_matrix_controller_spark.streaming.state import stream_latest_state

    _assert_same(
        route_latest_state(spark, SF_DIR),
        stream_latest_state(spark, SF_DIR),
        "route_latest_state",
    )


def test_ema_batch_eq_stream(spark):
    """Custom stateful op (applyInPandasWithState EMA) == batch ordered
    fold, bit-exact: both sides run the identical double recurrence in
    the identical order."""
    from etl_rf_matrix_controller_spark.operators.behavior import ema_user_value
    from etl_rf_matrix_controller_spark.streaming.state import (
        stream_ema_user_value,
    )

    _assert_same(
        ema_user_value(spark, SF_DIR),
        stream_ema_user_value(spark, SF_DIR),
        "ema_user_value",
    )


def test_ema_transform_with_state_eq_batch(spark):
    """Spark-4 transformWithStateInPandas (RocksDB state store) produces
    the same bit-exact EMA as the batch ordered fold.  The TWS state
    protocol needs google.protobuf, which this container lacks -- skip
    (the applyInPandasWithState twin above covers the semantics)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from etl_rf_matrix_controller_spark.operators.behavior import ema_user_value
    from etl_rf_matrix_controller_spark.streaming.state import (
        stream_ema_user_value_tws,
    )

    _assert_same(
        ema_user_value(spark, SF_DIR),
        stream_ema_user_value_tws(spark, SF_DIR),
        "ema_user_value_tws",
    )
