"""Stateful streaming: last-write-wins keyed state via applyInPandasWithState.

Reference semantics: the background poller replaces the route map wholesale
every 5 s (etl_controller.py:2793-2807, 3040-3084); a point write
overwrites one key (:2444).

Spark re-expression (T2): a keyed state store updated per micro-batch --
``applyInPandasWithState`` keeps, per key, the (ts, event_id)-max record;
each batch emits the key's current best in update mode.  With the
``availableNow`` trigger over the same parquet, the final emission per key
must equal the batch ``route_latest_state`` -- asserted in
tests/test_streaming.py (the batch==stream contract for state ops, which
have no SQL oracle).

Scale: state is hash-partitioned by key across executors (RocksDB-backed
state store in production) -- memory per executor is O(keys/executors),
the same layout the batch window-dedup shuffle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from etl_rf_matrix_controller_spark.sources.tables import (
    normalize_events_ts,
    set_events_read_confs,
)
from etl_rf_matrix_controller_spark.streaming.windows import _events_stream

STATE_SCHEMA = StructType(
    [
        StructField("ts_micros", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_latest(key, pdf_iter, state: GroupState):
    """Keep the (ts, event_id)-max record per key; emit current best."""
    import pandas as pd

    best = state.get if state.exists else None  # (ts_micros, event_id, type, value)
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        pdf = pdf.assign(_tsm=pdf["ts"].astype("int64") // 1000)
        top = pdf.sort_values(["_tsm", "event_id"], ascending=False).iloc[0]
        cand = (
            int(top["_tsm"]),
            int(top["event_id"]),
            str(top["event_type"]),
            float(top["value"]),
        )
        if best is None or (cand[0], cand[1]) > (best[0], best[1]):
            best = cand
    if best is not None:
        state.update(best)
        # value emitted RAW: Python round() is half-to-even on binary
        # doubles and diverges from Spark's F.round on .xx5 boundaries;
        # the batch-parity caller applies Spark-side rounding itself.
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "last_event_id": [best[1]],
                "last_event_type": [best[2]],
                "last_value": [best[3]],
                "last_ts": [pd.Timestamp(best[0], unit="us")],
            }
        )


def stream_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 under real Structured Streaming: keyed state, update mode,
    availableNow; returns the final per-key state as a batch DataFrame."""
    events = _events_stream(spark, sf_dir)
    updates = events.groupBy("user_id").applyInPandasWithState(
        _update_latest,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("latest_state_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per key per batch; the LAST row per key
    # is the final state (micro-batches arrive in order).
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tbl = spark.table("latest_state_stream")
    # (last_ts, last_event_id) is the same total order the state update
    # used, so the newest emission per key wins even under ts ties.
    w = Window.partitionBy("user_id").orderBy(
        F.col("last_ts").desc(), F.col("last_event_id").desc()
    )
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "last_event_type",
            F.round("last_value", 2).alias("last_value"),
            "last_ts",
        )
    )


EMA_STATE_SCHEMA = StructType(
    [StructField("ema", DoubleType()), StructField("n", LongType())]
)
EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema_value", DoubleType()),
    ]
)


def _update_ema(key, pdf_iter, state: GroupState):
    """Fold alpha=0.3 EMA over (ts, event_id)-ordered values; state holds
    one (ema, count) scalar pair per key -- O(1) state per key, the shape
    that scales where the batch collect_list cannot."""
    import pandas as pd

    ema, n = state.get if state.exists else (None, 0)
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"].astype("float64"):
            v = float(v)
            # Identical double recurrence to the batch/oracle fold
            # (0.3e0 * x + (1e0 - 0.3e0) * acc): same literals, same
            # order, bit-identical result.
            ema = v if ema is None else 0.3 * v + (1 - 0.3) * ema
            n += 1
    if n:
        state.update((float(ema), int(n)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ema_value": [ema]}
        )


def stream_ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op: per-user EMA via applyInPandasWithState
    (update mode, availableNow); returns the final per-key emission as a
    batch DataFrame, comparable to operators.behavior.ema_user_value."""
    events = _events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "value"
    )
    updates = events.groupBy("user_id").applyInPandasWithState(
        _update_ema,
        outputStructType=EMA_OUTPUT_SCHEMA,
        stateStructType=EMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("ema_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tbl = spark.table("ema_stream")
    # n_events is strictly increasing per key across emissions, so the
    # max-n row per key is the final state.
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "ema_value")
    )


class EmaProcessor:
    """transformWithStateInPandas processor: the Spark-4 arbitrary-state
    API form of the EMA fold (same recurrence as _update_ema; ValueState
    holds the (ema, n) scalar pair per key).  Class body defined lazily
    to keep module import working if the API is absent."""


def _make_ema_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _EmaProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ema", "ema double, n bigint")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            if self._state.exists():
                prev = self._state.get()
                ema, n = float(prev[0]), int(prev[1])
            else:
                ema, n = None, 0
            for pdf in rows:
                if pdf.empty:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"])
                for v in pdf["value"].astype("float64"):
                    v = float(v)
                    # Same double recurrence as _update_ema / the oracle.
                    ema = v if ema is None else 0.3 * v + (1 - 0.3) * ema
                    n += 1
            if n:
                self._state.update((float(ema), int(n)))
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "ema_value": [ema]}
                )

        def close(self) -> None:
            pass

    return _EmaProcessor()


def stream_ema_user_value_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMA via transformWithStateInPandas (Spark 4 arbitrary-state API,
    RocksDB state store): the modern twin of stream_ema_user_value.
    Returns the final per-key emission as a batch DataFrame.

    NOTE: the TWS state protocol imports google.protobuf at runtime; in
    containers without it the query fails at initialization (the pytest
    twin importorskips).  stream_ema_user_value (applyInPandasWithState)
    is the dependency-free fallback with identical semantics."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = _events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "value"
    )
    updates = events.groupBy("user_id").transformWithStateInPandas(
        _make_ema_processor(),
        outputStructType=EMA_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("ema_tws_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    tbl = spark.table("ema_tws_stream")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "ema_value")
    )


# ---------------------------------------------------------------------------
# End-to-end: frame-protocol stream -> parse -> keyed route state
# ---------------------------------------------------------------------------

FRAME_STATE_SCHEMA = StructType(
    [
        StructField("frame_id", LongType()),
        StructField("in_id", LongType()),
        StructField("weight", LongType()),
        StructField("door_open", StringType()),
    ]
)
FRAME_OUT_SCHEMA = StructType(
    [
        StructField("out_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("in_id", LongType()),
        StructField("weight", LongType()),
        StructField("door_open", StringType()),
    ]
)


def _update_route(key, pdf_iter, state: GroupState):
    """Last-writer-wins per out_id, ordered by frame_id -- the
    reference's route map update loop (etl_controller.py:615-623) as
    keyed streaming state."""
    import pandas as pd

    best = state.get if state.exists else None
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        top = pdf.sort_values("frame_id", ascending=False).iloc[0]
        cand = (
            int(top["frame_id"]),
            int(top["in_id"]),
            int(top["weight"]),
            str(top["door_open"]),
        )
        if best is None or cand[0] > best[0]:
            best = cand
    if best is not None:
        state.update(best)
        yield pd.DataFrame(
            {
                "out_id": [key[0]],
                "frame_id": [best[0]],
                "in_id": [best[1]],
                "weight": [best[2]],
                "door_open": [best[3]],
            }
        )


def parse_frames(df: DataFrame) -> DataFrame:
    """frame string -> (out_id, in_id, weight, door_open); shared by the
    batch and streaming forms so the two can never diverge."""
    from pyspark.sql import functions as F

    from etl_rf_matrix_controller_spark.functions.regex_extract import _FRAME_RE

    g = lambda i: F.regexp_extract("frame", _FRAME_RE, i)  # noqa: E731
    return df.select(
        "frame_id",
        g(1).cast("long").alias("out_id"),
        g(2).cast("long").alias("in_id"),
        g(3).cast("long").alias("weight"),
        g(4).alias("door_open"),
    )


def stream_route_state_from_frames(
    spark: SparkSession, frames: int = 60, batch_size: int = 25
) -> DataFrame:
    """The reference's whole ingest loop, Spark-shaped end to end:
    frame-protocol STREAM (custom SimpleDataSourceStreamReader) ->
    checksummed-frame regex parse -> keyed last-writer-wins state
    (applyInPandasWithState) -> final route map.

    Micro-batches of ``batch_size`` frames update per-route state
    incrementally, exactly as the controller applies each polled frame
    to its route matrix; the batch twin (read the same feed, window
    argmax) must agree row-for-row, pinned in tests.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_rf_matrix_controller_spark.sources.frame_source import register

    register(spark)
    raw = (
        spark.readStream.format("frame_protocol")
        .option("frames", frames)
        .option("batchSize", batch_size)
        .load()
    )
    updates = parse_frames(raw).groupBy("out_id").applyInPandasWithState(
        _update_route,
        outputStructType=FRAME_OUT_SCHEMA,
        stateStructType=FRAME_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("frame_route_state")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    tbl = spark.table("frame_route_state")
    w = Window.partitionBy("out_id").orderBy(F.col("frame_id").desc())
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


TTL_STATE_SCHEMA = StructType(
    [StructField("last_tsm", LongType()), StructField("n", LongType())]
)
TTL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("status", StringType()),
    ]
)


def _make_ttl_updater(ttl_seconds: int):
    def _update_ttl(key, pdf_iter, state: GroupState):
        """Keyed liveness state with an event-time TTL: active keys track
        (last_ts, n_events); a key idle past the TTL once the watermark
        passes expires -- emitted as a tombstone and its state removed."""
        import pandas as pd

        if state.hasTimedOut:
            last_tsm, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_ts": [pd.Timestamp(last_tsm, unit="us")],
                    "n_events": [n],
                    "status": ["expired"],
                }
            )
            return
        last_tsm, n = state.get if state.exists else (None, 0)
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            tsm = pdf["ts"].astype("int64") // 1000
            mx = int(tsm.max())
            if last_tsm is None or mx > last_tsm:
                last_tsm = mx
            n += len(pdf)
        if last_tsm is not None:
            state.update((last_tsm, n))
            state.setTimeoutTimestamp(last_tsm // 1000 + ttl_seconds * 1000)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "last_ts": [pd.Timestamp(last_tsm, unit="us")],
                    "n_events": [n],
                    "status": ["active"],
                }
            )

    return _update_ttl


def stream_state_ttl_expiry(
    spark: SparkSession,
    events_dir: str,
    ttl_seconds: int,
    query_name: str = "ttl_expiry_stream",
) -> DataFrame:
    """Keyed state with event-time TTL expiry (GroupStateTimeout.
    EventTimeTimeout) -- the reference's deferred-verification timeout
    path (etl_controller.py:2446-2448: a route that never confirms is
    surfaced, not silently retained) as a streaming state machine:
    sessions that go quiet past the TTL are CLOSED and emitted as
    tombstones instead of occupying the state store forever.

    The state-store angle is the 100 TB one: without TTL, keyed state
    grows with lifetime distinct keys (unbounded); with event-time TTL
    the store holds only keys active within the TTL horizon, and expiry
    is driven by the watermark (late data cannot resurrect a key it
    would not have kept alive).  maxFilesPerTrigger=1 in the test splits
    the input so the watermark actually advances between micro-batches
    -- with a single batch no timeout can ever fire (watermark moves
    after a batch completes), which is itself documented behavior worth
    pinning.
    """
    set_events_read_confs(spark)
    batch = spark.read.parquet(events_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    stream = normalize_events_ts(stream).withWatermark("ts", "0 seconds")
    updates = stream.groupBy("user_id").applyInPandasWithState(
        _make_ttl_updater(ttl_seconds),
        outputStructType=TTL_OUTPUT_SCHEMA,
        stateStructType=TTL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("n_closed", LongType()),
        StructField("cur_day", LongType()),
        StructField("cur_total", LongType()),
        StructField("n_events", LongType()),
    ]
)
HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_days", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_next", DoubleType()),
        StructField("n_events", LongType()),
    ]
)


def _holt_step(l: float, b: float, n_closed: int, total: int):
    """One day closes: identical double recurrence (and literals) to the
    batch fold in operators.behavior.holt_linear_daily_value."""
    y = float(total)
    if n_closed == 0:
        return y, 0.0
    lp = 0.5 * y + 0.5 * (l + b)
    bn = 0.3 * (lp - l) + 0.7 * b
    return lp, bn


def _update_holt(key, pdf_iter, state: GroupState):
    """Two-component Holt state per event_type: (level, trend) over the
    CLOSED days plus the open day's running integer total -- O(1) state
    per key regardless of history length (the property the batch
    collect-the-series form gives up).  Day totals accumulate as exact
    scaled ints (the rounding already happened JVM-side), so only the
    per-day fold is float -- same order, same literals as batch."""
    import pandas as pd

    l, b, n_closed, cur_day, cur_total, n_events = (
        state.get if state.exists else (0.0, 0.0, 0, -1, 0, 0)
    )
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["day_idx", "ts", "event_id"])
        for day, v in zip(pdf["day_idx"].astype("int64"),
                          pdf["v_s"].astype("int64")):
            day, v = int(day), int(v)
            if cur_day == -1:
                cur_day = day
            elif day != cur_day:
                l, b = _holt_step(l, b, n_closed, cur_total)
                n_closed += 1
                cur_day, cur_total = day, 0
            cur_total += v
            n_events += 1
    if n_events:
        state.update(
            (float(l), float(b), int(n_closed), int(cur_day),
             int(cur_total), int(n_events))
        )
        # Emission closes the open day tentatively (not committed to
        # state): the final emission therefore equals the batch fold
        # over ALL days.
        lt, bt = _holt_step(l, b, n_closed, cur_total)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_days": [n_closed + 1],
                "level": [lt / 10000.0],
                "trend": [bt / 10000.0],
                "forecast_next": [(lt + bt) / 10000.0],
                "n_events": [n_events],
            }
        )


def stream_holt_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op: per-event-type Holt linear smoothing
    via applyInPandasWithState (update mode, availableNow); returns the
    final per-key emission as a batch DataFrame, comparable to
    operators.behavior.holt_linear_daily_value.  Day index and the
    scaled integer value are computed JVM-SIDE before the stream enters
    Python, so day bucketing and rounding are bit-identical to batch."""
    from pyspark.sql import functions as F

    events = _events_stream(spark, sf_dir).select(
        "event_type",
        "ts",
        "event_id",
        F.unix_timestamp(F.date_trunc("day", "ts")).alias("day_idx"),
        F.round(F.col("value") * 10000).cast("long").alias("v_s"),
    )
    updates = events.groupBy("event_type").applyInPandasWithState(
        _update_holt,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("holt_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql.window import Window

    tbl = spark.table("holt_stream")
    w = Window.partitionBy("event_type").orderBy(F.col("n_events").desc())
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "n_days", "level", "trend", "forecast_next")
    )


TRANS_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("last_ts_micros", LongType()),
        StructField("last_event_id", LongType()),
    ]
)
TRANS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("cur_type", StringType()),
        StructField("n", LongType()),
    ]
)


def _update_transitions(key, pdf_iter, state: GroupState):
    """Per-user last-event carry: each micro-batch emits its (prev ->
    cur) pair counts, chaining across batches through the single
    remembered (last_type, last_ts, last_event_id) -- O(1) state per
    key, the streaming form of the lag() window."""
    import pandas as pd

    last_type, last_ts, last_eid = (
        state.get if state.exists else (None, None, None)
    )
    counts: dict[tuple[str, str], int] = {}
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for et, ts, eid in zip(
            pdf["event_type"], pdf["ts"], pdf["event_id"]
        ):
            if last_type is not None:
                k = (last_type, et)
                counts[k] = counts.get(k, 0) + 1
            last_type = et
            last_ts, last_eid = int(ts.value), int(eid)
    if last_type is not None:
        state.update((last_type, last_ts, last_eid))
    if counts:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(counts),
                "prev_type": [k[0] for k in counts],
                "cur_type": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )


def stream_event_transition_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Custom stateful streaming op: first-order transition counts via
    applyInPandasWithState; each batch emits partial pair counts that
    chain across batches through the per-user last-event state; the
    wrapper sums the partials -- comparable to
    operators.behavior.event_transition_counts."""
    from pyspark.sql import functions as F

    events = _events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    updates = events.groupBy("user_id").applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANS_OUTPUT_SCHEMA,
        stateStructType=TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("trans_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table("trans_stream")
        .groupBy("prev_type", "cur_type")
        .agg(F.sum("n").cast("bigint").alias("n_transitions"))
    )


TWAP_STATE_SCHEMA = StructType(
    [
        StructField("last_t", LongType()),
        StructField("last_v", LongType()),
        StructField("wsum", LongType()),
        StructField("total_s", LongType()),
        StructField("n_intervals", LongType()),
    ]
)
TWAP_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_intervals", LongType()),
        StructField("total_s", LongType()),
        StructField("twap", DoubleType()),
    ]
)


def _update_twap(key, pdf_iter, state: GroupState):
    """Per-user time-weighted-average state: carry (last_t, last_v) plus
    the exact integer accumulators (wsum, total_s, n_intervals) -- O(1)
    state per key.  Each arriving event closes the held interval
    [last_t, t) at value last_v, exactly the lead() window the batch
    operator uses.  wsum stays in int64: durations telescope to the
    user's time SPAN, so wsum <= span * max_scaled_value (~3e13 for a
    year at value 100) -- exact, and exactly representable when cast to
    double for the final division."""
    import pandas as pd

    last_t, last_v, wsum, total_s, n_iv = (
        state.get if state.exists else (None, None, 0, 0, 0)
    )
    seen = False
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        seen = True
        pdf = pdf.sort_values(["ts", "event_id"])
        for t, v in zip(pdf["t_s"].astype("int64"), pdf["v_s"].astype("int64")):
            t, v = int(t), int(v)
            if last_t is not None:
                dur = t - last_t
                wsum += last_v * dur
                total_s += dur
                n_iv += 1
            last_t, last_v = t, v
    if seen:
        state.update((last_t, last_v, int(wsum), int(total_s), int(n_iv)))
        if total_s > 0:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_intervals": [n_iv],
                    "total_s": [total_s],
                    "twap": [float(wsum) / (float(total_s) * 10000.0)],
                }
            )


def stream_twap_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op: per-user time-weighted average via
    applyInPandasWithState (update mode, availableNow); the final
    per-key emission is comparable bit-for-bit to
    operators.behavior.time_weighted_avg_value -- epoch seconds and the
    scaled integer value are computed JVM-side before the stream enters
    Python, the accumulators are exact integers, and the one float
    division happens once at emission with identical operands."""
    from pyspark.sql import functions as F

    events = _events_stream(spark, sf_dir).select(
        "user_id",
        "ts",
        "event_id",
        F.unix_timestamp("ts").alias("t_s"),
        F.round(F.col("value") * 10000).cast("long").alias("v_s"),
    )
    updates = events.groupBy("user_id").applyInPandasWithState(
        _update_twap,
        outputStructType=TWAP_OUTPUT_SCHEMA,
        stateStructType=TWAP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("twap_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql.window import Window

    tbl = spark.table("twap_stream")
    w = Window.partitionBy("user_id").orderBy(F.col("n_intervals").desc())
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_intervals", "total_s", "twap")
    )


BALANCE_STATE_SCHEMA = StructType(
    [
        StructField("bal", LongType()),
        StructField("clamps", LongType()),
        StructField("n", LongType()),
    ]
)
BALANCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_rows", LongType()),
        StructField("balance_s", LongType()),
        StructField("n_clamps", LongType()),
    ]
)


def _update_balance(key, pdf_iter, state: GroupState):
    """Clamped-balance fold (max(0, bal + delta) per step, counting clamp
    hits) over (ts, event_id)-ordered integer deltas; state is three
    int64 scalars per key.  All-integer arithmetic, so the streaming fold
    is bit-identical to the batch F.aggregate fold and the oracle's
    recursive CTE regardless of how rows split across micro-batches --
    the state carries everything the remaining fold needs."""
    import pandas as pd

    bal, clamps, n = state.get if state.exists else (0, 0, 0)
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for d in pdf["d"].astype("int64"):
            d = int(d)
            if bal + d < 0:
                bal, clamps = 0, clamps + 1
            else:
                bal += d
            n += 1
    if n:
        state.update((int(bal), int(clamps), int(n)))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_rows": [n],
                "balance_s": [bal],
                "n_clamps": [clamps],
            }
        )


def stream_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of operators.behavior.clamped_running_balance: the
    per-user zero-clamped credit balance as an O(1)-state streaming fold
    (the shape that scales where the batch collect_list cannot -- a
    year-long event stream never materializes per-user arrays here).
    Returns the final per-key emission for the batch==stream contract
    test."""
    from pyspark.sql import functions as F

    events = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 10000).cast("long"),
            )
            .otherwise(-F.round(F.col("value") * 10000).cast("long"))
            .alias("d"),
        )
    )
    updates = events.groupBy("user_id").applyInPandasWithState(
        _update_balance,
        outputStructType=BALANCE_OUTPUT_SCHEMA,
        stateStructType=BALANCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("balance_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql.window import Window

    tbl = spark.table("balance_stream")
    w = Window.partitionBy("user_id").orderBy(F.col("n_rows").desc())
    return (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "balance_s", "n_clamps")
    )


def _cms_schemas():
    from pyspark.sql.types import ArrayType

    state = StructType(
        [
            StructField("counts", ArrayType(LongType())),
            StructField("n_seen", LongType()),
        ]
    )
    output = StructType(
        [
            StructField("row_id", LongType()),
            StructField("n_seen", LongType()),
            StructField("counts", ArrayType(LongType())),
        ]
    )
    return state, output


def _update_cms(key, pdf_iter, state: GroupState):
    """Count-min-sketch row as streaming state: one int64 cell array per
    sketch row, incremented per event -- the mergeable-sketch property
    demonstrated IN the state store (cell-wise addition commutes with
    micro-batching, so the final cells are bit-equal to the batch
    build no matter how rows split across batches)."""
    import hashlib

    import pandas as pd

    from etl_rf_matrix_controller_spark.operators.aggregates import CMS_CELLS

    row_id = int(key[0])
    counts, n_seen = (
        state.get if state.exists else ([0] * CMS_CELLS, 0)
    )
    counts = list(counts)
    for pdf in pdf_iter:
        for uid in pdf["user_id"]:
            h = hashlib.md5(f"{row_id}_{int(uid)}".encode()).hexdigest()[:8]
            counts[int(h, 16) % CMS_CELLS] += 1
            n_seen += 1
    if n_seen:
        state.update((counts, int(n_seen)))
        yield pd.DataFrame(
            {"row_id": [row_id], "n_seen": [n_seen], "counts": [counts]}
        )


def stream_cms_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the cms_heavy_hitters sketch BUILD: each sketch
    row's cell array lives in the keyed state store and grows by
    cell-wise increments per micro-batch -- O(CMS_CELLS) state per key,
    constant per event, the sketch-in-state pattern that replaces a
    full keyed shuffle at 100 TB.  Returns the final (row_id, cell, c)
    frame for non-zero cells, directly comparable to the batch build
    (tests/test_streaming.py pins cells bit-equal)."""
    from pyspark.sql import functions as F

    from etl_rf_matrix_controller_spark.operators.aggregates import CMS_ROWS

    state_schema, output_schema = _cms_schemas()
    events = _events_stream(spark, sf_dir).select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(CMS_ROWS - 1))).alias("rid"),
    ).select("user_id", F.col("rid").cast("long").alias("row_id"))
    updates = events.groupBy("row_id").applyInPandasWithState(
        _update_cms,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        updates.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql.window import Window

    tbl = spark.table("cms_stream")
    w = Window.partitionBy("row_id").orderBy(F.col("n_seen").desc())
    final = (
        tbl.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("row_id", F.posexplode("counts").alias("cell", "c"))
        .filter(F.col("c") > 0)
        .select(
            "row_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.col("c").cast("bigint").alias("c"),
        )
    )
    return final
