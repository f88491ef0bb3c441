"""Streaming per-user z-score anomaly detection with running-moment state.

Each event is scored against the statistics of the user's PRIOR events
only (the online / prequential discipline -- scoring against a window
that includes the point itself both dilutes the outlier and leaks the
future).  The per-user state is the classic Welford triple (n, sum,
sum-of-squares); the anomaly test is held ENTIRELY in integer space:

    z^2 > 9   <=>   (x*n - S)^2 > 9 * (n*Q - S^2)

over 4-decimal scaled bigints, so stream and DuckDB oracle agree
bit-for-bit with no sqrt or division anywhere.  The batch twin is the
running-window spelling (ROWS BETWEEN UNBOUNDED PRECEDING AND 1
PRECEDING), which is exactly the declared oracle -- stream == batch
across any time-ordered micro-batch split, the streaming/transitions.py
contract.

Complements the batch drift family (`value_zscore_outliers` scores
against the GLOBAL mean; `ewma_control_chart` / `page_hinkley_drift` /
`value_changepoint_cusum` detect LEVEL shifts): this is the per-entity
online outlier tier a streaming ingest actually runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.plans.scale import adaptive_state_shards

# superseded by plans/scale.py::adaptive_state_shards (round 11); kept
# as the documented historical constant for the round-8 measurement.
ZSCORE_STATE_SHARDS = 1024
# Scored only once >= ZSCORE_MIN_PRIOR prior events exist (variance of a
# single point is meaningless); anomaly threshold is |z| > 3.
ZSCORE_MIN_PRIOR = 2

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("d_scored", LongType()),
        StructField("d_anomalies", LongType()),
    ]
)
_MOMENT_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("sums", ArrayType(LongType())),
        StructField("sumsqs", ArrayType(LongType())),
    ]
)


def _moment_scorer(key, pdf_iter, state: GroupState):
    """One SHARD of the running-moment index: score each event against
    its user's prior (n, S, Q), then fold it in."""
    import pandas as pd

    if state.exists:
        users, ns, sums, sumsqs = state.get
        index = {
            u: [n, s, q] for u, n, s, q in zip(users, ns, sums, sumsqs)
        }
    else:
        index = {}
    out: dict[int, list[int]] = {}
    batch = [pdf for pdf in pdf_iter if not pdf.empty]
    if batch:
        rows = pd.concat(batch).sort_values(["ts_us", "event_id"])
        for user, grp in rows.groupby("user_id", sort=False):
            user = int(user)
            st = index.setdefault(user, [0, 0, 0])
            acc = out.setdefault(user, [0, 0])
            for x in grp["x"].astype("int64"):
                x = int(x)
                n, s, q = st
                if n >= ZSCORE_MIN_PRIOR:
                    acc[0] += 1
                    if (x * n - s) ** 2 > 9 * (n * q - s * s):
                        acc[1] += 1
                st[0] = n + 1
                st[1] = s + x
                st[2] = q + x * x
    state.update(
        (
            list(index.keys()),
            [v[0] for v in index.values()],
            [v[1] for v in index.values()],
            [v[2] for v in index.values()],
        )
    )
    yield pd.DataFrame(
        {
            "user_id": list(out.keys()),
            "d_scored": [v[0] for v in out.values()],
            "d_anomalies": [v[1] for v in out.values()],
        }
    )


def stream_zscore_rows(
    events_stream: DataFrame,
    spark: SparkSession,
    name: str,
    progress_holder: list | None = None,
) -> DataFrame:
    """Run the sharded running-moment scorer to completion (availableNow);
    returns per-(user, micro-batch) scored/anomaly deltas."""
    keyed = events_stream.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").cast("bigint").alias("event_id"),
        F.round(F.col("value") * 10000).cast("bigint").alias("x"),
    ).withColumn(
        # scale-adaptive shard count (round 11): results are shard-
        # invariant; see plans/scale.py::adaptive_state_shards
        "shard",
        F.pmod(F.xxhash64("user_id"), F.lit(adaptive_state_shards(spark))),
    )
    out = keyed.groupBy("shard").applyInPandasWithState(
        _moment_scorer,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_MOMENT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress_holder is not None:
        progress_holder.extend(q.recentProgress)
    return spark.table(name)


@declared(
    "stream_zscore_anomalies",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             CAST(round(value * 10000) AS BIGINT) AS x,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) - 1 AS np,
             coalesce(sum(CAST(round(value * 10000) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS sp,
             coalesce(sum(CAST(round(value * 10000) AS BIGINT)
                          * CAST(round(value * 10000) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS qp
      FROM events
    )
    SELECT user_id,
           CAST(sum(CASE WHEN np >= {ZSCORE_MIN_PRIOR} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN np >= {ZSCORE_MIN_PRIOR}
                          AND CAST(x * np - sp AS HUGEINT)
                              * CAST(x * np - sp AS HUGEINT)
                              > 9 * (CAST(np AS HUGEINT) * qp
                                     - CAST(sp AS HUGEINT) * sp)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM s
    GROUP BY user_id
    HAVING sum(CASE WHEN np >= {ZSCORE_MIN_PRIOR} THEN 1 ELSE 0 END) > 0
    """,
)
def stream_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user online |z| > 3 anomaly counts as a STREAM: each event is
    scored against the user's PRIOR running moments (Welford state --
    one (n, S, Q) triple per user, sharded), entirely in scaled-integer
    space so the test (x*n - S)^2 > 9*(n*Q - S^2) is bit-identical to
    the batch running-window oracle.  Users enter the output after
    their {ZSCORE_MIN_PRIOR + 1}th event (prior variance needs
    {ZSCORE_MIN_PRIOR} points).

    100 TB posture: state is 3 bigints per user (entity-bounded); the
    pre-state shuffle is the shard hash alone; sink volume is one delta
    row per (user, micro-batch), collapsed by the batch-side rollup.
    Stream == batch pinned across 3 real micro-batches in
    tests/test_round7b_ops.py, including anomalies whose prior
    window STRADDLES a batch boundary."""
    from etl_rf_matrix_controller_spark.sources.tables import (
        normalize_events_ts,
        set_events_read_confs,
    )

    set_events_read_confs(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = normalize_events_ts(
        spark.readStream.schema(batch.schema).parquet(
            sf_dir, pathGlobFilter="events.parquet"
        )
    )
    rows = stream_zscore_rows(stream, spark, "zscore_anomaly_stream")
    return (
        rows.groupBy("user_id")
        .agg(
            F.sum("d_scored").cast("bigint").alias("n_scored"),
            F.sum("d_anomalies").cast("bigint").alias("n_anomalies"),
        )
        .filter(F.col("n_scored") > 0)
    )
