"""Streaming event-transition counting with cross-batch keyed state.

The batch query `event_transition_counts` (operators/behavior.py) computes
the (prev_type, cur_type) Markov transition counts with one lag window.
This module is its STREAMING twin: the per-user "last event" is keyed
streaming state, so a transition whose two events arrive in DIFFERENT
micro-batches is still counted -- the piece a naive per-batch lag window
silently drops (the first event of every batch would lose its
predecessor).  Reference basis: the reference recomputes its full state
table per poll (etl_controller.py:1668-1698); here arrival order is
carried as bounded state instead.

Design (scale story first):
  * State is ONE logical row per user -- (ts_us, event_id, event_type) of
    the latest event -- the minimum any cross-batch sequence operator can
    hold; bounded by user cardinality at any event throughput.
  * Users are SHARDED (hash(user_id) % TRANSITION_STATE_SHARDS) into the
    applyInPandasWithState group key, the neardup.py discipline: per-user
    keying made one pandas group per user (~15k singleton groups at
    sf0.1, ~0.2 ms each); sharding bounds the group count while the
    per-user semantics are untouched (users are processed independently
    inside a shard).
  * Transitions stream OUT (update mode, each emitted exactly once);
    the final (prev, cur) count is a batch rollup over the sink -- the
    same sink-side-aggregate split as stream_cms_heavy_hitters.

batch == stream by construction: within a micro-batch rows are processed
in (ts, event_id) order -- the batch twin's window ORDER BY -- and the
cross-batch boundary transition uses the stored last event, so ANY
time-ordered file split yields identical counts (pinned across >= 3 real
micro-batches in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.plans.scale import adaptive_state_shards

# One pandas group per shard, not per user (see module docstring).
# Superseded by plans/scale.py::adaptive_state_shards (round 11); kept
# as the documented historical constant for the round-8 measurement.
TRANSITION_STATE_SHARDS = 1024

_OUT_SCHEMA = StructType(
    [
        StructField("prev_type", StringType()),
        StructField("cur_type", StringType()),
    ]
)
# Parallel arrays: this shard's users and their latest (ts_us, event_id,
# event_type).  Arrays (not maps) -- applyInPandasWithState state rows
# round-trip through Arrow, where parallel primitive arrays are cheapest.
_STATE_SCHEMA = StructType(
    [
        StructField("users", ArrayType(LongType())),
        StructField("ts_us", ArrayType(LongType())),
        StructField("eids", ArrayType(LongType())),
        StructField("types", ArrayType(StringType())),
    ]
)


def _transition_tracker(key, pdf_iter, state: GroupState):
    """One SHARD of the last-event index: emit (prev, cur) transition rows
    for every consecutive event pair per user, seeding each user's chain
    from the stored cross-batch last event."""
    import pandas as pd

    if state.exists:
        users, ts, eids, types = state.get
        index = {
            u: (t, e, ty) for u, t, e, ty in zip(users, ts, eids, types)
        }
    else:
        index = {}
    prevs: list[str] = []
    curs: list[str] = []
    batch = [pdf for pdf in pdf_iter if not pdf.empty]
    if batch:
        rows = pd.concat(batch).sort_values(["ts_us", "event_id"])
        for user, grp in rows.groupby("user_id", sort=False):
            user = int(user)
            typs = grp["event_type"].tolist()
            last = index.get(user)
            chain = ([last[2]] if last is not None else []) + typs
            prevs.extend(chain[:-1])
            curs.extend(chain[1:])
            tail = grp.iloc[-1]
            index[user] = (
                int(tail["ts_us"]),
                int(tail["event_id"]),
                typs[-1],
            )
    state.update(
        (
            list(index.keys()),
            [v[0] for v in index.values()],
            [v[1] for v in index.values()],
            [v[2] for v in index.values()],
        )
    )
    yield pd.DataFrame({"prev_type": prevs, "cur_type": curs})


def stream_transitions(
    events_stream: DataFrame,
    spark: SparkSession,
    name: str,
    progress_holder: list | None = None,
) -> DataFrame:
    """Run the sharded last-event state op over a streaming events frame
    to completion (availableNow); returns the raw transition rows as a
    batch frame from the memory sink."""
    keyed = events_stream.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros("ts").alias("ts_us"),
        F.col("event_id").cast("bigint").alias("event_id"),
        "event_type",
    ).withColumn(
        # scale-adaptive shard count (round 11): results are shard-
        # invariant; see plans/scale.py::adaptive_state_shards
        "shard",
        F.pmod(F.xxhash64("user_id"), F.lit(adaptive_state_shards(spark))),
    )
    out = keyed.groupBy("shard").applyInPandasWithState(
        _transition_tracker,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
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


def _batch_oracle() -> str:
    """The streaming twin is certified against the REGISTERED batch
    oracle verbatim (the stream_cms_heavy_hitters discipline): the two
    declared queries can never drift."""
    from etl_rf_matrix_controller_spark.operators import behavior  # noqa: F401
    from etl_rf_matrix_controller_spark.plans import registry as _reg

    return _reg.ORACLES["event_transition_counts"]


@declared("stream_event_transitions", oracle=_batch_oracle())
def stream_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-transition counts as a STREAM: the (prev -> cur)
    Markov transition matrix accumulated continuously, with the per-user
    last event held as keyed streaming state so batch-boundary
    transitions are never lost.  Same oracle as the batch twin
    `event_transition_counts` -- stream == batch is the contract, across
    any time-ordered micro-batch split.

    100 TB posture: state is exactly one (ts, event_id, type) per user
    (entity-bounded, not throughput-bounded); the only shuffle ahead of
    the state op is the shard hash; transition rows collapse in the
    batch-side partial agg.  The update-mode sink emits each transition
    once, so the rollup is additive across batches -- the same
    accumulate-then-read-off split as the streaming sketch trio."""
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
    raw = stream_transitions(stream, spark, "event_transitions_stream")
    return raw.groupBy("prev_type", "cur_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
