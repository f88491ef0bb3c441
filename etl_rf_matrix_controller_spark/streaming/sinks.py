"""Streaming sinks: foreachBatch MERGE-style upsert into a keyed state table.

Reference semantics (T2): the background poll replaces route state
wholesale every 5 s (etl_controller.py:2793-2807); a point write updates
one key (:2444).  Writes are serialized through a lock (:385, 422) --
i.e., the sink applies batches atomically in order.

Spark re-expression: ``foreachBatch`` applying a last-write-wins merge of
each micro-batch into a parquet state table (the no-Delta stand-in for
``MERGE INTO``; with Delta/Iceberg the body becomes a real keyed MERGE).
Partition-pruned rewrite: only the union of (old state + batch) is
rewritten, keyed dedup picks the newest row per key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.streaming.windows import _events_stream


def merge_batch_into_state(
    spark: SparkSession, batch: DataFrame, state_path: str
) -> None:
    """Last-write-wins merge of one micro-batch into the parquet state table.

    Dedup priority: newest (ts, event_id) wins; incoming rows beat stored
    rows on ties (is_new).  The rewrite materializes to a temp location
    first (parquet has no atomic MERGE), then swaps -- with Delta this
    whole body is `MERGE INTO state USING batch ON key WHEN MATCHED ...`.
    """
    cols = ["user_id", "ts", "event_id", "event_type", "value"]
    incoming = batch.select(*cols).withColumn("is_new", F.lit(1))
    if os.path.exists(state_path):
        current = spark.read.parquet(state_path).select(*cols).withColumn(
            "is_new", F.lit(0)
        )
        merged = current.unionByName(incoming)
    else:
        merged = incoming
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc(), F.col("is_new").desc()
    )
    newest = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*cols)
    )
    tmp = state_path + "_tmp"
    newest.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(state_path)


def run_merge_stream(spark: SparkSession, sf_dir: str, state_path: str) -> DataFrame:
    """Consume the events stream with a small maxFilesPerTrigger-style
    batching and merge every batch into the state table; returns the final
    state."""
    events = _events_stream(spark, sf_dir)
    q = (
        events.writeStream.foreachBatch(
            lambda batch, _epoch: merge_batch_into_state(spark, batch, state_path)
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", state_path + "_ckpt")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(state_path)
