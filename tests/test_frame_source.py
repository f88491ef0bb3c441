"""Custom Python DataSource tests (sources/frame_source.py): the frame
protocol as a partitioned Spark connector."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.functions.regex_extract import _FRAME_RE
from etl_rf_matrix_controller_spark.sources.frame_source import register, synth_frame


def test_frame_source_reads_partitioned_and_parses(spark):
    register(spark)
    df = (
        spark.read.format("frame_protocol")
        .option("frames", 120)
        .option("partitions", 6)
        .load()
    )
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 120
    g = lambda i: F.regexp_extract("frame", _FRAME_RE, i)  # noqa: E731
    parsed = df.select(
        "frame_id",
        g(1).cast("int").alias("output_id"),
        g(2).cast("int").alias("input_id"),
        g(3).cast("int").alias("weight"),
    )
    # Every frame parses, and the fields match the deterministic formula.
    rows = {r.frame_id: (r.output_id, r.input_id, r.weight) for r in parsed.collect()}
    assert len(rows) == 120
    for fid in (0, 1, 59, 119):
        assert rows[fid] == (fid % 256 + 1, (fid * 7) % 256 + 1, (fid * 37) % 100000)


def test_frame_source_matches_python_generator(spark):
    register(spark)
    df = (
        spark.read.format("frame_protocol")
        .option("frames", 50)
        .option("partitions", 3)
        .load()
    )
    got = {(r.frame_id, r.frame) for r in df.collect()}
    want = {(i, synth_frame(i)) for i in range(50)}
    assert got == want


def test_frame_protocol_stream_reader(spark):
    """The streaming form of the connector: micro-batches advance by
    batchSize offsets, the feed drains at `frames`, and every emitted
    frame is byte-identical to the batch synthesis (deterministic
    replay)."""
    from etl_rf_matrix_controller_spark.sources.frame_source import (
        register,
        synth_frame,
    )

    register(spark)
    q = (
        spark.readStream.format("frame_protocol")
        .option("frames", 40)
        .option("batchSize", 16)
        .load()
        .writeStream.format("memory")
        .queryName("frame_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.table("frame_stream").collect()
    assert len(rows) == 40
    got = {r.frame_id: r.frame for r in rows}
    assert got == {fid: synth_frame(fid) for fid in range(40)}


def test_frame_stream_to_route_state_eq_batch(spark):
    """The full reference loop end to end -- frame stream -> parse ->
    keyed last-writer-wins state -- agrees row-for-row with the batch
    computation over the same feed."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_rf_matrix_controller_spark.sources.frame_source import register
    from etl_rf_matrix_controller_spark.streaming.state import (
        parse_frames,
        stream_route_state_from_frames,
    )

    got = stream_route_state_from_frames(spark, frames=60, batch_size=25)

    register(spark)
    batch = parse_frames(
        spark.read.format("frame_protocol").option("frames", 60).load()
    )
    w = Window.partitionBy("out_id").orderBy(F.col("frame_id").desc())
    want = (
        batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    g = {tuple(r) for r in got.select(sorted(got.columns)).collect()}
    x = {tuple(r) for r in want.select(sorted(want.columns)).collect()}
    assert g == x and len(g) > 0
