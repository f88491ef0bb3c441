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


def test_frame_writer_round_trip(spark, tmp_path):
    """Write path of the connector: structured route rows -> wire frames
    on disk -> re-parsed rows identical to the originals."""
    import glob
    import os

    from pyspark.sql import functions as F

    from etl_rf_matrix_controller_spark.functions.regex_extract import _FRAME_RE
    from etl_rf_matrix_controller_spark.sources.frame_source import register
    from etl_rf_matrix_controller_spark.streaming.state import parse_frames

    register(spark)
    raw = spark.read.format("frame_protocol").option("frames", "60").load()
    parsed = parse_frames(raw).select("out_id", "in_id", "weight", "door_open")
    out = str(tmp_path / "wire")
    parsed.write.format("frame_protocol").option("path", out).mode(
        "overwrite"
    ).save()
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    files = glob.glob(os.path.join(out, "frames-*.txt"))
    assert files
    g = lambda i: F.regexp_extract("frame", _FRAME_RE, i)  # noqa: E731
    back = (
        spark.read.text(os.path.join(out, "frames-*.txt"))
        .select(F.col("value").alias("frame"))
        .select(
            g(1).cast("long").alias("out_id"),
            g(2).cast("long").alias("in_id"),
            g(3).cast("long").alias("weight"),
            g(4).alias("door_open"),
        )
    )
    key = lambda r: (r.out_id, r.in_id, r.weight, r.door_open)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(map(key, parsed.collect()))


def test_frame_writer_rejects_out_of_range(spark, tmp_path):
    """A row the wire format cannot carry fails the write loudly."""
    from etl_rf_matrix_controller_spark.sources.frame_source import register

    register(spark)
    bad = spark.createDataFrame(
        [(1000, 1, 1, "O")], "out_id INT, in_id INT, weight INT, door_open STRING"
    )
    try:
        bad.write.format("frame_protocol").option(
            "path", str(tmp_path / "w2")
        ).mode("append").save()
        raise AssertionError("expected write failure")
    except Exception as e:
        assert "wire range" in str(e) or "ValueError" in str(e)
