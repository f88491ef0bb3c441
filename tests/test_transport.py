"""S1/T6 transport analogs under real Structured Streaming.

S1: the reference's TCP command/response transport (etl_controller.py:
420-461) -- the Spark analog is the socket streaming source consuming the
same checksummed ASCII frames, parsed with the engine's frame regex.

T6: the reference paces device writes at 0.1 s per route
(etl_controller.py:1801, 3262) -- the Spark analog is source-side
throttling (maxFilesPerTrigger / maxOffsetsPerTrigger), bounding how much
each micro-batch admits.
"""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.functions.regex_extract import _FRAME_RE

FRAMES = [
    "{BAcC,+001,+005,00123,O}",
    "{BAcC,+002,+007,00456,C}",
    "{BAcC,+003,+009,00789,O}",
    "garbage-not-a-frame",
]


def _serve_frames(server: socket.socket, done: threading.Event) -> None:
    conn, _ = server.accept()
    with conn:
        for f in FRAMES:
            conn.sendall((f + "\n").encode("ascii"))
        # Hold the connection only until the test has observed the rows
        # (fixed sleeps here were pure dead time in the suite).
        done.wait(timeout=30)


def test_socket_source_parses_checksummed_frames(spark):
    """S1 analog: a live socket server streams reference-protocol frames;
    the socket source + frame regex yield the parsed route rows and drop
    the malformed line."""
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    done = threading.Event()
    t = threading.Thread(
        target=_serve_frames, args=(server, done), daemon=True
    )
    t.start()

    lines = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    g = lambda i: F.regexp_extract("value", _FRAME_RE, i)  # noqa: E731
    parsed = lines.filter(F.col("value").rlike(_FRAME_RE)).select(
        g(1).cast("int").alias("output_id"),
        g(2).cast("int").alias("input_id"),
        g(3).cast("int").alias("weight"),
        (g(4) == "O").alias("is_open"),
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName("socket_frames")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("socket_frames").count() >= 3:
                break
            time.sleep(0.5)
        rows = {
            (r.output_id, r.input_id, r.weight, r.is_open)
            for r in spark.table("socket_frames").collect()
        }
    finally:
        done.set()
        q.stop()
        server.close()
    assert rows == {
        (1, 5, 123, True),
        (2, 7, 456, False),
        (3, 9, 789, True),
    }


def test_max_files_per_trigger_throttles_batches(spark, tmp_path):
    """T6 analog: maxFilesPerTrigger=1 paces ingestion one file per
    micro-batch, the declarative form of the reference's 0.1 s/route
    write pacing."""
    # Write the drip files directly with pyarrow: no Spark job per file
    # (coalesce(1) on a parallelized local collection costs ~5 s/action)
    # and no sleeps -- distinct mtimes are set explicitly instead.
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    drip = tmp_path / "drip"
    drip.mkdir()
    base = time.time() - 60
    for i in range(3):
        f = drip / f"part-{i}.parquet"
        pq.write_table(pa.table({"n": pa.array([i], pa.int32())}), f)
        os.utime(f, (base + 10 * i, base + 10 * i))
    stream = (
        spark.readStream.schema("n int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "drip"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("drip_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fed_batches = [
        p for p in q.recentProgress if p["numInputRows"] and p["numInputRows"] > 0
    ]
    assert len(fed_batches) == 3, [p["numInputRows"] for p in q.recentProgress]
    assert spark.table("drip_sink").count() == 3
