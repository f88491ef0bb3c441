"""Custom Python DataSource: the reference's frame protocol as a Spark
connector.

Reference semantics: the controller reads checksummed ASCII frames off a
TCP socket (etl_controller.py:420-461) and parses them into route state.
Spark 4's Python DataSource API lets that protocol be a first-class
``spark.read.format("frame_protocol")`` source: schema declaration,
option handling, and PARTITIONED reads (each partition materializes its
slice independently -- the property that makes a connector scale across
executors instead of funneling through the driver).

The generator is deterministic in ``frame_id`` (no RNG), so tests can
assert exact parsed values; a real deployment would replace ``read``'s
synthesis loop with socket/Kafka consumption per partition.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)


class FrameProtocolDataSource(DataSource):
    """``spark.read.format("frame_protocol")`` -- options:

    - ``frames`` (default 100): total frames to emit
    - ``partitions`` (default 4): read parallelism
    """

    @classmethod
    def name(cls) -> str:
        return "frame_protocol"

    def schema(self) -> str:
        return "frame_id BIGINT, frame STRING"

    def reader(self, schema) -> "FrameProtocolReader":
        return FrameProtocolReader(self.options)

    def simpleStreamReader(self, schema) -> "FrameProtocolStreamReader":
        return FrameProtocolStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "FrameProtocolWriter":
        required = {"out_id", "in_id", "weight", "door_open"}
        missing = required - {f.name for f in schema.fields}
        if missing:
            raise ValueError(f"frame_protocol write needs columns {missing}")
        return FrameProtocolWriter(self.options, overwrite)


def synth_frame(fid: int) -> str:
    """Deterministic {BAcC,+ooo,+iii,ccccc,[OC]} frame for frame_id fid
    (same shape the regex _FRAME_RE in functions/regex_extract.py parses)."""
    out_id = fid % 256 + 1
    in_id = (fid * 7) % 256 + 1
    weight = (fid * 37) % 100000
    oc = "O" if fid % 3 else "C"
    return f"{{BAcC,+{out_id:03d},+{in_id:03d},{weight:05d},{oc}}}"


class FrameProtocolReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("frames", 100))
        self.n_parts = int(options.get("partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # Strided slice per partition: partition i emits frame_ids
        # i, i+P, i+2P, ... -- balanced without any coordination.
        start = partition.value
        for fid in range(start, self.n, self.n_parts):
            yield (fid, synth_frame(fid))


class FrameProtocolStreamReader(SimpleDataSourceStreamReader):
    """``spark.readStream.format("frame_protocol")`` -- the live-feed
    form of the frame transport (the reference polls its socket
    continuously; etl_controller.py:2793-2807 background sync).

    Offsets are a dict ``{"fid": next_frame_id}``: ``read`` advances by
    at most ``batchSize`` frames per micro-batch and stops advancing at
    ``frames`` (a bounded feed lets tests drain it deterministically);
    ``readBetweenOffsets`` re-synthesizes any offset range on replay, so
    recovery after a crash re-reads IDENTICAL data -- the deterministic-
    replay contract Structured Streaming requires of a source.  A real
    deployment keys offsets by socket sequence number and replays from a
    journal.
    """

    def __init__(self, options: dict) -> None:
        self.total = int(options.get("frames", 100))
        self.batch = int(options.get("batchSize", 10))

    def initialOffset(self) -> dict:
        return {"fid": 0}

    def read(self, start: dict):
        s = int(start["fid"])
        e = min(s + self.batch, self.total)
        return (
            iter([(fid, synth_frame(fid)) for fid in range(s, e)]),
            {"fid": e},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [
                (fid, synth_frame(fid))
                for fid in range(int(start["fid"]), int(end["fid"]))
            ]
        )


class FrameCommitMessage(WriterCommitMessage):
    """Carries a task's temp-file path and final name to commit()."""

    def __init__(self, tmp: str, final: str) -> None:
        self.tmp = tmp
        self.final = final


class FrameProtocolWriter(DataSourceWriter):
    """``df.write.format("frame_protocol").option("path", dir).save()`` --
    the COMMAND side of the transport: structured route rows serialize to
    the reference's checksummed-frame wire format (etl_controller.py:
    503-552 builds "{ABs,+ooo,+iii,...}" per route write), one text file
    per task, so emission scales with write parallelism exactly like the
    partitioned read path.

    Rows out of wire range (ids > 999, weight > 99999) raise rather than
    truncate -- the reference device would reject them, and a connector
    that silently mangles payloads is worse than one that fails loudly.
    ``mode("overwrite")`` clears prior frame files driver-side before
    tasks run; commit drops a _SUCCESS marker only after every task
    reports, preserving the all-or-nothing visibility contract.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import glob
        import os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("frame_protocol write requires option('path')")
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in glob.glob(os.path.join(self.path, "frames-*.txt")):
                os.remove(f)
            marker = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)

    def write(self, iterator) -> WriterCommitMessage:
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        # Tasks write to attempt-unique temp names; only commit() renames
        # them to the final frames-*.txt, so a failed/aborted job never
        # leaves partial frame files visible to a reader globbing
        # frames-*.txt (all-or-nothing, even without a _SUCCESS check).
        tmp = os.path.join(
            self.path, f".frames-{pid:05d}-{ctx.taskAttemptId()}.txt.tmp"
        )
        with open(tmp, "w") as f:
            for row in iterator:
                o, i, w, d = (
                    int(row.out_id),
                    int(row.in_id),
                    int(row.weight),
                    str(row.door_open),
                )
                if not (0 <= o <= 999 and 0 <= i <= 999 and 0 <= w <= 99999
                        and d in ("O", "C")):
                    raise ValueError(f"frame field out of wire range: {row}")
                f.write(f"{{BAcC,+{o:03d},+{i:03d},{w:05d},{d}}}\n")
        return FrameCommitMessage(tmp=tmp, final=f"frames-{pid:05d}.txt")

    def commit(self, messages) -> None:
        import os

        for m in messages:
            os.replace(m.tmp, os.path.join(self.path, m.final))
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages) -> None:
        import glob
        import os

        # Drop every temp file from this (and any crashed) attempt; the
        # final frames-*.txt namespace is untouched by construction.
        for f in glob.glob(os.path.join(self.path, ".frames-*.txt.tmp")):
            try:
                os.remove(f)
            except OSError:
                pass


def register(spark) -> None:
    """Idempotently register the source on a session."""
    spark.dataSource.register(FrameProtocolDataSource)
