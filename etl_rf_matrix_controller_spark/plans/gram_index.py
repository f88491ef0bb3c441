"""Persistent bucketed gram-postings index (write once, join locally forever).

The round-6 x100 stress decade showed the span-dedup gram join is the one
sub-linear shape in the suite: every query over the gram family rebuilt a
~20 GB positional gram index from scratch and SHUFFLED it on the gram key
(207 s, disk-bandwidth-bound).  At 100 TB that per-query shuffle IS the
bill.  The fix is physical design, not a new algorithm: write the postings
ONCE as a parquet table ``bucketBy(N, <join keys>).sortBy(<join keys>)``
(the zero-exchange machinery already proven by plans/scale.py +
tests/test_plans.py::test_bucketed_join_has_no_exchange), then every
consuming query scans the bucketed table and joins bucket-to-bucket with
ZERO Exchange: cost per query = one columnar scan + per-bucket local joins.

Mechanics:
  * Table identity = (kind, fingerprint of the corpus parquet, builder
    version).  Regenerated testdata or a builder change mints a new tag, so
    stale indexes are unreachable rather than silently reused.
  * Within a session the table registers once (spark.catalog).  Across
    sessions the parquet + bucket layout survive on disk; a sidecar
    ``_graft_meta.json`` records schema/bucketing so a fresh session
    re-registers with ``CREATE TABLE ... CLUSTERED BY ... LOCATION`` in
    milliseconds instead of rebuilding (bucket ids live in the file NAMES,
    which is why re-declaring over the same location is sound).
  * The build repartitions on the bucket keys with numPartitions ==
    numBuckets first, so each bucket lands in ONE file and Spark's read
    side keeps the sortBy order -- the consuming SortMergeJoin then needs
    neither an Exchange NOR a Sort.

On a real cluster the location would be an object-store prefix and the
catalog a metastore; nothing else changes.  Index storage defaults to a
tmpdir outside the repo (same policy as tools/gate.py's DuckDB spill);
override with SPARK_GRAFT_INDEX_DIR.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

INDEX_ROOT_ENV = "SPARK_GRAFT_INDEX_DIR"
DEFAULT_INDEX_ROOT = "/tmp/spark_graft_gram_index"
N_BUCKETS_ENV = "SPARK_GRAFT_GRAM_BUCKETS"
DEFAULT_N_BUCKETS = 32


def index_root() -> str:
    return os.environ.get(INDEX_ROOT_ENV, DEFAULT_INDEX_ROOT)


def default_n_buckets() -> int:
    return int(os.environ.get(N_BUCKETS_ENV, str(DEFAULT_N_BUCKETS)))


def corpus_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """Cheap staleness key: path + size + mtime of the source parquet.
    Regenerated testdata (same path, new bytes) mints a new index tag."""
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(path)
        raw = f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        raw = os.path.abspath(path)
    return hashlib.md5(raw.encode()).hexdigest()[:10]


def _ddl_of(df: DataFrame) -> str:
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )


def ensure_bucketed_index(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    build: Callable[[SparkSession, str], DataFrame],
    bucket_cols: list[str],
    *,
    version: str,
    n_buckets: int | None = None,
    sort_cols: list[str] | None = None,
    source_table: str = "documents",
) -> DataFrame:
    """Return a DataFrame over the persistent bucketed postings table for
    ``kind`` at ``sf_dir``, building it exactly once.

    Resolution order: session catalog hit -> on-disk files (re-register
    over the existing location) -> full build (one shuffle on the bucket
    keys, paid once per corpus per builder version).
    """
    import shutil

    n_buckets = n_buckets or default_n_buckets()
    sort_cols = sort_cols or bucket_cols
    tag = corpus_fingerprint(sf_dir, source_table)
    table = f"gram_idx_{kind}_{version}_{tag}_b{n_buckets}"
    if spark.catalog.tableExists(table):
        return spark.table(table)

    loc = os.path.join(index_root(), table)

    def _register() -> DataFrame:
        with open(os.path.join(loc, "_graft_meta.json")) as fh:
            meta = json.load(fh)
        spark.sql(
            f"CREATE TABLE {table} ({meta['ddl']}) USING PARQUET "
            f"CLUSTERED BY ({', '.join(meta['bucket_cols'])}) "
            f"SORTED BY ({', '.join(meta['sort_cols'])}) "
            f"INTO {meta['n_buckets']} BUCKETS "
            f"LOCATION '{loc}'"
        )
        return spark.table(table)

    def _published() -> bool:
        return os.path.exists(
            os.path.join(loc, "_SUCCESS")
        ) and os.path.exists(os.path.join(loc, "_graft_meta.json"))

    if _published():
        return _register()

    # Build into a process-unique staging dir, then PUBLISH with one
    # atomic rename: two processes racing to build the same index (the
    # background test suite vs a gate run) each write their own staging
    # dir and exactly one rename wins -- no reader ever sees a
    # half-written location.
    df = build(spark, sf_dir)
    stage_loc = f"{loc}.build-{os.getpid()}"
    stage_table = f"{table}_build_{os.getpid()}"
    # One repartition on the bucket keys with numPartitions == numBuckets:
    # HashPartitioning and the bucket hash are both Murmur3 pmod N, so each
    # write task holds exactly one bucket -> one file per bucket -> the
    # read side keeps sortBy order and the consuming join/window elides
    # its Sort.
    (
        df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .option("path", stage_loc)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(stage_table)
    )
    spark.sql(f"DROP TABLE {stage_table}")  # external: files stay put
    with open(os.path.join(stage_loc, "_graft_meta.json"), "w") as fh:
        json.dump(
            {
                "ddl": _ddl_of(df),
                "bucket_cols": bucket_cols,
                "sort_cols": sort_cols,
                "n_buckets": n_buckets,
            },
            fh,
        )
    try:
        os.rename(stage_loc, loc)
    except OSError:
        # a concurrent builder published first; theirs is equivalent
        shutil.rmtree(stage_loc, ignore_errors=True)
        if not _published():
            raise
    return _register()
