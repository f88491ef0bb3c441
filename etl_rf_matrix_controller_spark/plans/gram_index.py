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


def _is_published(loc: str) -> bool:
    return os.path.exists(os.path.join(loc, "_SUCCESS")) and os.path.exists(
        os.path.join(loc, "_graft_meta.json")
    )


def _register_ext_table(spark: SparkSession, table: str, loc: str) -> DataFrame:
    """Re-register a published bucketed location in milliseconds (the
    bucket ids live in the file NAMES, so re-declaring over the same
    location is sound)."""
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


def _publish_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    loc: str,
    bucket_cols: list[str],
    sort_cols: list[str],
    n_buckets: int,
) -> None:
    """Write ``df`` bucketed into a process-unique staging dir, then
    PUBLISH with one atomic rename (two racing builders each write their
    own staging dir; exactly one rename wins, no reader ever sees a
    half-written location)."""
    import shutil

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
        if not _is_published(loc):
            raise


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
    n_buckets = n_buckets or default_n_buckets()
    sort_cols = sort_cols or bucket_cols
    tag = corpus_fingerprint(sf_dir, source_table)
    table = f"gram_idx_{kind}_{version}_{tag}_b{n_buckets}"
    if spark.catalog.tableExists(table):
        return spark.table(table)

    loc = os.path.join(index_root(), table)
    if _is_published(loc):
        return _register_ext_table(spark, table, loc)
    _publish_bucketed(
        spark, build(spark, sf_dir), table, loc, bucket_cols, sort_cols,
        n_buckets,
    )
    return _register_ext_table(spark, table, loc)


# ---------------------------------------------------------------------------
# Incremental maintenance: delta append + compaction (round 8)
# ---------------------------------------------------------------------------
#
# Production ingest at 100 TB appends hourly; re-bucketing the whole
# corpus per batch is the same bill the round-6 per-query shuffle was.
# The delta leg fixes it: an ingest batch's postings are published as
# their OWN bucketed table (same bucketing function, same key columns,
# same bucket count) next to the base -- writing only batch-scaled
# bytes -- and consumers serve base UNION delta.  Because every leg is
# identically bucketed, a delta<->base join on the bucket keys is the
# classic co-located bucket join (ZERO Exchange on either side), and a
# probe pushes its key filter into each leg's columnar scan
# independently; only the post-probe rollup (probe-scaled) shuffles.
# Compaction folds the deltas into a fresh one-file-per-bucket base
# (restoring the sortBy read-order guarantee, which holds only at one
# file per bucket) in ONE amortized shuffle, then atomically swaps.


def prune_stale_indexes(
    live_tags: set[str],
    *,
    root: str | None = None,
    stale_build_age_s: int = 3600,
    dry_run: bool = False,
) -> list[str]:
    """Retention sweep for the index root: delete every index location
    whose corpus-fingerprint tag is not in ``live_tags`` (regenerated
    testdata, retired stress corpora), plus crashed publishers' staging
    (``.build-``) and retired (``.old-``) dirs older than
    ``stale_build_age_s``.  Returns the removed paths.

    The write-once design accumulates one location per (kind, corpus
    tag, builder version) forever; this is the bounded-retention
    counterpart a real deployment schedules (tools/prune_indexes.py is
    the CLI).  Never call it concurrently with queries over corpora
    whose tags are NOT in ``live_tags``.
    """
    import re
    import shutil
    import time

    root = root or index_root()
    removed: list[str] = []
    if not os.path.isdir(root):
        return removed
    now = time.time()
    for name in os.listdir(root):
        path = os.path.join(root, name)
        if not os.path.isdir(path):
            continue
        if ".build-" in name or ".old-" in name:
            try:
                age = now - os.stat(path).st_mtime
            except OSError:
                continue
            if age > stale_build_age_s:
                removed.append(path)
                if not dry_run:
                    shutil.rmtree(path, ignore_errors=True)
            continue
        m = re.search(r"_([0-9a-f]{10})_b\d+", name)
        if m and m.group(1) not in live_tags:
            removed.append(path)
            if not dry_run:
                shutil.rmtree(path, ignore_errors=True)
    return removed


def _base_table_name(
    sf_dir: str, kind: str, version: str, n_buckets: int, source_table: str
) -> str:
    tag = corpus_fingerprint(sf_dir, source_table)
    return f"gram_idx_{kind}_{version}_{tag}_b{n_buckets}"


def append_index_delta(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    batch_build: Callable[[SparkSession, str], DataFrame],
    bucket_cols: list[str],
    *,
    version: str,
    batch_id: str,
    n_buckets: int | None = None,
    sort_cols: list[str] | None = None,
    source_table: str = "documents",
) -> DataFrame:
    """Publish one ingest batch's postings as a DELTA bucketed table of
    the ``kind`` index (same bucketing fn / keys / bucket count as the
    base), writing only batch-scaled bytes.  ``batch_id`` names the
    batch (stable across retries: the publish is atomic and idempotent
    -- a re-run re-registers instead of re-writing).  The base table is
    never touched; existing base-only consumers are unaffected until
    they opt into :func:`index_delta_frames`."""
    n_buckets = n_buckets or default_n_buckets()
    sort_cols = sort_cols or bucket_cols
    base = _base_table_name(sf_dir, kind, version, n_buckets, source_table)
    table = f"{base}__d{batch_id}"
    if spark.catalog.tableExists(table):
        return spark.table(table)
    loc = os.path.join(index_root(), table)
    if _is_published(loc):
        return _register_ext_table(spark, table, loc)
    _publish_bucketed(
        spark, batch_build(spark, sf_dir), table, loc, bucket_cols,
        sort_cols, n_buckets,
    )
    return _register_ext_table(spark, table, loc)


def _delta_locs(base_loc: str) -> list[str]:
    """Published delta locations of a base, ordered lexicographically by
    batch id (deterministic; consumers union all legs, so leg order
    never affects results -- zero-pad numeric batch ids if a stable
    temporal order ever matters).  Staging (``.build-<pid>``) and
    retired (``.old-<pid>``) dirs are never listed."""
    import glob as _glob

    return sorted(
        d
        for d in _glob.glob(base_loc + "__d*")
        if ".build-" not in os.path.basename(d)
        and ".old-" not in os.path.basename(d)
        and _is_published(d)
    )


def index_delta_frames(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    *,
    version: str,
    n_buckets: int | None = None,
    source_table: str = "documents",
) -> list[DataFrame]:
    """All published delta legs of the ``kind`` index (deterministic
    lexicographic batch-id order), each a bucketed scan.  Serve consumers ``base ∪ deltas``; for joins
    that must stay Exchange-free, join each leg separately (every leg
    shares the base's bucketing, so leg<->leg joins on the bucket keys
    are co-located) and union the RESULTS -- a union of scans erases
    the distribution Catalyst needs."""
    n_buckets = n_buckets or default_n_buckets()
    base = _base_table_name(sf_dir, kind, version, n_buckets, source_table)
    out: list[DataFrame] = []
    for loc in _delta_locs(os.path.join(index_root(), base)):
        table = os.path.basename(loc)
        if spark.catalog.tableExists(table):
            out.append(spark.table(table))
        else:
            out.append(_register_ext_table(spark, table, loc))
    return out


def compact_index(
    spark: SparkSession,
    sf_dir: str,
    kind: str,
    bucket_cols: list[str],
    *,
    version: str,
    n_buckets: int | None = None,
    sort_cols: list[str] | None = None,
    source_table: str = "documents",
    min_deltas: int = 1,
) -> DataFrame:
    """Fold published deltas into a fresh one-file-per-bucket base
    (restoring the sortBy read-order guarantee) in one amortized
    shuffle, then atomically swap the base location and retire the
    deltas.  No-op (returns the current base) below ``min_deltas``.

    Maintenance-window operation: the swap itself is atomic renames, but
    retired delta files are DELETED -- run it when no concurrent reader
    holds those legs (tests use dedicated index kinds for exactly this
    reason)."""
    import shutil

    n_buckets = n_buckets or default_n_buckets()
    sort_cols = sort_cols or bucket_cols
    table = _base_table_name(sf_dir, kind, version, n_buckets, source_table)
    loc = os.path.join(index_root(), table)
    if not _is_published(loc):
        raise FileNotFoundError(f"no published base index at {loc}")
    deltas = _delta_locs(loc)
    if len(deltas) < min_deltas:
        if not spark.catalog.tableExists(table):
            return _register_ext_table(spark, table, loc)
        return spark.table(table)

    # Read every leg as a PLAIN parquet path, not a bucketed table: a
    # bucketed scan already reports the target HashPartitioning, so the
    # physical planner elides the realignment repartition as redundant
    # -- and then DisableUnnecessaryBucketedScan reverts the scan to
    # arbitrary file splits, shattering the write into many small files
    # per bucket.  Raw reads carry no partitioning claim, the
    # repartition survives, and the rewrite lands one file per bucket.
    combined = spark.read.parquet(loc)
    for dloc in deltas:
        combined = combined.unionByName(spark.read.parquet(dloc))

    stage_loc = f"{loc}.build-{os.getpid()}"
    stage_table = f"{table}_compact_{os.getpid()}"
    (
        combined.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
        .write.mode("overwrite")
        .option("path", stage_loc)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(stage_table)
    )
    spark.sql(f"DROP TABLE {stage_table}")
    with open(os.path.join(stage_loc, "_graft_meta.json"), "w") as fh:
        json.dump(
            {
                "ddl": _ddl_of(combined),
                "bucket_cols": bucket_cols,
                "sort_cols": sort_cols,
                "n_buckets": n_buckets,
            },
            fh,
        )
    old_loc = f"{loc}.old-{os.getpid()}"
    os.rename(loc, old_loc)
    os.rename(stage_loc, loc)
    if spark.catalog.tableExists(table):
        spark.catalog.refreshTable(table)
    else:
        _register_ext_table(spark, table, loc)
    shutil.rmtree(old_loc, ignore_errors=True)
    for dloc in deltas:
        dtable = os.path.basename(dloc)
        spark.sql(f"DROP TABLE IF EXISTS {dtable}")
        retired = f"{dloc}.old-{os.getpid()}"
        try:
            os.rename(dloc, retired)
        except OSError:
            continue
        shutil.rmtree(retired, ignore_errors=True)
    return spark.table(table)
