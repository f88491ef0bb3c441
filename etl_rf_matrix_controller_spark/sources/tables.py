"""Parquet source readers for the driver's testdata star schema.

Mirrors the reference's source surface (SURVEY.md SS2.1): full-state scans
(S2), parameterized point reads (S3), JSON config load (S4).  At scale these
are plain ``spark.read.parquet`` scans -- Catalyst pushes predicates and
prunes columns into the parquet footer reader, which is the whole
optimization story for 100 TB: never read what the query doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor
# (region/nation are fixed-size; supplier/customer/part grow ~linearly but
# stay far below a 100 TB fact table -- still, only region/nation/supplier
# are unconditionally broadcast-safe; customer/part we leave to AQE).
BROADCAST_SAFE = ("region", "nation", "supplier")


def set_events_read_confs(spark: SparkSession) -> None:
    """Session confs required to read events.parquet's TIMESTAMP(NANOS) `ts`.

    Self-defending: the caller's session (e.g. the driver's) may not carry
    these; both are runtime-settable.  The UTC pin matters for the
    timestamp_ntz shape: the NTZ wall time is only the epoch instant (what
    DuckDB reports) when the session timezone is UTC -- a foreign non-UTC
    session would otherwise silently shift every event by its TZ offset.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the `ts` column of an events scan (batch OR stream) to the
    session-TZ ``timestamp`` type, whatever shape this Spark read it as:

    - ``bigint``: TIMESTAMP(NANOS) surfaced as long-nanos under
      spark.sql.legacy.parquet.nanosAsLong; truncate ns -> us exactly like
      DuckDB's fetch.
    - ``timestamp_ntz``: newer Spark reads TIMESTAMP(NANOS) as
      micros-truncated NTZ (ignoring nanosAsLong).  NTZ forbids
      cast-to-long (epoch-seconds operators rely on it) and streaming
      watermarks reject it (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE); with the
      session pinned to UTC (set_events_read_confs) the cast is exact.

    One shared path for both readers so the next Spark quirk can't diverge
    them again (round-1 lesson: the batch fix missed the streaming reader).
    """
    ts_type = dict(df.dtypes).get("ts")
    from pyspark.sql import functions as F

    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning + predicate pushdown are
    applied by Catalyst on top of this (verify with .explain: PushedFilters,
    ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        set_events_read_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df
