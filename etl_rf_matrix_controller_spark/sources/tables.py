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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Column pruning + predicate pushdown are
    applied by Catalyst on top of this (verify with .explain: PushedFilters,
    ReadSchema)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Self-defending: the caller's session (e.g. the driver's) may not
        # carry this config; it is runtime-settable and required to read
        # the TIMESTAMP(NANOS) column at all.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as long-nanos (spark.sql.legacy.parquet.
            # nanosAsLong); truncate ns -> us exactly like DuckDB's fetch.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Newer Spark reads TIMESTAMP(NANOS) as micros-truncated NTZ
            # (ignoring nanosAsLong).  Normalize to the session-TZ timestamp
            # type: NTZ forbids cast-to-long, which the epoch-seconds
            # operators rely on.  All engine sessions pin UTC, so the
            # NTZ wall time IS the epoch instant, same as DuckDB's.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
