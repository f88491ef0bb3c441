"""SQL API surface: register the testdata tables as temp views so users can
query the engine with plain Spark SQL (the declarative dual of the
DataFrame operators; Catalyst treats both identically)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_rf_matrix_controller_spark.sources.tables import TABLES, load_table


_REGISTERED: set[tuple[str, str]] = set()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Create/replace one temp view per testdata table (idempotent per
    (session, sf_dir): repeated sql() calls skip the 10 footer re-reads)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _REGISTERED:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _REGISTERED.add(key)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the registered testdata views."""
    register_views(spark, sf_dir)
    return spark.sql(query)
