"""CDC / SCD2: slowly-changing-dimension history without Delta.

Reference basis: config save is last-writer-wins whole-file
(etl_controller.py:3303-3309) -- no history.  The engine adds the
standard SCD2 emulation (MERGE INTO stand-in): close changed rows, insert
new versions, via join + union + flags.  With Delta/Iceberg on the
classpath this collapses to a real `MERGE INTO` (connectors stubbed
behind import-try per the environment contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Deterministic change feed: every 5th customer gets a new balance.
_CHANGES_SQL = """
      SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
      FROM customer WHERE c_custkey % 5 = 0
"""


@declared(
    "scd2_customer_history",
    oracle=f"""
    WITH changes AS ({_CHANGES_SQL})
    SELECT c.c_custkey,
           round(c.c_acctbal, 2) AS acctbal,
           1 AS version,
           ch.c_custkey IS NULL AS is_current
    FROM customer c
    LEFT JOIN changes ch ON ch.c_custkey = c.c_custkey
    UNION ALL
    SELECT c_custkey, new_bal AS acctbal, 2 AS version, true AS is_current
    FROM changes
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply: version-1 rows flagged non-current where a change
    arrived; version-2 rows appended for the change feed.

    One broadcast-able join (change feeds are small vs the dim) + an
    exchange-free union: the no-Delta MERGE.  History grows append-only,
    the natural layout for a partitioned-by-version parquet dim.
    """
    customer = load_table(spark, sf_dir, "customer")
    changes = customer.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("ch_key"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("new_bal"),
    )
    v1 = customer.join(
        F.broadcast(changes), customer.c_custkey == changes.ch_key, "left"
    ).select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit(1).alias("version"),
        F.col("ch_key").isNull().alias("is_current"),
    )
    v2 = changes.select(
        F.col("ch_key").alias("c_custkey"),
        F.col("new_bal").alias("acctbal"),
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionByName(v2)
