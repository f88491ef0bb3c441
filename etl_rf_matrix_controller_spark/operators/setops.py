"""Relational set operations: except/intersect and offset-union merge.

Reference semantics: Python set algebra on selections -- union of selected
cells (``etl_controller.py:1727, 1772-1782``), intersection tests
``set(a) & set(b)`` (:2160, :2263), removal by difference (:2204-2208,
:2272-2276) -- and the multi-router scatter-gather merge that unions
per-device route maps after offsetting keys by cumulative output counts
(``etl_controller.py:2998-3038, 3059-3075``).

Spark re-expression: ``exceptAll/intersect/union`` (shuffle on the full
row as key -- keep projections narrow before set ops so the exchange
carries only the key columns) and a cumulative-offset union built from a
tiny windowed dim broadcast back onto the fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "set_except",
    oracle="""
    SELECT 'except' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) a
    UNION ALL
    SELECT 'intersect' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) b
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/SS2.7: EXCEPT and its INTERSECT dual, tagged and unioned.

    Mirrors group-removal difference and membership intersection
    (etl_controller.py:2204-2208, 2160).  Because both operands come from
    the same base table, the EXCEPT/INTERSECT pair collapses to ONE
    grouped scan: a distinct key belongs to the intersection iff it has at
    least one 'F' row, and to the difference otherwise -- so a single
    groupBy with a conditional tag replaces the two anti/semi joins (one
    scan, one shuffle, zero joins; was 4 scans before round 4).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus"
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.max((F.col("o_orderstatus") == "F").cast("int")).alias("has_f")
        )
        .select(
            F.when(F.col("has_f") == 1, F.lit("intersect"))
            .otherwise(F.lit("except"))
            .alias("op"),
            "o_custkey",
        )
    )


@declared(
    "scatter_gather_offset_union",
    oracle="""
    WITH sizes AS (
      SELECT event_type, max(user_id) AS n_out
      FROM events GROUP BY event_type
    ),
    offs AS (
      SELECT event_type,
             CAST(sum(n_out) OVER (ORDER BY event_type ROWS UNBOUNDED PRECEDING)
                  - n_out AS BIGINT) AS off
      FROM sizes
    )
    SELECT t.global_key, t.event_type, count(*) AS n_events
    FROM (
      SELECT e.user_id + o.off AS global_key, e.event_type
      FROM events e JOIN offs o ON e.event_type = o.event_type
    ) t
    GROUP BY t.global_key, t.event_type
    """,
)
def scatter_gather_offset_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SS2.7/T2-multi: union per-device states with cumulative key offsets.

    Mirrors ``_poll_all_routers`` (etl_controller.py:3040-3084): each
    device's local key space is shifted by the cumulative size of the
    devices before it (:3059-3075), then everything merges into one global
    map.  The offsets dim is tiny (one row per device) -- windowed cumsum
    on it costs nothing and the join back is a broadcast, so the fact
    never shuffles for the offsetting; only the final groupBy exchanges.
    """
    events = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    sizes = events.groupBy("event_type").agg(F.max("user_id").alias("n_out"))
    w = Window.orderBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offs = sizes.select(
        "event_type",
        (F.sum("n_out").over(w) - F.col("n_out")).cast("bigint").alias("off"),
    )
    return (
        events.join(F.broadcast(offs), "event_type")
        .select(
            (F.col("user_id") + F.col("off")).alias("global_key"), "event_type"
        )
        .groupBy("global_key", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
