"""Range-partitioned address space: global key -> (device, local key).

Reference semantics: ``get_router_for_output`` (etl_controller.py:248-284)
maps a global output id onto the device owning it by walking cumulative
output counts; ids beyond the total clamp to the LAST router (:274-282),
yielding a local id past that router's real size -- preserved here as the
declared overflow semantics.

Spark re-expression (J6): windowed cumulative sum over the (tiny) device
dim builds [lo, hi] ranges; a broadcast range join assigns probes; a CASE
applies the overflow clamp.  This is literally Spark's own range
partitioning concept applied at the query level -- the probe side never
shuffles because the ranges dim is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import declared

# FIXTURES.md router_sizes: cumulative ranges 1-16, 17-24, 25-32; probes
# 1..40 exercise the overflow clamp (33-40 -> router 2, local 9-16).
ROUTER_SIZES = [(0, 16), (1, 8), (2, 8)]
N_PROBES = 40


@declared(
    "range_partition_outputs",
    oracle="""
    WITH sizes(router_id, num_outputs) AS (VALUES (0, 16), (1, 8), (2, 8)),
    ranges AS (
      SELECT router_id, num_outputs,
             CAST(sum(num_outputs) OVER (ORDER BY router_id
                    ROWS UNBOUNDED PRECEDING) AS INT) AS hi,
             CAST(sum(num_outputs) OVER (ORDER BY router_id
                    ROWS UNBOUNDED PRECEDING) - num_outputs + 1 AS INT) AS lo
      FROM sizes
    ),
    last_r AS (
      SELECT router_id AS last_rid, lo AS last_lo
      FROM ranges ORDER BY router_id DESC LIMIT 1
    ),
    probes AS (
      SELECT CAST(n AS INT) AS global_output
      FROM unnest(generate_series(1, 40)) g(n)
    )
    SELECT p.global_output,
           CAST(coalesce(r.router_id, l.last_rid) AS INT) AS router_id,
           CAST(CASE WHEN r.router_id IS NOT NULL
                     THEN p.global_output - r.lo + 1
                     ELSE p.global_output - l.last_lo + 1 END AS INT)
             AS local_output
    FROM probes p
    LEFT JOIN ranges r ON p.global_output BETWEEN r.lo AND r.hi
    CROSS JOIN last_r l
    """,
)
def range_partition_outputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: cumulative-sum range join with overflow clamp to the last device.

    The ranges dim has one row per device; its window cumsum is
    single-partition but O(devices).  Probes stay partition-parallel: the
    BETWEEN join and the clamp CASE are evaluated against the broadcast
    ranges, so this scales to any number of probe keys with zero shuffles.
    """
    sizes = spark.createDataFrame(
        ROUTER_SIZES, "router_id int, num_outputs int"
    )
    w = Window.orderBy("router_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranges = sizes.select(
        "router_id",
        F.sum("num_outputs").over(w).cast("int").alias("hi"),
        (F.sum("num_outputs").over(w) - F.col("num_outputs") + 1)
        .cast("int")
        .alias("lo"),
    )
    last_r = (
        ranges.orderBy(F.desc("router_id"))
        .limit(1)
        .select(
            F.col("router_id").alias("last_rid"), F.col("lo").alias("last_lo")
        )
    )
    probes = spark.range(1, N_PROBES + 1, 1, 1).select(
        F.col("id").cast("int").alias("global_output")
    )
    j = probes.join(
        F.broadcast(ranges),
        (probes.global_output >= ranges.lo) & (probes.global_output <= ranges.hi),
        "left",
    ).crossJoin(F.broadcast(last_r))
    return j.select(
        "global_output",
        F.coalesce(F.col("router_id"), F.col("last_rid"))
        .cast("int")
        .alias("router_id"),
        F.when(F.col("router_id").isNotNull(), F.col("global_output") - F.col("lo") + 1)
        .otherwise(F.col("global_output") - F.col("last_lo") + 1)
        .cast("int")
        .alias("local_output"),
    )
