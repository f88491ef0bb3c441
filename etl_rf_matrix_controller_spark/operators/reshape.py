"""Reshape operators: pivot, unpivot, cube.

Reference basis: the matrix GUI itself is a pivot (outputs x inputs grid
rendered from the sparse route dict, etl_controller.py:1998-2064); the
hierarchical group display (:286-330) generalizes to cube/grouping-set
totals.  Declared as the standard OLAP reshape surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "pivot_order_status",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: status categories to columns (the route-matrix grid shape,
    etl_controller.py:1998-2064).  Explicit value list => one aggregation
    pass, no second job to discover categories (which a bare .pivot()
    would run -- at 100 TB the discovery pass alone scans everything)."""
    orders = load_table(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "P", "O"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
    )


@declared(
    "unpivot_lineitem_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           round(l_quantity, 2) AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 2)
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', round(l_tax, 2)
    FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): three measure columns to (measure, val) rows.
    Map-side expansion (one scan, 3x rows out, zero shuffles)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', round(l_quantity, 2),"
            " 'discount', round(l_discount, 2),"
            " 'tax', round(l_tax, 2)) AS (measure, val)"
        ),
    )


@declared(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_items
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (flag, status): all 2^2 grouping sets in one pass --
    the full generalization of the reference's two-level group display
    (rollup covers the hierarchy; cube adds the cross-margins)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items")
    )


@declared(
    "multigrain_time_rollup",
    oracle="""
    SELECT o_orderstatus,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(grouping(month(o_orderdate)) AS BIGINT) AS is_year_grain,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS (
      (o_orderstatus, year(o_orderdate)),
      (o_orderstatus, year(o_orderdate), month(o_orderdate))
    )
    """,
)
def multigrain_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: order counts per status
    at BOTH the year and year-month grain in one pass (GROUPING SETS),
    with grouping() disambiguating the coarse rows from genuine NULLs.

    This is the continuous-aggregate pattern of time-series stores:
    maintain several grains of the same cube without re-scanning per
    grain.  Spark expands the grouping sets map-side into a single
    shuffle whose key carries the grouping id -- one exchange for both
    grains, vs two scans + a union for the naive formulation.  At 100 TB
    add the coarser grains to the same set list; cost grows with output
    cells, not scans.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
    )
    return (
        o.groupingSets(
            [["o_orderstatus", "y"], ["o_orderstatus", "y", "m"]],
            "o_orderstatus",
            "y",
            "m",
        )
        .agg(
            F.grouping("m").cast("bigint").alias("is_year_grain"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            F.col("y").cast("bigint").alias("y"),
            F.col("m").cast("bigint").alias("m"),
            "is_year_grain",
            "n_orders",
        )
    )
