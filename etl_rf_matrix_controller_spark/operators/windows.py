"""Window-function operators: running totals, ranking.

Reference semantics: the crosshair delta recompute walks previous+current
hover state (``etl_controller.py:1839-1906``) -- an incremental running
view; status tables render rank-ordered rows (:737).

Spark re-expression (W3/W4): frame-spec running aggregates
(``rowsBetween(unboundedPreceding, currentRow)``) and rank/dense_rank.
Both partition by a real key so the window shuffle scales with keys, not
with a single global ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.conventions import int_round_scaled
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "window_running_total",
    oracle="""
    SELECT event_id, user_id, ts,
           (((((sum(CAST(round(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           )) + 50) - ((sum(CAST(round(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING
           )) + 50) % 100) / 100) / 100.0) AS running_value
    FROM events
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-key running total with an explicit frame spec.

    The scaled-integer sum (plans/conventions.py) keeps every prefix sum
    exact so each row's running value is bit-identical to the sequential
    oracle; (ts, event_id) is a total order within each key.
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.round(F.col("value") * 10000).cast("bigint")).over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        int_round_scaled(running, 2).alias("running_value"),
    )


@declared(
    "window_rank_dense",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           round(c_acctbal, 2) AS acctbal,
           rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
             AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
             AS drnk
    FROM customer
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: rank + dense_rank per segment (sorted-status-table parity,
    etl_controller.py:737).  Ties produce equal ranks on both engines, so
    no tiebreaker is needed for hash parity."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@declared(
    "window_rank_extended",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC,
                 o_orderkey)
    """,
)
def window_rank_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks per order status: ntile(4), percent_rank,
    cume_dist over price order.

    percent_rank = (rank-1)/(n-1) and cume_dist = peers<=/n are exact
    integer ratios evaluated in one correctly-rounded double division, so
    the doubles hash-match without any rounding convention.  One shuffle
    on the partition key; the per-partition sort is the same sort all
    three functions share (single Window physical operator).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


@declared(
    "window_first_last_nth",
    oracle="""
    SELECT o_orderkey AS order_key,
           o_custkey AS cust_key,
           CAST(first_value(o_orderdate) OVER wfull AS DATE)
             AS first_order_date,
           last_value(o_totalprice) OVER wfull AS last_total,
           nth_value(o_totalprice, 2) OVER wfull AS second_total
    FROM orders
    WINDOW wfull AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-boundary value functions: first_value / last_value /
    nth_value over the FULL partition frame (UNBOUNDED PRECEDING ..
    UNBOUNDED FOLLOWING) -- the default growing frame silently makes
    last_value mean "current row", the classic frame-spec trap, pinned
    here with the explicit full frame on both engines.

    One shuffle on o_custkey; values are STORED doubles/dates passed
    through untouched (no arithmetic -> no rounding convention needed);
    nth_value(_, 2) is NULL for single-order customers on both engines.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_custkey").alias("cust_key"),
        F.first("o_orderdate").over(w).cast("date").alias("first_order_date"),
        F.last("o_totalprice").over(w).alias("last_total"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_total"),
    )
