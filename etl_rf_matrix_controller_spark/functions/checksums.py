"""Protocol checksum math re-expressed as distributed aggregates/projections.

Reference semantics: the wire protocol appends (a) an XOR fold of all frame
bytes keyed by command type (``calculate_checksum``,
etl_controller.py:387-418) and (b) a digit-sum checksum over zero-padded
ids, +106, wrapped by -95 when >126 (``calculate_route_checksum``,
etl_controller.py:479-501, wrap at :498-499).

Spark re-expression: ``bit_xor`` grouped aggregate (partial+final, so the
XOR folds map-side first -- associative/commutative, perfect for 100 TB)
and pure integer projections for the digit sum (whole-stage codegen, no
shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "checksum_xor",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(bit_xor(l_orderkey) AS BIGINT) AS xor_orderkey,
           CAST(bit_xor(l_partkey * 31 + l_suppkey) AS BIGINT) AS xor_part,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def checksum_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/F12: XOR fold per group (etl_controller.py:387-418).

    XOR is associative+commutative so Catalyst's partial aggregation XORs
    within each input partition before the (tiny) final shuffle -- the same
    reason the reference can fold bytes in stream order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr("bit_xor(l_orderkey)").cast("bigint").alias("xor_orderkey"),
        F.expr("bit_xor(l_partkey * 31 + l_suppkey)").cast("bigint").alias("xor_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@declared(
    "checksum_digit_sum",
    oracle="""
    SELECT o_orderkey, o_custkey, checksum,
           CASE WHEN checksum > 126 THEN checksum - 95 ELSE checksum END
             AS wrapped_checksum
    FROM (
      SELECT o_orderkey, o_custkey,
             ( (o_orderkey % 1000) // 100 % 10
             + (o_orderkey % 1000) // 10 % 10
             + (o_orderkey % 1000) % 10
             + (o_custkey % 1000) // 100 % 10
             + (o_custkey % 1000) // 10 % 10
             + (o_custkey % 1000) % 10
             + 106 ) AS checksum
      FROM orders
    ) t
    """,
)
def checksum_digit_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/F3: digit-sum checksum of zero-padded route ids.

    Mirrors ``calculate_route_checksum`` (etl_controller.py:479-501): the
    frame carries f"{output:03d},{input:03d}"; the checksum is the digit
    sum + 106, wrapped -95 above 126 (:498-499).  Zero-padding means only
    the last 3 digits contribute, hence ``% 1000``.  Pure projection:
    no shuffle, fully codegen'd, scales with scan bandwidth.
    """
    orders = load_table(spark, sf_dir, "orders")
    # Built with expr() for div (integer division) parity with DuckDB //
    raw = F.expr(
        """
        (o_orderkey % 1000) div 100 % 10
        + (o_orderkey % 1000) div 10 % 10
        + (o_orderkey % 1000) % 10
        + (o_custkey % 1000) div 100 % 10
        + (o_custkey % 1000) div 10 % 10
        + (o_custkey % 1000) % 10
        + 106
        """
    ).alias("checksum")
    return orders.select("o_orderkey", "o_custkey", raw).withColumn(
        "wrapped_checksum",
        F.when(F.col("checksum") > 126, F.col("checksum") - 95).otherwise(
            F.col("checksum")
        ),
    )
