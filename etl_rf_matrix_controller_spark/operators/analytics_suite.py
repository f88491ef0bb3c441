"""Multi-join analytic query suite (TPC-H-shaped) over the star schema.

The reference's data surface is a single sparse route map decorated by
dims (``etl_controller.py:1709, 1984-1996``); its "analytics" are dict
probes and counters.  This module exercises the engine on the canonical
warehouse shapes those probes generalize to -- multi-table join trees,
correlated-EXISTS semi joins, two-level aggregation, scalar-subquery
filters, and total-ordered top-k -- because an engine claiming "query
capability parity + 100 TB posture" must prove the classic plans, not just
the reference's point lookups.

Scale posture (verify with tools/plan_audit.py):
- Dim tables (region/nation/supplier, and customer where it is a pure
  decorator) are broadcast -- the fact-side join tree stays shuffle-free
  until the first groupBy.
- Aggregations run partial -> final (map-side combine) on the group keys;
  no query collects more than its result rows to the driver.
- Scalar subqueries (Q15's max) are unpartitioned windows over the
  ALREADY-AGGREGATED set (never over the fact table): one fact scan,
  with only |group keys| narrow rows through the single window task.
- All float aggregates use the integer-space conventions
  (plans/conventions.py) so results hash-match DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.conventions import (
    SCALE,
    exact_sum,
    exact_sum_sql,
    int_round_scaled,
    int_round_scaled_sql,
    ratio4,
    ratio4_sql,
)
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

_REVENUE = "l_extendedprice * (1 - l_discount)"


def _ts(lit: str) -> F.Column:
    return F.to_timestamp(F.lit(lit))


@declared(
    "shipping_priority_topk",
    oracle=f"""
    SELECT l.l_orderkey AS order_key,
           {exact_sum_sql(_REVENUE)} AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date,
           o.o_orderpriority AS order_priority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01'
      AND l.l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, order_key ASC
    LIMIT 10
    """,
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter -> 3-way join -> grouped revenue ->
    total-ordered top-k (unshipped-orders dashboard).

    customer is a pure filter/decorator here, so it broadcasts; lineitem
    never shuffles before the groupBy on its own key.  The LIMIT is
    total-ordered (revenue DESC, unique order_key ASC) per the repo
    conventions; revenues are integer-space sums so the sort keys are
    bit-identical cross-engine.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-06-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _ts("1998-06-01")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("order_priority"),
        )
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
        .select("order_key", "revenue", "order_date", "order_priority")
        .orderBy(F.desc("revenue"), F.asc("order_key"))
        .limit(10)
    )


@declared(
    "priority_orders_semi",
    oracle="""
    SELECT o.o_orderpriority AS order_priority,
           count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def priority_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -> LEFT SEMI join -> priority counts.

    The EXISTS decorrelates to a left-semi join on the order key with the
    extra range predicate pushed into the join condition -- Catalyst never
    materializes the subquery per row.  Counts are integers: no float
    conventions needed.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@declared(
    "local_supplier_revenue",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           {exact_sum_sql(_REVENUE)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join tree with a same-nation equality between
    two dim branches (customer and supplier), region filter, per-nation
    revenue.

    supplier/nation/region broadcast unconditionally; customer joins the
    fact side on its key.  The c_nationkey = s_nationkey condition rides on
    the supplier join rather than forcing a separate shuffle.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
    )


@declared(
    "returned_items_topk",
    oracle=f"""
    SELECT c.c_custkey AS cust_key,
           c.c_name AS cust_name,
           {exact_sum_sql(_REVENUE)} AS revenue,
           n.n_name AS nation_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, cust_key ASC
    LIMIT 20
    """,
)
def returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue ranking per customer.

    lineitem is pre-filtered on the return flag (pushed to the scan),
    joined to the order window, grouped by customer, decorated with nation
    via broadcast, then total-ordered top-20.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("cust_key"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(exact_sum(F.expr(_REVENUE)).alias("revenue"))
        .select("cust_key", "cust_name", "revenue", "nation_name")
        .orderBy(F.desc("revenue"), F.asc("cust_key"))
        .limit(20)
    )


@declared(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation -- orders per customer
    (LEFT join keeps zero-order customers), then the histogram of those
    counts.

    The inner count(o_orderkey) skips NULLs from the left join, so
    customers with no orders land in the c_count=0 bucket -- the classic
    outer-join-then-count trap, pinned here deliberately.  Both levels are
    partial->final integer aggregations; the second groupBy keys on a
    low-cardinality derived value (count), which AQE coalesces.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@declared(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               {exact_sum_sql(_REVENUE)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey AS supp_key,
           s.s_name AS supp_name,
           r.total_revenue AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar-subquery filter (revenue == max revenue).

    The max is an unpartitioned window over the ALREADY-AGGREGATED
    per-supplier revenue set (|suppliers| narrow rows through one task)
    -- ONE fact scan.  The aggregate-plus-crossJoin form re-derives the
    per-supplier aggregate for the max branch and scans lineitem twice
    (no ReusedExchange: column pruning diverges the subtrees).  Equality
    on the max is safe cross-engine because revenues are integer-space
    sums (bit-identical doubles).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-07-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact_sum(F.expr(_REVENUE)).alias("total_revenue")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn(
            "max_revenue", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
    )


@declared(
    "late_shipment_priority",
    oracle="""
    SELECT l.l_returnflag AS return_flag,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_returnflag
    """,
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments (>90 days after order) bucketed by
    priority class per return flag.

    The join carries a non-equi residual (shipdate vs orderdate+90) on top
    of the orderkey equi-join -- Catalyst keeps the equi part as the
    shuffle key and evaluates the interval predicate as a post-join
    filter.  Conditional counts are integer CASE sums, map-side combined.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@declared(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
           {ratio4_sql(
               "sum(CASE WHEN p.p_type = 'PROMO' THEN CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT) ELSE 0 END)",
               "sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT))",
           )} AS promo_ratio
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY date_trunc('month', l.l_shipdate)
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly share of revenue from PROMO parts.

    part is a pure decorator dim -> broadcast; lineitem's year filter is
    pushed to the parquet scan.  Both the promo and total revenue sums run
    in scaled-integer space (price*discount products have <=4 clean
    decimals), and the final ratio is the integer-exact ratio4 convention
    -- no float accumulates anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1998-01-01"))
        & (F.col("l_shipdate") < _ts("1999-01-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_scaled = F.round(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))) * SCALE
    ).cast("bigint")
    m = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month")
        )
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev_scaled).otherwise(0)).alias(
                "promo_s"
            ),
            F.sum(rev_scaled).alias("total_s"),
        )
    )
    return m.select(
        "ship_month", ratio4(F.col("promo_s"), F.col("total_s")).alias("promo_ratio")
    )


@declared(
    "parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#9' AND p.p_type <> 'PROMO'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size),
    excluding a brand/type and blacklisted (negative-balance) suppliers.

    The blacklist is a broadcast ANTI join (NOT IN over a non-null key);
    part broadcasts as a decorator; the only real shuffle is the distinct
    count on the group keys -- Spark runs it as a two-phase
    partial-distinct aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#9") & (F.col("p_type") != "PROMO")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@declared(
    "large_order_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             sum(CAST(round(l_quantity * 10000) AS BIGINT)) AS qty_s
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity * 10000) AS BIGINT)) > {150 * 10000}
    )
    SELECT c.c_name, o.o_orderkey AS order_key,
           CAST(o.o_orderdate AS DATE) AS order_date,
           {int_round_scaled_sql("big.qty_s")} AS total_qty
    FROM big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY big.qty_s DESC, order_key ASC
    LIMIT 10
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest orders (HAVING
    sum(quantity) > threshold), total-ordered top-10.

    The HAVING filter runs on the scaled-integer quantity sum BEFORE any
    join -- the big-order set is tiny, so both subsequent joins broadcast
    it against orders/customer rather than shuffling the facts.  Sort
    keys are exact integers; ties broken by unique order key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty_s = F.sum(F.round(F.col("l_quantity") * SCALE).cast("bigint")).alias("qty_s")
    big = (
        li.groupBy("l_orderkey").agg(qty_s).filter(F.col("qty_s") > 150 * SCALE)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            F.col("o_orderkey").alias("order_key"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            int_round_scaled(F.col("qty_s")).alias("total_qty"),
            F.col("qty_s"),
        )
        .orderBy(F.desc("qty_s"), F.asc("order_key"))
        .limit(10)
        .drop("qty_s")
    )


@declared(
    "blocking_supplier_topk",
    oracle="""
    WITH marked AS (
      SELECT l_orderkey, l_suppkey, l_shipdate,
             count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey)
               AS n_supp,
             max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship
      FROM lineitem
    ),
    blockers AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM marked
      WHERE n_supp >= 2 AND l_shipdate = max_ship
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM blockers b
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 10
    """,
)
def blocking_supplier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who shipped LAST in multi-supplier
    orders (the order's critical path), top-10 by blocked-order count.

    The classic formulation is a correlated EXISTS + NOT EXISTS pair;
    here the per-order facts (distinct-supplier count, max shipdate) come
    from one map-side-combinable groupBy rejoined to lineitem on the same
    orderkey -- measured ~2x faster than the window-function formulation
    (a collect_set window materializes the supplier set per ROW; the agg
    keeps one row per order), and both shuffles share one key so the
    exchange is reused.  Supplier is a broadcast dim; top-k total-ordered.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.max("l_shipdate").alias("max_ship"),
        )
        .filter(F.col("n_supp") >= 2)
    )
    blockers = (
        li.join(per_order, "l_orderkey")
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blockers.join(F.broadcast(supp), blockers.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@declared(
    "dormant_rich_customers",
    oracle=f"""
    WITH thresh AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 10000) AS BIGINT)) AS DOUBLE)
               / (count(*) * 10000.0) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    ),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-08-01'
    )
    SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
           {exact_sum_sql("c.c_acctbal")} AS total_bal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.avg_bal
      AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY c.c_mktsegment
    """,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, aggregated per market segment.

    The global average is a 1-row aggregate broadcast back as a scalar
    filter (never a single-partition window); computed as exact scaled-int
    sum over one correctly-rounded double division, so the comparison
    threshold is bit-identical cross-engine.  The "no recent orders" test
    is a broadcast ANTI join against the distinct recent-buyer set.
    """
    cust = load_table(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0)
    thresh = pos.agg(
        (
            F.sum(F.round(F.col("c_acctbal") * SCALE).cast("bigint")).cast("double")
            / (F.count(F.lit(1)) * float(SCALE))
        ).alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("1998-08-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(recent), "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            exact_sum(F.col("c_acctbal")).alias("total_bal"),
        )
    )
