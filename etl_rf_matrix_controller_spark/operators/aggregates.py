"""Grouped aggregation operators: multi-agg, rollup, distinct, collect, top-k.

Reference semantics: success counting over batch route loops
(``etl_controller.py:1796-1806, 3258-3261``), the adjusted-rows badge
``len(row_luminance)`` (:2312), per-group snapshot collection (:3222-3223),
two-level group/member display (:286-330), and the periodic availability
indicator (:3119-3136).

Spark re-expression: plain ``groupBy().agg`` (Catalyst plans
partial+final automatically -- the map side pre-aggregates, which is the
whole scale story for 100 TB aggregation), ``rollup`` for hierarchy,
``TakeOrderedAndProject`` for top-k (no global sort).

Float determinism: every float sum goes through the scaled-integer
convention in plans/conventions.py -- exact, order-independent, and
primitive-typed (see that module for the overflow envelope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.conventions import (
    exact_avg,
    exact_avg_sql,
    exact_sum,
    int_round_scaled,
    exact_sum_sql,
    ratio4,
)
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "agg_partial_final",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {exact_sum_sql('l_quantity')} AS sum_qty,
           {exact_sum_sql('l_extendedprice')} AS sum_base_price,
           {exact_sum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {exact_sum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
             AS sum_charge,
           {exact_avg_sql('l_quantity')} AS avg_qty,
           {exact_avg_sql('l_discount', 4)} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_partial_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: grouped multi-aggregate (TPC-H Q1 shape).

    Mirrors batch success counting (etl_controller.py:1796-1806) scaled to
    a real pricing summary.  Catalyst's physical plan is partial
    HashAggregate -> exchange on (returnflag, linestatus) -> final
    HashAggregate: the shuffle carries 6 groups, not 600k rows.  Products
    are computed per-row in double (bit-identical on both engines), then
    summed exactly via scaled integers.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
        exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        exact_sum(disc_price).alias("sum_disc_price"),
        exact_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
        exact_avg(F.col("l_quantity")).alias("avg_qty"),
        exact_avg(F.col("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@declared(
    "grouping_sets_rollup",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           count(*) AS n_items,
           {exact_sum_sql('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def grouping_sets_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: two-level hierarchy totals via ROLLUP.

    Mirrors the group-header + member display (etl_controller.py:286-330):
    per-(flag,status), per-flag subtotal, and grand total in one pass.
    Spark expands the rollup map-side; still one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        exact_sum(F.col("l_quantity")).alias("sum_qty"),
    )


@declared(
    "distinct_users_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(DISTINCT user_id) AS dau
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
)
def distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: exact count-distinct per day (etl_controller.py:2312 badge).

    Exact distinct costs a two-phase shuffle (dedup then count).  The
    approximate variant for 100 TB dashboards is
    ``approx_distinct_users_daily`` (rows-only check: HLL internals differ
    from DuckDB so hashes can't match).
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )


@declared(
    "names_collect",
    oracle="""
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names,
           count(*) AS n_members
    FROM customer
    GROUP BY c_nationkey
    """,
)
def names_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-group ordered name collection (etl_controller.py:3222-3223).

    ``collect_list`` + ``sort_array`` + ``concat_ws`` keeps the result a
    deterministic scalar string per group regardless of partition arrival
    order (collect_list alone is nondeterministic under parallelism).
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("c_name"))).alias("names"),
        F.count(F.lit(1)).alias("n_members"),
    )


@declared(
    "conn_health_rate",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           ((((2 * (sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)) * 10000 + (count(*))) - (2 * (sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)) * 10000 + (count(*))) % (2 * (count(*)))) / (2 * (count(*)))) / 10000.0)
             AS health_rate,
           count(*) AS n_events
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
)
def conn_health_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/T4: availability rate per day (etl_controller.py:3119-3136).

    The rate is an integer ratio rounded in integer space (ratio4) --
    order-independent and immune to the cross-engine round() divergence.
    """
    events = load_table(spark, sf_dir, "events")
    ok = F.when(F.col("event_type") == "error", 0).otherwise(1)
    return events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        ratio4(F.sum(ok), F.count(F.lit(1))).alias("health_rate"),
        F.count(F.lit(1)).alias("n_events"),
    )


@declared(
    "percentile_disc_prices",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice, l_orderkey,
                                         l_linenumber) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           round(max(CASE WHEN rn = (n - 1) * 5 // 10 + 1
                          THEN l_extendedprice END), 2) AS p50,
           round(max(CASE WHEN rn = (n - 1) * 9 // 10 + 1
                          THEN l_extendedprice END), 2) AS p90,
           max(n) AS n_rows
    FROM ranked
    GROUP BY l_returnflag
    """,
)
def percentile_disc_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1) percentiles per group.

    Interpolated percentiles (Spark ``percentile`` / DuckDB
    ``quantile_cont``) disagree in final ulps across engines (measured:
    52724.24 vs 52724.25 at p50), so the declared op picks the exact
    element at index floor((n-1)*p)+1 under a total order -- integer
    selection, hash-exact, and at scale a single window + filter rather
    than a sort-based interpolation.  ``approx_percentile`` is the 100 TB
    sketch variant (one pass, mergeable, not oracle-matchable).
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda frac_num: F.round(  # noqa: E731
        F.max(
            F.when(
                F.col("rn") == F.expr(f"(n - 1) * {frac_num} div 10 + 1"),
                F.col("l_extendedprice"),
            )
        ),
        2,
    )
    return ranked.groupBy("l_returnflag").agg(
        pick(5).alias("p50"),
        pick(9).alias("p90"),
        F.max("n").alias("n_rows"),
    )


@declared(
    "topk_event_users",
    oracle=f"""
    SELECT user_id,
           {exact_sum_sql('value')} AS total_value,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY total_value DESC, user_id ASC
    LIMIT 10
    """,
)
def topk_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: top-k with a unique tiebreak.

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each
    partition keeps its local top-10 and only those reach the driver --
    no global sort, which is the difference between seconds and hours at
    100 TB.  user_id tiebreak makes the cut deterministic under value ties.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            exact_sum(F.col("value")).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("total_value"), F.asc("user_id"))
        .limit(10)
    )


# Deterministic HLL shape: m=64 registers over a 48-bit md5-derived hash
# (6 bucket bits + 42 rank bits).  Register scale 2^43 keeps the harmonic
# sum Z = sum(2^(43-M_j)) an exact bigint (max 64 * 2^43 = 2^49); the
# numerator m^2 * 2^43 = 2^55 also fits.  alpha_64 = 0.7213/(1+1.079/64)
# as the fixed ppm literal 709366 on both engines.
HLL_M, HLL_RANK_W = 64, 42
HLL_ALPHA_PPM = 709366


def _hll_rank_sql(rest: str) -> str:
    """Leading-zero rank of a {HLL_RANK_W}-bit value: position of the
    leftmost 1-bit counting from 1, = W+1 when the field is all zeros.
    Identical SQL on both engines (bin() of a POSITIVE bigint is the
    minimal-length binary string on both -- same contract hdr_bucket_expr
    relies on)."""
    return (
        f"CASE WHEN {rest} = 0 THEN {HLL_RANK_W + 1} "
        f"ELSE {HLL_RANK_W + 1} - length(bin({rest})) END"
    )


@declared(
    "hll_custom_distinct_daily",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               AS h
      FROM events
    ),
    regs AS (
      SELECT day, h % {HLL_M} AS bucket,
             CAST(max({_hll_rank_sql(f'(h // {HLL_M})')}) AS BIGINT) AS mx
      FROM hashed GROUP BY 1, 2
    ),
    zsum AS (
      SELECT day,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_RANK_W + 1} - mx))
                  AS BIGINT)
             + ({HLL_M} - count(*))
               * (CAST(1 AS BIGINT) << {HLL_RANK_W + 1}) AS z,
             CAST(count(*) AS BIGINT) AS used
      FROM regs GROUP BY day
    ),
    exact AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_dau
      FROM events GROUP BY 1
    )
    SELECT z.day, z.used AS n_buckets_used,
           CAST(floor({HLL_ALPHA_PPM}e0
                 * ((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) // z.z)
                 / 1000000e0) AS BIGINT) AS est_dau,
           e.exact_dau
    FROM zsum z JOIN exact e ON e.day = z.day
    """,
)
def hll_custom_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from first principles (Flajolet et al. 2007) so
    the estimator is DETERMINISTIC and oracle-checked -- the missing
    oracle of approx_distinct_users_daily (rows-only because Spark's
    engine-internal HLL bytes differ from DuckDB's): per day, hash every
    user to 48 portable md5 bits, split 6 bucket bits + 42 rank bits,
    keep max leading-zero rank per bucket, and read the estimate off the
    integer-scaled harmonic sum Z = sum(2^(43 - M_j)) (empty buckets
    contribute 2^43 = 2^0 at unit scale).  est = alpha_64 * m^2 * 2^43
    DIV Z, final alpha multiply in doubles under floor (exact while
    est < 2^33 -- 8 billion DAU; products of integers < 2^53 are
    IEEE-exact, both engines compute the identical double).

    Mergeability -- THE 100 TB property -- is per-bucket integer MAX:
    shard sketches combine by max(M_j), associative and idempotent, so
    1000 executors reduce 64-row states in a tree and a month rollup
    merges 30 daily sketches without rescanning (pinned bit-equal to
    the direct build by tests/test_round6_ops.py).  Register state is
    64 rows per group at ~1.04/sqrt(64) = 13% relative error;
    production widens m, the plan shape is unchanged.  The exact DAU
    rides along as the self-audit column (observed per-day error at
    sf0.01: 3-16%, inside the m=64 envelope).
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        )
        .cast("bigint")
        .alias("h"),
    ).distinct().localCheckpoint(eager=True)  # register build + exact audit
    regs = (
        hashed.select(
            "day",
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(_hll_rank_sql(f"(h DIV {HLL_M})")).alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").cast("bigint").alias("mx"))
    )
    zsum = regs.groupBy("day").agg(
        (
            F.sum(F.expr(f"CAST(1 AS BIGINT) << ({HLL_RANK_W + 1} - mx)"))
            .cast("bigint")
            + (HLL_M - F.count(F.lit(1)))
            * F.expr(f"CAST(1 AS BIGINT) << {HLL_RANK_W + 1}")
        ).alias("z"),
        F.count(F.lit(1)).cast("bigint").alias("used"),
    )
    # True user-level exact (not hash-level: a 48-bit collision would
    # silently undercount the hashed frame) -- second fact scan, within
    # the suite's <=2 scan ceiling.
    exact = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_dau")
    )
    return (
        zsum.join(exact, "day")
        .select(
            "day",
            F.col("used").alias("n_buckets_used"),
            F.expr(
                f"CAST(floor({HLL_ALPHA_PPM}e0 * "
                f"((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) DIV z) "
                f"/ 1000000e0) AS BIGINT)"
            ).alias("est_dau"),
            "exact_dau",
        )
    )


# 3 x the m=64 HLL's relative standard deviation (1.04/sqrt(64) = 13%)
# in ppm: the audited accuracy envelope of the approx-DAU dashboard row.
HLL_3RSD_PPM = 390000


@declared(
    "approx_distinct_users_daily",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               AS h
      FROM events
    ),
    regs AS (
      SELECT day, h % {{HLL_M}} AS bucket,
             CAST(max({{RANK_SQL}}) AS BIGINT) AS mx
      FROM hashed GROUP BY 1, 2
    ),
    zsum AS (
      SELECT day,
             CAST(sum(CAST(1 AS BIGINT) << ({{HLL_RANK_W}} + 1 - mx))
                  AS BIGINT)
             + ({{HLL_M}} - count(*))
               * (CAST(1 AS BIGINT) << ({{HLL_RANK_W}} + 1)) AS z
      FROM regs GROUP BY day
    ),
    exact AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS dau_exact
      FROM events GROUP BY 1
    ),
    est AS (
      SELECT z.day, e.dau_exact,
             CAST(floor({{HLL_ALPHA_PPM}}e0
                   * ((CAST(1 AS BIGINT) << (12 + {{HLL_RANK_W}} + 1)) // z.z)
                   / 1000000e0) AS BIGINT) AS dau_approx
      FROM zsum z JOIN exact e ON e.day = z.day
    )
    SELECT day, dau_exact, dau_approx,
           CAST((1000000 * abs(dau_approx - dau_exact)) // dau_exact
             AS BIGINT) AS rel_err_ppm,
           (1000000 * abs(dau_approx - dau_exact)) // dau_exact
             <= {HLL_3RSD_PPM} AS within_3rsd
    FROM est
    """.format(
        HLL_M=HLL_M,
        HLL_RANK_W=HLL_RANK_W,
        HLL_ALPHA_PPM=HLL_ALPHA_PPM,
        RANK_SQL=_hll_rank_sql(f"(h // {HLL_M})"),
    ),
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 at-scale variant, AUDITED: sketch-based distinct DAU (single
    aggregation pass, constant memory per group -- the 100 TB answer
    when ~13% is fine at m=64) emitted SIDE BY SIDE with the exact
    count, the relative error in ppm, and a within-3-RSD pass flag, all
    DuckDB-oracled.  Round 8 promotion from the rows-only check: the
    estimator is the repo's deterministic first-principles HLL
    (hll_custom_distinct_daily's registers), so the ESTIMATE itself is
    cross-engine bit-exact -- the engine-internal
    ``approx_count_distinct`` spelling has the identical plan shape
    (partial sketch -> merge) but engine-private bytes no oracle can
    reproduce.

    Scale: the sketch side touches {HLL_M} register rows per day
    regardless of traffic; the exact side (the audit) pays the
    two-phase dedup shuffle -- in production the audit runs on a
    sampled day, not the full stream.
    """
    base = hll_custom_distinct_daily(spark, sf_dir)
    err = F.expr("(1000000 * abs(est_dau - exact_dau)) DIV exact_dau")
    return base.select(
        "day",
        F.col("exact_dau").alias("dau_exact"),
        F.col("est_dau").alias("dau_approx"),
        err.cast("bigint").alias("rel_err_ppm"),
        (err <= HLL_3RSD_PPM).alias("within_3rsd"),
    )


@declared(
    "hll_weekly_rollup",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS week_id,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               AS h
      FROM events
    ),
    regs AS (
      SELECT week_id, h % {HLL_M} AS bucket,
             CAST(max({_hll_rank_sql(f'(h // {HLL_M})')}) AS BIGINT) AS mx
      FROM hashed GROUP BY 1, 2
    ),
    zsum AS (
      SELECT week_id,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_RANK_W + 1} - mx))
                  AS BIGINT)
             + ({HLL_M} - count(*))
               * (CAST(1 AS BIGINT) << {HLL_RANK_W + 1}) AS z,
             CAST(count(*) AS BIGINT) AS used
      FROM regs GROUP BY week_id
    ),
    exact AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
               AS week_id,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_wau
      FROM events GROUP BY 1
    )
    SELECT CAST(z.week_id AS BIGINT) AS week_id, z.used AS n_buckets_used,
           CAST(floor({HLL_ALPHA_PPM}e0
                 * ((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) // z.z)
                 / 1000000e0) AS BIGINT) AS est_wau,
           e.exact_wau
    FROM zsum z JOIN exact e ON e.week_id = z.week_id
    """,
)
def hll_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ROLLUP as a declared query: weekly distinct users read off
    DAILY HLL register states merged by per-bucket MAX -- the Spark side
    deliberately builds the 30 daily sketches first and merges 7 at a
    time, while the oracle builds each weekly sketch directly from the
    raw stream; the cross-engine MATCH is therefore a per-row proof of
    the merge identity (merge(daily sketches) == direct(weekly build))
    on real data, promoting tests/test_round6_ops.py's shard-merge
    pytest into the oracle gate itself.

    This is THE production pattern at 100 TB: persist tiny per-partition
    sketch states (64 rows per day here) and answer any coarser-grain
    distinct question by bucket-wise MAX over the states -- never
    rescanning the fact table per grain.  Week key is the portable
    integer days-since-epoch DIV 7 (date_trunc('week')/dayofweek
    conventions differ cross-engine; integer day arithmetic does not).
    The exact WAU rides along as the self-audit column (one extra fact
    scan, within the suite's ceiling).
    """
    ev = load_table(spark, sf_dir, "events")
    week = F.expr(
        "CAST(datediff(to_date(ts), DATE '1970-01-01') AS BIGINT) DIV 7"
    )
    daily = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
        .select(
            "day",
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(_hll_rank_sql(f"(h DIV {HLL_M})")).alias("rank"),
        )
        .groupBy("day", "bucket")
        .agg(F.max("rank").cast("bigint").alias("mx"))
    )
    # THE merge: weekly registers from daily registers, bucket-wise MAX.
    weekly = (
        daily.select(
            F.expr(
                "CAST(datediff(to_date(day), DATE '1970-01-01') AS BIGINT)"
                " DIV 7"
            ).alias("week_id"),
            "bucket",
            "mx",
        )
        .groupBy("week_id", "bucket")
        .agg(F.max("mx").alias("mx"))
    )
    zsum = weekly.groupBy("week_id").agg(
        (
            F.sum(F.expr(f"CAST(1 AS BIGINT) << ({HLL_RANK_W + 1} - mx)"))
            .cast("bigint")
            + (HLL_M - F.count(F.lit(1)))
            * F.expr(f"CAST(1 AS BIGINT) << {HLL_RANK_W + 1}")
        ).alias("z"),
        F.count(F.lit(1)).cast("bigint").alias("used"),
    )
    exact = ev.groupBy(week.alias("week_id")).agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_wau")
    )
    return zsum.join(exact, "week_id").select(
        F.col("week_id").cast("bigint").alias("week_id"),
        F.col("used").alias("n_buckets_used"),
        F.expr(
            f"CAST(floor({HLL_ALPHA_PPM}e0 * "
            f"((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) DIV z) "
            f"/ 1000000e0) AS BIGINT)"
        ).alias("est_wau"),
        "exact_wau",
    )


# Count-min sketch shape: 4 hash rows x 2048 cells, md5-derived hashes --
# fully deterministic, so unlike HLL this sketch gets an exact oracle.
CMS_ROWS, CMS_CELLS = 4, 2048


# The CMS heavy-hitter contract (shared verbatim by the batch query and
# its streaming twin -- additive cell counts make the sketch the same
# object either way, so one oracle certifies both).
CMS_HH_ORACLE_SQL = f"""
    WITH cells AS (
      SELECT j.j AS row_id,
             ('0x' || substring(md5(CAST(j.j AS VARCHAR) || '_' ||
                                    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {CMS_CELLS} AS cell,
             CAST(count(*) AS BIGINT) AS c
      FROM events, unnest(generate_series(0, {CMS_ROWS - 1})) AS j(j)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
      FROM events GROUP BY user_id
    ),
    est AS (
      SELECT e.user_id, e.exact_count,
             CAST(min(cl.c) AS BIGINT) AS est_count
      FROM exact e
      JOIN cells cl
        ON cl.cell = ('0x' || substring(md5(CAST(cl.row_id AS VARCHAR) || '_'
                                        || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT
                     % {CMS_CELLS}
      GROUP BY e.user_id, e.exact_count
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(exact_count) AS BIGINT) AS total_events
      FROM exact
    )
    SELECT user_id, est_count, exact_count,
           est_count >= exact_count AS never_underestimates
    FROM est, tot
    WHERE est_count * 5 * n_keys >= 6 * total_events
    """


def cms_rows_col():
    """The CMS_ROWS-way row fan-out column (one copy of each key per
    sketch hash row)."""
    return F.explode(F.sequence(F.lit(0), F.lit(CMS_ROWS - 1))).alias(
        "row_id"
    )


def cms_cell_col():
    """Portable md5 cell index for (row_id, user_id) -- the single
    hashing convention of the CMS family on both engines."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("row_id").cast("string"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_CELLS
    )


def cms_hh_readoff(cells: DataFrame, ev: DataFrame) -> DataFrame:
    """Heavy-hitter read-off over a built (row_id, cell, c) sketch:
    probe every key's CMS_ROWS cells, estimate = min cell count, report
    keys whose estimate crosses 1.2x the mean per-key count (exact
    integer form).  Shared by cms_heavy_hitters (batch-built cells) and
    stream_cms_heavy_hitters (streaming-built cells)."""
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .localCheckpoint(eager=False)
    )
    probes = exact.select("user_id", "exact_count", cms_rows_col()).select(
        "user_id", "exact_count", "row_id", cms_cell_col().alias("cell")
    )
    est = (
        probes.join(F.broadcast(cells), ["row_id", "cell"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )
    tot = exact.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("exact_count").cast("bigint").alias("total_events"),
    )
    return (
        est.crossJoin(F.broadcast(tot))
        .filter(
            F.col("est_count") * 5 * F.col("n_keys")
            >= 6 * F.col("total_events")
        )
        .select(
            "user_id",
            "est_count",
            "exact_count",
            (F.col("est_count") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
        )
    )


@declared("cms_heavy_hitters", oracle=CMS_HH_ORACLE_SQL)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over the event stream: CMS_ROWS x
    CMS_CELLS md5-derived hash rows (the constants above are the single
    source of truth), per-key estimate = min over rows of the cell
    counts, keys reported when the estimate crosses 1.2x the mean
    per-key count (scale-relative, integer-exact).

    The sketch build is ONE pass with map-side combine into CMS_CELLS
    cells --
    at 100 TB the cells are the only shuffled state (mergeable across
    executors/days by cell-wise +, the CMS property), while the exact
    per-key count it is compared against needs a full keyed shuffle.  The
    estimate-vs-exact join here exists to certify the one-sided error
    bound (never_underestimates is provably always true); production
    keeps only the sketch side.  Deterministic hashes (md5 prefix, the
    engine-portable fingerprint used by hash_bucket) make the sketch
    contents oracle-exact, unlike the HLL whose internals are
    engine-specific.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    cells = (
        ev.select("user_id", cms_rows_col())
        .select("row_id", cms_cell_col().alias("cell"))
        .groupBy("row_id", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    # Heavy = estimate >= 1.2x the mean per-key count, in exact integer
    # form (est * 5 * n_keys >= 6 * total) -- scale-relative, so the same
    # query is non-vacuous at every sf.  The exact side inside the
    # read-off is checkpointed once (probe join + totals row), so the
    # events scan runs twice total.
    return cms_hh_readoff(cells, ev)


@declared(
    "incremental_agg_merge",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS sum_scaled,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events
      GROUP BY date_trunc('day', ts)
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', day) AS TIMESTAMP) AS month,
             CAST(sum(sum_scaled) AS BIGINT) AS s,
             CAST(sum(n_events) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS n_partials
      FROM daily
      GROUP BY date_trunc('month', day)
    )
    SELECT month, n_partials, c AS n_events,
           ((((((((2 * s + c) - (2 * s + c) % (2 * c)) / (2 * c))) + 50) - ((((2 * s + c) - (2 * s + c) % (2 * c)) / (2 * c)) + 50) % 100) / 100) / 100.0)
             AS avg_value
    FROM monthly
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregate maintenance: daily (sum, count) partials merged
    into an exact monthly average WITHOUT re-reading raw rows -- the
    incremental-materialized-view pattern.  At 100 TB this is how
    rollups stay fresh: each day closes into a partial once, and any
    coarser grain is a merge over partials (mergeable because the state
    is algebraic: sums of scaled ints add associatively), turning a
    month-end recompute over 3 TB/day of raw events into a 30-row merge.

    Determinism: the partial state is the scaled-integer sum (exact,
    order-independent); the final average is the two-step integer
    rounding of exact_avg applied to the MERGED (s, c) -- bit-identical
    to computing exact_avg over the raw month, which is what the oracle's
    equivalent merge verifies.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("sum_scaled"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    monthly = daily.groupBy(F.date_trunc("month", "day").alias("month")).agg(
        F.sum("sum_scaled").cast("bigint").alias("s"),
        F.sum("n_events").cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n_partials"),
    )
    x = 2 * F.col("s") + F.col("c")
    a4 = (x - x % (2 * F.col("c"))) / (2 * F.col("c"))  # scaled 4-dec avg
    return monthly.select(
        "month",
        "n_partials",
        F.col("c").alias("n_events"),
        int_round_scaled(a4, 2).alias("avg_value"),
    )


@declared(
    "kmv_distinct_estimate",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
      FROM events
    ),
    kth AS (
      SELECT h AS h_k
      FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hashed
      ) WHERE rn = 8
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM hashed
    )
    SELECT CAST(8 AS BIGINT) AS k,
           kth.h_k,
           CAST((7 * 4294967296) // kth.h_k AS BIGINT) AS est_distinct,
           exact.exact_distinct
    FROM kth CROSS JOIN exact
    """,
)
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch, k=8 -- the
    DETERMINISTIC member of the sketch family: unlike HLL
    (approx_distinct_users_daily, rows-only because engine sketch
    internals differ), KMV's estimate is a pure function of the k-th
    smallest portable hash, so the estimator itself is oracle-checked:
    est = (k-1) * 2^32 DIV h_k over md5-derived 32-bit hashes.

    Mergeability (union = keep the k smallest of the combined sets) is
    what makes it a one-pass 100 TB sketch: each partition keeps its k
    minima, the merge is k log k per pair.  The exact count rides along
    here as the self-audit column; production drops it (that is the
    whole point of the sketch).  If fewer than k distinct hashes exist
    the sketch degenerates to the exact count (no row from the k-th
    lookup) -- fixture SFs all exceed k (k=8 keeps even the 15-user sf0.001 fixture non-vacuous; production uses k in the hundreds for ~1/sqrt(k) relative error).
    """
    ev = load_table(spark, sf_dir, "events")
    # hashed feeds two consumers (k-th lookup + exact-count audit), so it
    # is localCheckpointed once: the events scan and the distinct shuffle
    # run exactly once (shared-consumer rule); the scalar join below is
    # an explicit broadcast since checkpointed frames carry no stats.
    hashed = ev.select(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h")
    ).distinct().localCheckpoint(eager=True)
    kth = (
        hashed.withColumn(
            "rn", F.row_number().over(Window.orderBy("h"))
        )
        .filter(F.col("rn") == 8)
        .select(F.col("h").alias("h_k"))
    )
    exact = hashed.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    return (
        kth.crossJoin(F.broadcast(exact))
        .select(
            F.lit(8).cast("bigint").alias("k"),
            "h_k",
            F.expr("(7 * 4294967296) DIV h_k").cast("bigint").alias(
                "est_distinct"
            ),
            "exact_distinct",
        )
    )


BOOT_B = 32  # bootstrap replicas


@declared(
    "bootstrap_mean_ci",
    oracle=f"""
    WITH reps AS (
      SELECT r.r,
             CAST(round(e.value * 10000) AS BIGINT) AS v,
             CASE
               WHEN ('0x' || substring(md5(CAST(e.event_id AS VARCHAR)
                         || '_' || CAST(r.r AS VARCHAR)), 1, 8))::BIGINT
                    % 1000 < 368 THEN 0
               WHEN ('0x' || substring(md5(CAST(e.event_id AS VARCHAR)
                         || '_' || CAST(r.r AS VARCHAR)), 1, 8))::BIGINT
                    % 1000 < 736 THEN 1
               ELSE 2
             END AS w
      FROM events e, generate_series(0, {BOOT_B - 1}) AS r(r)
    ),
    means AS (
      SELECT r,
             CAST(sum(w * v) AS BIGINT) AS s,
             CAST(sum(w) AS BIGINT) AS c
      FROM reps GROUP BY r HAVING sum(w) > 0
    ),
    a4 AS (
      SELECT r,
             CAST(((2 * s + c) - (2 * s + c) % (2 * c)) / (2 * c) AS BIGINT)
               AS mean4
      FROM means
    ),
    ranked AS (
      SELECT mean4,
             CAST(row_number() OVER (ORDER BY mean4, r) AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS nb
      FROM a4
    )
    SELECT CAST(max(nb) AS BIGINT) AS n_replicas,
           max(CASE WHEN rn = 4 THEN mean4 END) / 10000.0 AS ci_lo,
           max(CASE WHEN rn = nb - 3 THEN mean4 END) / 10000.0 AS ci_hi
    FROM ranked
    """,
)
def bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean value -- THE
    resampling method that works at 100 TB: classic bootstrap needs n
    draws with replacement per replica (a global shuffle per replica),
    while Poisson bootstrap gives each row an independent Poisson(1)
    weight per replica, so all B replicas compute in ONE pass as
    weighted partial aggregations.

    Determinism: the Poisson(1) weight is approximated by thresholding
    a portable md5 hash of (row id, replica id) at the pmf boundaries
    (P(0)=P(1)=.368 -> w in {{0,1,2}} with the tail mass folded into 2)
    -- no RNG, rerun- and engine-stable.  Replica means are exact
    scaled-integer averages (the exact_avg half-up step); the 90%-ish
    band is rank-based over the B=32 sorted replica means (ranks 4 and
    B-3), so every emitted number is integer-derived.  Empty replicas
    (possible only at toy n) are excluded identically on both sides.
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    reps = ev.select(
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_B - 1))).alias("r"),
        F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        F.col("event_id"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("event_id").cast("string"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    w = F.when(h < 368, 0).when(h < 736, 1).otherwise(2)
    means = (
        reps.select("r", "v", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.col("w") * F.col("v")).cast("bigint").alias("s"),
            F.sum("w").cast("bigint").alias("c"),
        )
        .filter(F.col("c") > 0)
    )
    x = 2 * F.col("s") + F.col("c")
    mean4 = ((x - x % (2 * F.col("c"))) / (2 * F.col("c"))).cast("bigint")
    a4 = means.select("r", mean4.alias("mean4"))
    wr = Window.orderBy("mean4", "r")
    ranked = a4.select(
        "mean4",
        F.row_number().over(wr).cast("bigint").alias("rn"),
        F.count(F.lit(1))
        .over(
            Window.orderBy("mean4").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("bigint")
        .alias("nb"),
    )
    return ranked.agg(
        F.max("nb").cast("bigint").alias("n_replicas"),
        (F.max(F.when(F.col("rn") == 4, F.col("mean4"))) / 10000.0).alias(
            "ci_lo"
        ),
        (
            F.max(
                F.when(F.col("rn") == F.col("nb") - 3, F.col("mean4"))
            )
            / 10000.0
        ).alias("ci_hi"),
    )


@declared(
    "kmv_union_distinct",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT
             CASE WHEN CAST(date_part('day', ts) AS BIGINT) <= 15
                  THEN 1 ELSE 2 END AS half,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
      FROM events
    ),
    sk AS (
      SELECT half, h
      FROM (
        SELECT half, h,
               row_number() OVER (PARTITION BY half ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= 8
    ),
    side_k AS (
      SELECT half, max(h) AS h_k FROM sk GROUP BY half
    ),
    merged AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn
        FROM (SELECT DISTINCT h FROM sk)
      ) WHERE rn = 8
    ),
    exact AS (
      SELECT CAST(count(DISTINCT h) AS BIGINT) AS exact_union FROM hashed
    )
    SELECT CAST(8 AS BIGINT) AS k,
           CAST((7 * 4294967296) // a.h_k AS BIGINT) AS est_first,
           CAST((7 * 4294967296) // b.h_k AS BIGINT) AS est_second,
           CAST((7 * 4294967296) // m.h AS BIGINT) AS est_union,
           e.exact_union
    FROM side_k a, side_k b, merged m, exact e
    WHERE a.half = 1 AND b.half = 2
    """,
)
def kmv_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch UNION -- the mergeability demo the 100 TB story rests
    on, kept fully deterministic and oracle-checked (unlike HLL, whose
    engine internals differ): month halves play two shards, each reduced
    to its k=8 smallest distinct user hashes, and the union sketch is the
    k smallest of the MERGED SKETCHES alone (never the re-scanned data)
    -- the identity "k-min of (sketch_a union sketch_b) == k-min of the
    full union" that lets a 1000-executor job reduce per-partition
    sketches in a tree instead of re-shuffling raw keys.  The exact union
    count rides along as the self-audit column.

    Plan: one events scan -> distinct (half, hash) -> the per-half and
    merged ranks all run over the k*2-row sketch table; the exact count
    shares the same checkpointed distinct frame (shared-consumer rule,
    explicit broadcasts on the stat-less scalar frames).
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.select(
            F.when(F.dayofmonth("ts") <= 15, F.lit(1))
            .otherwise(F.lit(2))
            .alias("half"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
            )
            .cast("bigint")
            .alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sk = (
        hashed.withColumn(
            "rn", F.row_number().over(Window.partitionBy("half").orderBy("h"))
        )
        .filter(F.col("rn") <= 8)
        .select("half", "h")
        .localCheckpoint(eager=True)  # feeds side_k AND merged
    )
    side_k = sk.groupBy("half").agg(F.max("h").alias("h_k"))
    a = side_k.filter(F.col("half") == 1).select(F.col("h_k").alias("h_a"))
    b = side_k.filter(F.col("half") == 2).select(F.col("h_k").alias("h_b"))
    merged = (
        sk.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("h")))
        .filter(F.col("rn") == 8)
        .select(F.col("h").alias("h_m"))
    )
    exact = hashed.select("h").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(8).cast("bigint").alias("k"),
            F.expr("(7 * 4294967296) DIV h_a").cast("bigint").alias("est_first"),
            F.expr("(7 * 4294967296) DIV h_b").cast("bigint").alias("est_second"),
            F.expr("(7 * 4294967296) DIV h_m").cast("bigint").alias("est_union"),
            "exact_union",
        )
    )


@declared(
    "kmv_intersection_estimate",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT event_type AS tag,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    sketch AS (
      SELECT tag, h
      FROM (
        SELECT tag, h,
               row_number() OVER (PARTITION BY tag ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= 8
    ),
    theta AS (
      SELECT CAST(min(mx) AS BIGINT) AS theta
      FROM (SELECT tag, max(h) AS mx FROM sketch GROUP BY tag) t
    ),
    common AS (
      SELECT CAST(count(*) AS BIGINT) AS n_common
      FROM sketch a JOIN sketch b
        ON b.h = a.h AND a.tag = 'purchase' AND b.tag = 'error'
      CROSS JOIN theta th
      WHERE a.h < th.theta
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_intersection
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
           p
      WHERE EXISTS (
        SELECT 1 FROM (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'error') e
        WHERE e.user_id = p.user_id)
    )
    SELECT CAST(8 AS BIGINT) AS k, th.theta, c.n_common,
           CAST((c.n_common * 4294967296) // th.theta AS BIGINT)
             AS est_intersection,
           x.exact_intersection
    FROM theta th CROSS JOIN common c CROSS JOIN exact x
    """,
)
def kmv_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set intersection on top of the KMV machinery
    (`kmv_distinct_estimate` / `kmv_union_distinct` complete the
    union/intersect algebra): estimate how many users both purchased
    AND errored from two k=8 sketches alone -- theta = the smaller of
    the two k-th-minimum hashes, the common retained hashes below theta
    are an unbiased sample at rate theta/2^32, so est = n_common *
    2^32 DIV theta (Dasgupta et al., the DataSketches theta model).
    Set EXPRESSIONS over sketches are what production monitoring runs
    when the raw keys are long gone.

    Fully deterministic (portable md5-derived 32-bit hashes, integer
    rank selection, one integer floor division) and therefore
    oracle-checked end-to-end, unlike engine-internal HLL.  The exact
    intersection rides along as the self-audit column.  One events scan
    feeds the tagged distinct (checkpointed: sketch build + both join
    aliases); every downstream frame is <= k rows.
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            F.col("event_type").alias("tag"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
            "user_id",
        )
        .localCheckpoint(eager=True)  # sketch build + exact-audit consumers
    )
    sketch = (
        hashed.select("tag", "h")
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("tag").orderBy("h"))
        )
        .filter(F.col("rn") <= 8)
        .select("tag", "h")
        .localCheckpoint(eager=True)  # theta + both intersection aliases
    )
    theta = (
        sketch.groupBy("tag")
        .agg(F.max("h").alias("mx"))
        .agg(F.min("mx").cast("bigint").alias("theta"))
    )
    a = sketch.filter(F.col("tag") == "purchase").select(F.col("h").alias("ha"))
    b = sketch.filter(F.col("tag") == "error").select(F.col("h").alias("hb"))
    common = (
        a.join(F.broadcast(b), F.col("ha") == F.col("hb"))
        .crossJoin(F.broadcast(theta))
        .filter(F.col("ha") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    pu = hashed.filter(F.col("tag") == "purchase").select("user_id").distinct()
    er = hashed.filter(F.col("tag") == "error").select("user_id").distinct()
    exact = (
        pu.join(er.hint("shuffle_hash"), "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    return (
        F.broadcast(theta)
        .crossJoin(F.broadcast(common))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(8).cast("bigint").alias("k"),
            "theta",
            "n_common",
            F.expr(
                "CAST((n_common * 4294967296) DIV theta AS BIGINT)"
            ).alias("est_intersection"),
            "exact_intersection",
        )
    )


@declared(
    "kmv_difference_estimate",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT event_type AS tag,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    sketch AS (
      SELECT tag, h
      FROM (
        SELECT tag, h,
               row_number() OVER (PARTITION BY tag ORDER BY h) AS rn
        FROM hashed
      ) WHERE rn <= 8
    ),
    theta AS (
      SELECT CAST(min(mx) AS BIGINT) AS theta
      FROM (SELECT tag, max(h) AS mx FROM sketch GROUP BY tag) t
    ),
    only_a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_only
      FROM sketch a CROSS JOIN theta th
      WHERE a.tag = 'purchase' AND a.h < th.theta
        AND NOT EXISTS (
          SELECT 1 FROM sketch b WHERE b.tag = 'error' AND b.h = a.h
        )
    ),
    exact AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_difference
      FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
           p
      WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT DISTINCT user_id FROM events
                       WHERE event_type = 'error') e
        WHERE e.user_id = p.user_id)
    )
    SELECT CAST(8 AS BIGINT) AS k, th.theta, o.n_only,
           CAST((o.n_only * 4294967296) // th.theta AS BIGINT)
             AS est_difference,
           x.exact_difference
    FROM theta th CROSS JOIN only_a o CROSS JOIN exact x
    """,
)
def kmv_difference_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set DIFFERENCE (A \\ B), completing the sketch set
    algebra next to kmv_union_distinct / kmv_intersection_estimate:
    how many users purchased but never errored, estimated from the two
    k=8 sketches alone.  Below theta (the smaller of the two k-th
    minima) both sketches retain EVERY hash they ever saw, so the
    purchase-side retained hashes absent from the error sketch are an
    unbiased theta/2^32-rate sample of the true difference: est =
    n_only * 2^32 DIV theta (the DataSketches a-not-b operation).
    Difference is the sketch op dedup pipelines run for "how many docs
    are in crawl A but not crawl B" without touching raw keys.

    Deterministic end-to-end (portable md5 hashes, integer ranks, one
    floor division) and oracle-checked; exact difference rides along as
    the self-audit column.  One events scan feeds the tagged distinct
    (checkpointed); every frame past the sketch build is <= k rows, the
    anti lookup is a broadcast against an 8-row side.
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .select(
            F.col("event_type").alias("tag"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
            "user_id",
        )
        .localCheckpoint(eager=True)  # sketch build + exact-audit consumers
    )
    sketch = (
        hashed.select("tag", "h")
        .distinct()
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("tag").orderBy("h"))
        )
        .filter(F.col("rn") <= 8)
        .select("tag", "h")
        .localCheckpoint(eager=True)  # theta + both difference legs
    )
    theta = (
        sketch.groupBy("tag")
        .agg(F.max("h").alias("mx"))
        .agg(F.min("mx").cast("bigint").alias("theta"))
    )
    a = sketch.filter(F.col("tag") == "purchase").select(F.col("h").alias("ha"))
    b = sketch.filter(F.col("tag") == "error").select(F.col("h").alias("hb"))
    only_a = (
        a.join(F.broadcast(b), F.col("ha") == F.col("hb"), "left_anti")
        .crossJoin(F.broadcast(theta))
        .filter(F.col("ha") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_only"))
    )
    pu = hashed.filter(F.col("tag") == "purchase").select("user_id").distinct()
    er = hashed.filter(F.col("tag") == "error").select("user_id").distinct()
    exact = (
        pu.join(er.hint("shuffle_hash"), "user_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_difference"))
    )
    return (
        F.broadcast(theta)
        .crossJoin(F.broadcast(only_a))
        .crossJoin(F.broadcast(exact))
        .select(
            F.lit(8).cast("bigint").alias("k"),
            "theta",
            "n_only",
            F.expr(
                "CAST((n_only * 4294967296) DIV theta AS BIGINT)"
            ).alias("est_difference"),
            "exact_difference",
        )
    )


@declared(
    "cms_error_profile",
    oracle=f"""
    WITH cells AS (
      SELECT j.j AS row_id,
             ('0x' || substring(md5(CAST(j.j AS VARCHAR) || '_' ||
                                    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % {CMS_CELLS} AS cell,
             CAST(count(*) AS BIGINT) AS c
      FROM events, unnest(generate_series(0, {CMS_ROWS - 1})) AS j(j)
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
      FROM events GROUP BY user_id
    ),
    est AS (
      SELECT e.user_id, e.exact_count,
             CAST(min(cl.c) AS BIGINT) AS est_count
      FROM exact e
      JOIN cells cl
        ON cl.cell = ('0x' || substring(md5(CAST(cl.row_id AS VARCHAR) || '_'
                                        || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT
                     % {CMS_CELLS}
      GROUP BY e.user_id, e.exact_count
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(est_count - exact_count) AS BIGINT) AS max_overestimate,
           CAST((1000000 * sum(est_count - exact_count))
                // sum(exact_count) AS BIGINT) AS rel_err_ppm,
           CAST((1000000 * sum(CASE WHEN est_count = exact_count
                                    THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS exact_share_ppm,
           CAST(min(est_count - exact_count) AS BIGINT) >= 0
             AS one_sided
    FROM est
    """,
)
def cms_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch accuracy certification over EVERY key (the
    measurement discipline behind `cms_heavy_hitters`, which only
    surfaces the heavy tail): total relative overestimate in ppm, the
    worst per-key overestimate, the share of keys estimated exactly,
    and the one-sided-error invariant (CMS never underestimates --
    min(est - exact) >= 0 by construction, here PROVEN over the data
    rather than asserted).  This is the number that decides whether
    CMS_CELLS is sized right before trusting the sketch at 100 TB
    (expected overestimate ~ total_count/CELLS per row, min over ROWS).

    Same deterministic md5 sketch build as cms_heavy_hitters (one
    mergeable pass into CMS_ROWS x CMS_CELLS cells), then the
    estimate-vs-exact join rolled up to a single audit row --
    all-integer floor-divided ppm.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id")
    rows = spark.range(CMS_ROWS).select(F.col("id").cast("int").alias("row_id"))
    keyed = ev.crossJoin(F.broadcast(rows))
    cell = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "_",
                        F.col("row_id").cast("string"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CMS_CELLS
    )
    cells = (
        keyed.select("row_id", cell.alias("cell"))
        .groupBy("row_id", "cell")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    exact = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    probe = exact.crossJoin(F.broadcast(rows)).select(
        "user_id", "exact_count", "row_id", cell.alias("cell")
    )
    est = (
        probe.join(F.broadcast(cells), ["row_id", "cell"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )
    err = F.col("est_count") - F.col("exact_count")
    return est.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max(err).cast("bigint").alias("max_overestimate"),
        F.expr(
            "CAST((1000000 * sum(est_count - exact_count))"
            " DIV sum(exact_count) AS BIGINT)"
        ).alias("rel_err_ppm"),
        F.expr(
            "CAST((1000000 * sum(CASE WHEN est_count = exact_count"
            "                         THEN 1 ELSE 0 END))"
            " DIV count(*) AS BIGINT)"
        ).alias("exact_share_ppm"),
        (F.min(err) >= 0).alias("one_sided"),
    )


HDR_SUBS = 16  # linear sub-buckets per power-of-2 octave (rel err <= 1/16)
HDR_QS = [500000, 900000, 990000]  # target quantiles, ppm


def hdr_bucket_expr(v: str = "v") -> str:
    """Spark-SQL expr for the log-linear bucket id of a POSITIVE bigint
    column ``v``: octave = bitlen-1, then 16 linear sub-buckets -- the
    deterministic grid hdr_quantile_sketch and its merge-identity test
    (tests/test_round5_ops.py) share."""
    p = f"(CAST(1 AS BIGINT) << (length(bin({v})) - 1))"
    return (
        f"(length(bin({v})) - 1) * {HDR_SUBS}"
        f" + (({v} - {p}) * {HDR_SUBS}) DIV {p}"
    )


@declared(
    "hdr_quantile_sketch",
    oracle=f"""
    WITH vals AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    bk AS (
      SELECT v, l_orderkey, l_linenumber,
             (length(bin(v)) - 1) * {HDR_SUBS}
             + ((v - (CAST(1 AS BIGINT) << (length(bin(v)) - 1)))
                * {HDR_SUBS}) // (CAST(1 AS BIGINT) << (length(bin(v)) - 1))
               AS bucket
      FROM vals
    ),
    hist AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM bk GROUP BY bucket
    ),
    cum AS (
      SELECT bucket, cnt,
             CAST(sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cum
      FROM hist
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    qs AS (SELECT unnest([{", ".join(str(q) for q in HDR_QS)}]) AS q_ppm),
    tgt AS (
      SELECT q_ppm, (q_ppm * n.n + 999999) // 1000000 AS target, n.n
      FROM qs CROSS JOIN n
    ),
    pick AS (
      SELECT q_ppm, target, n, bucket, cum - cnt AS below FROM (
        SELECT t.q_ppm, t.target, t.n, c.bucket, c.cnt, c.cum,
               row_number() OVER (PARTITION BY t.q_ppm ORDER BY c.bucket)
                 AS rk
        FROM tgt t JOIN cum c ON c.cum >= t.target
      ) WHERE rk = 1
    ),
    est AS (
      SELECT q_ppm, target, n, bucket, below,
             (CAST(1 AS BIGINT) << (bucket // {HDR_SUBS}))
             + ((bucket % {HDR_SUBS})
                * (CAST(1 AS BIGINT) << (bucket // {HDR_SUBS})))
               // {HDR_SUBS} AS est_lo_c
      FROM pick
    ),
    refined AS (
      SELECT e.q_ppm, r.v AS exact_c
      FROM est e
      JOIN (
        SELECT p.q_ppm, b.v,
               row_number() OVER (PARTITION BY p.q_ppm
                                  ORDER BY b.v, b.l_orderkey, b.l_linenumber)
                 AS rn
        FROM bk b JOIN pick p ON b.bucket = p.bucket
      ) r ON r.q_ppm = e.q_ppm AND r.rn = e.target - e.below
    )
    SELECT e.q_ppm, e.n AS n_total, e.target AS target_rank,
           e.bucket AS bucket_id, e.est_lo_c, f.exact_c
    FROM est e JOIN refined f ON f.q_ppm = e.q_ppm
    ORDER BY e.q_ppm
    """,
)
def hdr_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch: an HDR-histogram-style
    log-linear bucket summary (powers of 2 split into 16 linear
    sub-buckets -- bounded ~6.25% relative error) over extended price
    cents, read out at p50/p90/p99, with the EXACT value recovered by a
    rank-refine inside the picked bucket (the two_pass_exact_median
    machinery, profiling.py:3249, with data-adaptive equi-width bins
    swapped for the fixed log-linear grid).

    THE oracle-checkable scale path for the percentile family (VERDICT
    round-4 task: GK/KLL-style): unlike approx_percentile (rows-only --
    engine sketch internals differ), every piece here is a pure integer
    function of the data -- bucket = (bitlen-1)*16 + ((v - 2^(bitlen-1))
    *16 DIV 2^(bitlen-1)) -- so Spark and DuckDB hash-match bit-for-bit.
    Mergeability is count addition per FIXED bucket id (no data-dependent
    boundaries to reconcile, the flaw that makes GK merges order-
    sensitive): shard sketches union by summing counts, pinned by
    tests/test_round5_ops.py's merge-identity test.  At 100 TB the
    histogram is one map-side-combinable groupBy over ~1.5k possible
    buckets; the refine pass touches only the ~n/128 rows of the picked
    buckets (exactness audit -- production reads est_lo_c and skips
    pass 2).
    """
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
        "l_orderkey",
        "l_linenumber",
    ).localCheckpoint(eager=True)  # histogram + refine share one scan
    bk = vals.select(
        "v",
        "l_orderkey",
        "l_linenumber",
        F.expr(hdr_bucket_expr("v")).alias("bucket"),
    )
    hist = bk.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(wc).cast("bigint"))
    n = vals.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in HDR_QS])).alias("q_ppm")
    )
    tgt = qs.crossJoin(F.broadcast(n)).select(
        "q_ppm", F.expr("(q_ppm * n + 999999) DIV 1000000").alias("target"), "n"
    )
    wp = Window.partitionBy("q_ppm").orderBy("bucket")
    pick = (
        F.broadcast(tgt)
        .join(cum, F.col("cum") >= F.col("target"))
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select(
            "q_ppm", "target", "n", "bucket",
            (F.col("cum") - F.col("cnt")).alias("below"),
        )
        .localCheckpoint(eager=True)  # feeds est AND the refine join
    )
    est = pick.select(
        "q_ppm",
        "target",
        "n",
        "bucket",
        "below",
        F.expr(
            f"(CAST(1 AS BIGINT) << (bucket DIV {HDR_SUBS}))"
            f" + ((bucket % {HDR_SUBS})"
            f" * (CAST(1 AS BIGINT) << (bucket DIV {HDR_SUBS})))"
            f" DIV {HDR_SUBS}"
        ).alias("est_lo_c"),
    )
    wr = Window.partitionBy("q_ppm").orderBy("v", "l_orderkey", "l_linenumber")
    refined = (
        bk.join(
            F.broadcast(pick.select("q_ppm", "bucket", "target", "below")),
            "bucket",
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == F.col("target") - F.col("below"))
        .select("q_ppm", F.col("v").alias("exact_c"))
    )
    return (
        est.join(F.broadcast(refined), "q_ppm")
        .select(
            "q_ppm",
            F.col("n").alias("n_total"),
            F.col("target").alias("target_rank"),
            F.col("bucket").alias("bucket_id"),
            "est_lo_c",
            "exact_c",
        )
    )


@declared(
    "hdr_group_quantiles",
    oracle=f"""
    WITH vals AS (
      SELECT l_returnflag AS grp,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem
    ),
    hist AS (
      SELECT grp,
             (length(bin(v)) - 1) * {HDR_SUBS}
             + ((v - (CAST(1 AS BIGINT) << (length(bin(v)) - 1)))
                * {HDR_SUBS}) // (CAST(1 AS BIGINT) << (length(bin(v)) - 1))
               AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM vals GROUP BY grp, bucket
    ),
    cum AS (
      SELECT grp, bucket, cnt,
             CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY bucket
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM hist
    ),
    qs AS (SELECT CAST(unnest([500000, 950000]) AS BIGINT) AS q_ppm),
    pick AS (
      SELECT grp, q_ppm, n, target, bucket FROM (
        SELECT c.grp, q.q_ppm, c.n,
               (q.q_ppm * c.n + 999999) // 1000000 AS target,
               c.bucket,
               row_number() OVER (PARTITION BY c.grp, q.q_ppm
                                  ORDER BY c.bucket) AS rk
        FROM cum c CROSS JOIN qs q
        WHERE c.cum >= (q.q_ppm * c.n + 999999) // 1000000
      ) WHERE rk = 1
    )
    SELECT grp, q_ppm, n AS n_group, target AS target_rank,
           bucket AS bucket_id,
           (CAST(1 AS BIGINT) << (bucket // {HDR_SUBS}))
           + ((bucket % {HDR_SUBS})
              * (CAST(1 AS BIGINT) << (bucket // {HDR_SUBS})))
             // {HDR_SUBS} AS est_c
    FROM pick
    """,
)
def hdr_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quantiles (p50/p95 of extended price per return flag)
    read straight off the log-linear sketch grid -- the GROUPED
    deployment of hdr_quantile_sketch: one map-side-combinable
    groupBy(grp, bucket) histogram is the only pass over the data, then
    all quantiles for all groups come from the tiny (groups x ~120
    buckets) summary.  This is the shape that replaces a per-group sort
    at 100 TB: percentile_cont over a window re-sorts every group;
    this shuffles counts only.  Estimates carry the grid's <= 1/16
    relative error (bucket lower bound, exactly as the ungrouped
    sketch); the refine pass is deliberately omitted -- the grouped
    read IS the production fast path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    vals = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
    )
    hist = vals.groupBy(
        "grp", F.expr(hdr_bucket_expr("v")).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wg = Window.partitionBy("grp").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "grp",
        "bucket",
        "cnt",
        F.sum("cnt").over(wg).cast("bigint").alias("cum"),
        F.sum("cnt").over(Window.partitionBy("grp")).cast("bigint").alias("n"),
    )
    qs = spark.range(1).select(
        F.explode(
            F.array(F.lit(500000).cast("bigint"), F.lit(950000).cast("bigint"))
        ).alias("q_ppm")
    )
    wp = Window.partitionBy("grp", "q_ppm").orderBy("bucket")
    return (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("target", F.expr("(q_ppm * n + 999999) DIV 1000000"))
        .filter(F.col("cum") >= F.col("target"))
        .withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select(
            "grp",
            "q_ppm",
            F.col("n").alias("n_group"),
            F.col("target").alias("target_rank"),
            F.col("bucket").alias("bucket_id"),
            F.expr(
                f"(CAST(1 AS BIGINT) << (bucket DIV {HDR_SUBS}))"
                f" + ((bucket % {HDR_SUBS})"
                f" * (CAST(1 AS BIGINT) << (bucket DIV {HDR_SUBS})))"
                f" DIV {HDR_SUBS}"
            ).alias("est_c"),
        )
    )


ROLL_WIN_DAYS = 7


@declared(
    "rolling_7d_distinct_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    spine AS MATERIALIZED (
      SELECT DISTINCT day FROM ud
    ),
    fanned AS (
      SELECT user_id, src_day, t.tgt
      FROM (
        SELECT user_id, day AS src_day,
               list_transform(generate_series(0, {ROLL_WIN_DAYS - 1}),
                              i -> day + CAST(i AS INTEGER)) AS tgts
        FROM ud
      ), unnest(tgts) AS t(tgt)
    ),
    hits AS (
      SELECT f.tgt AS day, f.user_id, f.src_day
      FROM fanned f JOIN spine s ON s.day = f.tgt
    )
    SELECT day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS rolling_dau,
           CAST(count(DISTINCT src_day) AS BIGINT) AS days_in_window
    FROM hits GROUP BY day
    """,
)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact {ROLL_WIN_DAYS}-day rolling distinct users per day -- the
    metric every growth dashboard calls WAU.  Distinct does NOT
    decompose over windows (yesterday's rolling count tells you nothing
    about today's), so the exact form fans each (user, day) activity
    pair out to the {ROLL_WIN_DAYS} window endpoints it supports and
    re-deduplicates per target day: a {ROLL_WIN_DAYS}x write
    amplification of the (user, day) PAIRS (already << raw events),
    which is the honest cost of exactness -- the sketch twin
    `rolling_7d_hll_distinct` shows what register-merge buys instead.
    Early days aggregate partial windows; `days_in_window` reports the
    coverage.

    Shape: one events scan -> (user, day) dedup shuffle ->
    constant-bounded explode -> per-day distinct rollup.  The spine
    semi-join keeps only real calendar days.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct().localCheckpoint(eager=True)  # spine + fan-out consumers
    spine = ud.select("day").distinct()
    fanned = ud.select(
        "user_id",
        F.col("day").alias("src_day"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {ROLL_WIN_DAYS - 1}),"
                " i -> date_add(day, i))"
            )
        ).alias("tgt"),
    )
    hits = fanned.join(
        F.broadcast(spine.select(F.col("day").alias("tgt"))), "tgt"
    )
    return hits.groupBy(F.col("tgt").alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("rolling_dau"),
        F.count_distinct("src_day").cast("bigint").alias("days_in_window"),
    )


@declared(
    "rolling_7d_hll_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 12))::BIGINT
               AS h
      FROM events
    ),
    regs AS MATERIALIZED (
      SELECT day, h % {HLL_M} AS bucket,
             CAST(max({_hll_rank_sql(f'(h // {HLL_M})')}) AS BIGINT) AS mx
      FROM hashed GROUP BY 1, 2
    ),
    spine AS MATERIALIZED (SELECT DISTINCT day FROM regs),
    fanned AS (
      SELECT bucket, mx, t.tgt
      FROM (
        SELECT bucket, mx,
               list_transform(generate_series(0, {ROLL_WIN_DAYS - 1}),
                              i -> day + CAST(i AS INTEGER)) AS tgts
        FROM regs
      ), unnest(tgts) AS t(tgt)
    ),
    merged AS (
      SELECT f.tgt AS day, f.bucket, CAST(max(f.mx) AS BIGINT) AS mx
      FROM fanned f JOIN spine s ON s.day = f.tgt
      GROUP BY f.tgt, f.bucket
    ),
    zsum AS (
      SELECT day,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_RANK_W + 1} - mx))
                  AS BIGINT)
             + ({HLL_M} - count(*))
               * (CAST(1 AS BIGINT) << {HLL_RANK_W + 1}) AS z,
             CAST(count(*) AS BIGINT) AS used
      FROM merged GROUP BY day
    ),
    exact AS (
      SELECT f.tgt AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_wau
      FROM (
        SELECT user_id,
               list_transform(generate_series(0, {ROLL_WIN_DAYS - 1}),
                              i -> day + CAST(i AS INTEGER)) AS tgts
        FROM (SELECT DISTINCT user_id,
                     CAST(date_trunc('day', ts) AS DATE) AS day
              FROM events)
      ), unnest(tgts) AS f(tgt)
      JOIN spine s ON s.day = f.tgt
      GROUP BY f.tgt
    )
    SELECT z.day, z.used AS n_buckets_used,
           CAST(floor({HLL_ALPHA_PPM}e0
                 * ((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) // z.z)
                 / 1000000e0) AS BIGINT) AS est_wau,
           e.exact_wau,
           CAST((1000000 * abs(CAST(floor({HLL_ALPHA_PPM}e0
                 * ((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) // z.z)
                 / 1000000e0) AS BIGINT) - e.exact_wau))
                // e.exact_wau AS BIGINT) AS rel_err_ppm
    FROM zsum z JOIN exact e ON e.day = z.day
    """,
)
def rolling_7d_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{ROLL_WIN_DAYS}-day rolling distinct users from MERGED daily HLL
    registers: the per-day (bucket, max-rank) registers of
    `hll_custom_distinct_daily` fan out to the {ROLL_WIN_DAYS} windows
    they belong to and merge by register MAX -- the mergeability exact
    distinct fundamentally lacks (the exact twin
    `rolling_7d_distinct_users` must re-deduplicate every (user, day)
    pair per window; this touches {HLL_M} register rows per day
    regardless of traffic).  THE canonical sketch win at 100 TB:
    sliding-window distincts over billions of users become a window
    max over m x |days| rows.  Emits the exact answer and the relative
    error per day so the accuracy cost is measured, not asserted.

    Same deterministic HLL shape as the daily op (48-bit md5, m =
    {HLL_M}, integer-scaled harmonic sum, alpha ppm floor).
    """
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
        )
        .cast("bigint")
        .alias("h"),
    ).distinct()
    regs = hashed.select(
        "day",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(_hll_rank_sql(f"(h DIV {HLL_M})")).alias("rank"),
    ).groupBy("day", "bucket").agg(
        F.max("rank").cast("bigint").alias("mx")
    ).localCheckpoint(eager=True)  # spine + fan-out consumers
    spine = regs.select("day").distinct()
    fan = F.expr(
        f"transform(sequence(0, {ROLL_WIN_DAYS - 1}), i -> date_add(day, i))"
    )
    merged = (
        regs.select("bucket", "mx", F.explode(fan).alias("tgt"))
        .join(F.broadcast(spine.select(F.col("day").alias("tgt"))), "tgt")
        .groupBy(F.col("tgt").alias("day"), F.col("bucket"))
        .agg(F.max("mx").cast("bigint").alias("mx"))
    )
    zsum = merged.groupBy("day").agg(
        F.expr(
            f"CAST(sum(CAST(1 AS BIGINT) << ({HLL_RANK_W + 1} - mx))"
            f" AS BIGINT) + ({HLL_M} - count(*))"
            f" * (CAST(1 AS BIGINT) << {HLL_RANK_W + 1})"
        ).alias("z"),
        F.count(F.lit(1)).cast("bigint").alias("used"),
    )
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    exact = (
        ud.select("user_id", F.explode(fan).alias("tgt"))
        .join(F.broadcast(spine.select(F.col("day").alias("tgt"))), "tgt")
        .groupBy(F.col("tgt").alias("day"))
        .agg(F.count_distinct("user_id").cast("bigint").alias("exact_wau"))
    )
    est = (
        f"CAST(floor({HLL_ALPHA_PPM}e0"
        f" * ((CAST(1 AS BIGINT) << {12 + HLL_RANK_W + 1}) DIV z)"
        " / 1000000e0) AS BIGINT)"
    )
    return (
        zsum.join(exact, "day")
        .select(
            "day",
            F.col("used").alias("n_buckets_used"),
            F.expr(est).alias("est_wau"),
            "exact_wau",
            F.expr(
                f"CAST((1000000 * abs({est} - exact_wau))"
                " DIV exact_wau AS BIGINT)"
            ).alias("rel_err_ppm"),
        )
    )
