"""Window frame-spec coverage: RANGE frames, lead/lag, date-part rollups,
fuzzy token matching.

Reference basis: the crosshair delta walks previous/current hover state
(lag pattern, etl_controller.py:1839-1906); the deferred-verify window is
a time-range lookback (:2446-2448).  These declare the remaining window
frame specs (RANGE vs ROWS), navigation functions, calendar extraction,
and an edit-distance fuzzy matcher for the text pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.conventions import (
    exact_sum,
    exact_sum_sql,
    int_round_scaled,
)
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           (((((sum(CAST(round(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           )) + 50) - ((sum(CAST(round(value * 10000) AS BIGINT)) OVER (
             PARTITION BY user_id
             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           )) + 50) % 100) / 100) / 100.0) AS hour_sum
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per-key trailing-hour sum -- the windowed dual of the
    interval join (same lookback semantics, one window instead of a join).

    RANGE frames need a numeric order key; epoch seconds make the frame
    '3600 preceding' literal on both engines.  Equal-timestamp rows share
    a frame (RANGE, not ROWS) -- that is the spec difference this query
    pins.
    """
    events = load_table(spark, sf_dir, "events")
    epoch = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3600, Window.currentRow)
    )
    running = F.sum(F.round(F.col("value") * 10000).cast("bigint")).over(w)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        int_round_scaled(running, 2).alias("hour_sum"),
    )


@declared(
    "window_lead_lag",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           CAST(floor(epoch(ts)) AS BIGINT)
             - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation functions: previous/next event + inter-arrival seconds
    (the crosshair prev/current delta, etl_controller.py:1839-1906).
    Boundary rows yield NULLs on both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)).alias(
            "secs_since_prev"
        ),
    )


@declared(
    "orders_month_summary",
    oracle=f"""
    SELECT CAST(extract(year FROM o_orderdate) AS INT) AS order_year,
           CAST(extract(month FROM o_orderdate) AS INT) AS order_month,
           count(*) AS n_orders,
           {exact_sum_sql('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY extract(year FROM o_orderdate), extract(month FROM o_orderdate)
    """,
)
def orders_month_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction + grouped rollup (timestamp formatting F9
    generalized).  year/month extraction is identical across engines
    (day-of-week is NOT -- Spark counts Sunday=1, DuckDB Sunday=0 -- so
    dow is deliberately not declared)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum(F.col("o_totalprice")).alias("sum_price"),
    )


@declared(
    "token_edit_distance_pairs",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT t.token
      FROM documents, unnest(string_split(trim(text), ' ')) AS t(token)
      WHERE t.token <> ''
    )
    SELECT a.token AS tok_a, b.token AS tok_b,
           levenshtein(a.token, b.token) AS dist
    FROM toks a JOIN toks b ON a.token < b.token
    WHERE levenshtein(a.token, b.token) <= 2
    """,
)
def token_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy vocabulary matching: token pairs within edit distance 2 (the
    typo-merge pass of a text pipeline).  The distinct vocabulary is tiny
    relative to the corpus, so the pair join runs on the deduped token dim
    -- never on raw tokens.  Levenshtein is definitionally identical in
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    a = toks.select(F.col("token").alias("tok_a"))
    b = toks.select(F.col("token").alias("tok_b"))
    return (
        a.join(b, F.col("tok_a") < F.col("tok_b"))
        .withColumn("dist", F.levenshtein("tok_a", "tok_b"))
        .filter(F.col("dist") <= 2)
    )


@declared(
    "daily_event_series_dense",
    oracle="""
    WITH bounds AS (
      SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
      FROM events
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT s.day, coalesce(d.n_events, 0) AS n_events
    FROM spine s LEFT JOIN daily d ON d.day = s.day
    """,
)
def daily_event_series_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification: one row per day between the corpus min and
    max event dates, zero-filled where no events landed -- the gap-free
    spine every time-series model and dashboard needs before windowing.

    The spine is sequence(min, max) exploded from a 1-ROW aggregate (two
    scalar values -- never a driver-side date loop); the bounds aggregate
    runs over the |days|-row DAILY result, not the raw fact.  The daily
    aggregate feeds BOTH the bounds and the join probe, and column
    pruning diverges the two subtrees (no ReusedExchange), so it is
    localCheckpointed -- |days| tiny rows materialized once, fact
    scanned once.  Its result broadcasts onto the spine (the preserved
    side of a left join cannot be the broadcast build side, so the hint
    goes on the aggregate).
    """
    ev = load_table(spark, sf_dir, "events").select(F.col("ts").cast("date").alias("day"))
    daily = (
        ev.groupBy("day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    return spine.join(F.broadcast(daily), "day", "left").select(
        "day", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
