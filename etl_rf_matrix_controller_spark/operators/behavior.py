"""Event-behavior analytics: funnel progression and cohort retention.

The telemetry staples over an event stream: how far users get through an
ordered step sequence, and how cohorts (grouped by first-seen day) keep
coming back.  Reference basis: the poll loop's state timeline
(`etl_controller.py:576-613`) is an event stream keyed by device; these
generalize its "when did X first happen / did Y follow" bookkeeping to
per-user event analytics.

Scale design: every stage is a groupBy/join on `user_id` -- one uniform
integer shuffle key end to end, so each step reuses the same hash
partitioning (Catalyst elides redundant exchanges between the per-user
aggregations and the subsequent joins).  Counts and day offsets are
integer-exact; timestamps pass through untouched (microsecond parity via
sources.tables.load_table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.conventions import (
    SCALE,
    int_round_scaled,
    int_round_scaled_sql,
    ratio4,
    ratio4_sql,
)
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Ordered funnel: each later stage must happen strictly AFTER the earlier.
FUNNEL_STEPS = ("signup", "click", "purchase")


@declared(
    "funnel_stages",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_signup
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_signup
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
           CAST(1 + CAST(s2.user_id IS NOT NULL AS INT)
                  + CAST(s3.user_id IS NOT NULL AS INT)
                AS BIGINT) AS stage_reached
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    """,
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup -> click -> purchase: first qualifying
    timestamp per stage, each strictly after the previous stage's.

    ONE scan of events and ONE shuffle on user_id: each stage is a
    CONDITIONAL window min over the user partition (min(ts WHERE type=k
    AND ts > prev stage)), three window passes sharing one partitioning,
    then a same-key groupBy collapses to one row per user.  Per-task
    state is a spillable window buffer -- never a collect_list row (a
    hot user with millions of events would OOM an in-row array; window
    buffers spill) and never the staged join tree of the oracle's CTE
    chain (which re-derives each stage's lineage: 6 event scans).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", "ts", "event_type")
    )
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")),
            F.col("ts"),
        )
    ).over(w)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    return (
        ev.withColumn("t_signup", t1)
        .withColumn("t_click", t2)
        .withColumn("t_purchase", t3)
        .filter(F.col("t_signup").isNotNull())
        .groupBy("user_id")
        .agg(
            F.max("t_signup").alias("t_signup"),
            F.max("t_click").alias("t_click"),
            F.max("t_purchase").alias("t_purchase"),
        )
        .select(
            "user_id",
            "t_signup",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            )
            .cast("bigint")
            .alias("stage_reached"),
        )
    )


@declared(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
      FROM events e JOIN first_seen f ON f.user_id = e.user_id
    )
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    on each of their first 7 active day-offsets.

    first-seen is a window min over the user partition -- ONE scan of
    events and ONE shuffle on user_id (the agg+join-back form scans and
    shuffles events twice); the distinct collapses (user, cohort, offset)
    BEFORE the final count, so the count shuffle carries at most
    users x 8 rows.  The offset <= 7 filter lands before the distinct --
    at 100 TB that's the difference between shuffling a week and
    shuffling all history.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    activity = (
        ev.withColumn("cohort_day", F.min(F.col("ts").cast("date")).over(w))
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .filter(F.col("day_offset") <= 7)
        .distinct()
    )
    return activity.groupBy(
        "cohort_day", F.col("day_offset").cast("bigint").alias("day_offset")
    ).agg(F.count(F.lit(1)).alias("n_active"))


@declared(
    "user_interevent_gap_stats",
    oracle="""
    WITH g AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(sum(gap) AS BIGINT) AS total_gap_secs,
           CAST(max(gap) AS BIGINT) AS max_gap_secs
    FROM g WHERE gap IS NOT NULL
    GROUP BY user_id
    """,
)
def user_interevent_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event cadence: count/total/max of the gaps (whole
    seconds) between consecutive events -- the activity-rhythm feature a
    bot-detection or engagement model consumes.

    lag() over (user, ts, event_id) computes gaps in event order -- ONE
    scan, ONE shuffle on user_id, then the per-user stats ride the same
    key (no second exchange).  Seconds are FLOORED epoch values on both
    sides (Spark's long cast floors; DuckDB's epoch() is fractional --
    the repo's documented divergence trap); equal-ts ties break on
    event_id, and a zero gap is deterministic whichever order ties land.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = F.col("ts").cast("long")
    return (
        ev.withColumn("gap", secs - F.lag(secs).over(w))
        .filter(F.col("gap").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap").alias("total_gap_secs"),
            F.max("gap").alias("max_gap_secs"),
        )
    )


@declared(
    "orders_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey AS cust_key,
             date_diff('day', CAST(max(o_orderdate) AS DATE),
                       DATE '1998-08-01') AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             sum(CAST(round(o_totalprice * {SCALE}) AS BIGINT)) AS monetary_s
      FROM orders
      WHERE o_orderdate < TIMESTAMP '1998-08-01'
      GROUP BY o_custkey
    )
    SELECT cust_key, CAST(recency_days AS BIGINT) AS recency_days,
           frequency,
           {int_round_scaled_sql("monetary_s")}
             AS monetary,
           CASE WHEN recency_days <= 180 AND frequency >= 12
                  THEN 'champion'
                WHEN frequency >= 8 THEN 'loyal'
                WHEN recency_days > 365 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM rfm
    """,
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order, from a
    fixed as-of date), frequency (order count), monetary (exact total
    spend), bucketed by integer threshold rules -- the marketing staple
    over any orders fact.

    One shuffle on o_custkey; recency/frequency are pure integers and the
    CASE thresholds compare integers only, so segment assignment cannot
    diverge cross-engine; monetary is the scaled-integer sum rounded in
    integer space.  The as-of date is pinned (reproducible), not now().
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-08-01"))
    )
    rfm = orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.datediff(
            F.to_date(F.lit("1998-08-01")), F.max(F.col("o_orderdate").cast("date"))
        )
        .cast("bigint")
        .alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * SCALE).cast("bigint")).alias(
            "monetary_s"
        ),
    )
    return rfm.select(
        "cust_key",
        "recency_days",
        "frequency",
        int_round_scaled(F.col("monetary_s")).alias("monetary"),
        F.when(
            (F.col("recency_days") <= 180) & (F.col("frequency") >= 12), "champion"
        )
        .when(F.col("frequency") >= 8, "loyal")
        .when(F.col("recency_days") > 365, "at_risk")
        .otherwise("regular")
        .alias("segment"),
    )


@declared(
    "weekday_activity_bitmask",
    oracle="""
    SELECT user_id,
           CAST(bit_or(1 << dayofweek(ts)) AS BIGINT) AS dow_mask,
           CAST(bit_count(CAST(bit_or(1 << dayofweek(ts)) AS BIGINT))
                AS BIGINT) AS n_active_dows,
           (bit_or(1 << dayofweek(ts)) & 65) <> 0 AS weekend_active
    FROM events
    GROUP BY user_id
    """,
)
def weekday_activity_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user day-of-week presence as a 7-bit mask (bit 0 = Sunday):
    bit_or fold + popcount + a weekend-bit test -- compact set-membership
    aggregation, the bitmap trick behind segment filters and calendar
    heatmaps.

    One shuffle on user_id; bit_or is map-side combinable and the mask is
    integer-exact.  Day-of-week parity trap pinned: Spark dayofweek() is
    1-based (Sunday=1), DuckDB's 0-based (Sunday=0) -- the Spark side
    shifts by dayofweek-1.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    # F.shiftleft only takes a literal bit count; the SQL form accepts a
    # column expression.
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), dayofweek(ts) - 1)")
    mask = F.bit_or(bit)
    return ev.groupBy("user_id").agg(
        mask.cast("bigint").alias("dow_mask"),
        F.bit_count(mask).cast("bigint").alias("n_active_dows"),
        (mask.bitwiseAND(F.lit(65)) != 0).alias("weekend_active"),
    )


@declared(
    "monetary_decile_lift",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey AS cust_key,
             sum(CAST(round(o_totalprice * {SCALE}) AS BIGINT)) AS monetary_s
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT cust_key, monetary_s,
             ntile(10) OVER (ORDER BY monetary_s DESC, cust_key) AS decile
      FROM per_cust
    ),
    per_decile AS (
      SELECT CAST(decile AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_custs,
             CAST(sum(monetary_s) AS BIGINT) AS decile_s
      FROM tiled GROUP BY decile
    ),
    cum AS (
      SELECT decile, n_custs, decile_s,
             CAST(sum(decile_s) OVER (ORDER BY decile
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s,
             CAST(sum(decile_s) OVER () AS BIGINT) AS total_s
      FROM per_decile
    ),
    unitsd AS (
      SELECT decile, n_custs, decile_s,
             CAST((decile_s + 5000 - (decile_s + 5000) % 10000) / 10000
                  AS BIGINT) AS decile_u,
             CAST((cum_s + 5000 - (cum_s + 5000) % 10000) / 10000
                  AS BIGINT) AS cum_u,
             CAST((total_s + 5000 - (total_s + 5000) % 10000) / 10000
                  AS BIGINT) AS total_u
      FROM cum
    )
    SELECT decile, n_custs,
           {int_round_scaled_sql("decile_s")} AS decile_revenue,
           {{RATIO_SHARE}} AS revenue_share,
           {{RATIO_CUM}} AS cum_share
    FROM unitsd
    """.replace("{RATIO_SHARE}", ratio4_sql("decile_u", "total_u")).replace(
        "{RATIO_CUM}", ratio4_sql("cum_u", "total_u")
    ),
)
def monetary_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table: customers ranked into spend deciles, each
    decile's revenue share and cumulative share -- the classic
    concentration ('top 10% drive X%') marketing readout.

    ntile and both share windows run over ALREADY-AGGREGATED sets (the
    per-customer rollup, then the 10-row decile table) -- the fact
    shuffles once on custkey and everything downstream is tiny.  All
    shares are integer-exact ratio4 over scaled sums; ntile ties are
    broken by unique cust_key so bucket assignment is deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.sum(F.round(F.col("o_totalprice") * SCALE).cast("bigint")).alias(
            "monetary_s"
        )
    )
    tiled = per_cust.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.desc("monetary_s"), F.asc("cust_key"))),
    )
    per_decile = tiled.groupBy(F.col("decile").cast("bigint").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_custs"),
        F.sum("monetary_s").alias("decile_s"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per_decile.select(
        "decile",
        "n_custs",
        "decile_s",
        F.sum("decile_s").over(wcum).alias("cum_s"),
        F.sum("decile_s").over(wall).alias("total_s"),
    )
    # Share ratios run on WHOLE currency units (half-up from the 4-dec
    # scale): the scaled totals (~2e14 at sf0.1) would blow ratio4's
    # 2*num*SCALE+den past the 2^53 envelope; whole units keep the
    # intermediates ~4e14 with no perceptible share precision loss.
    units = lambda c: F.expr(  # noqa: E731
        f"CAST(({c} + 5000 - ({c} + 5000) % 10000) / 10000 AS BIGINT)"
    )
    cum = cum.select(
        "decile",
        "n_custs",
        "decile_s",
        units("decile_s").alias("decile_u"),
        units("cum_s").alias("cum_u"),
        units("total_s").alias("total_u"),
    )
    return cum.select(
        "decile",
        "n_custs",
        int_round_scaled(F.col("decile_s")).alias("decile_revenue"),
        ratio4(F.col("decile_u"), F.col("total_u")).alias("revenue_share"),
        ratio4(F.col("cum_u"), F.col("total_u")).alias("cum_share"),
    )


@declared(
    "event_transition_counts",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, cur_type
    """,
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: counts of consecutive
    (prev -> cur) pairs per user timeline -- the Markov-chain summary a
    journey-analysis or anomaly model starts from.

    lag() over (user, ts, event_id) orders each user's timeline in one
    shuffle; the transition rollup groups on |types|^2 keys (tiny).
    Equal-ts ties break on event_id, so the chain -- and therefore the
    counts -- are deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("cur_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@declared(
    "open_orders_daily",
    oracle="""
    WITH deltas AS (
      SELECT CAST(o_orderdate AS DATE) AS day, 1 AS delta FROM orders
      UNION ALL
      SELECT CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, -1 FROM orders
    ),
    per_day AS (
      SELECT CAST(day AS DATE) AS day, CAST(sum(delta) AS BIGINT) AS net
      FROM deltas GROUP BY day
    )
    SELECT day, net,
           CAST(sum(net) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS n_open
    FROM per_day
    """,
)
def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog via sweep-line decomposition: each order
    contributes +1 at placement and -1 at its (fixed 30-day) close, the
    per-day net is aggregated, and a running sum rebuilds the concurrent
    count -- the interval-overlap counting pattern that avoids a
    quadratic interval self-join entirely.

    The fact is scanned for two narrow delta projections that union
    map-side (no shuffle for the union itself); the per-day aggregate is
    the only fact shuffle, and the cumulative window runs over the
    |days|-row series.  All values are integers.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("day")
    )
    deltas = orders.select("day", F.lit(1).alias("delta")).unionByName(
        orders.select(F.date_add("day", 30).alias("day"), F.lit(-1).alias("delta"))
    )
    per_day = deltas.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "net", F.sum("net").over(wcum).cast("bigint").alias("n_open")
    )


@declared(
    "dow_seasonality_lift",
    oracle=f"""
    WITH g AS (
      SELECT event_type, (dayofweek(ts) + 6) % 7 AS dow,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, (dayofweek(ts) + 6) % 7
    ),
    t AS (
      SELECT event_type, dow, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT)
               AS type_total,
             CAST(sum(cnt) OVER (PARTITION BY dow) AS BIGINT) AS dow_total,
             CAST(sum(cnt) OVER () AS BIGINT) AS total
      FROM g
    )
    SELECT event_type, dow, cnt,
           {ratio4_sql("cnt * total", "type_total * dow_total")} AS lift4
    FROM t
    """,
)
def dow_seasonality_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: observed share of a
    (type, weekday) cell over the share expected if type and weekday were
    independent -- lift = P(type, dow) / (P(type) * P(dow)), the same
    statistic as brand_affinity_lift applied to time-of-week seasonality.

    Monday=0 on both engines (Spark dayofweek is Sunday=1, DuckDB
    Sunday=0 -- the established parity shift from
    weekday_activity_bitmask).  One scan -> 35-row aggregate; all three
    marginals are window sums OVER THE AGGREGATED SET (never a second
    fact scan -- the round-1 ReusedExchange lesson); lift is integer
    ratio4.  cnt*total stays under the ratio4 envelope to ~sf1; past
    that, divide both shares by 10^k first.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", ((F.dayofweek("ts") + 5) % 7).alias("dow")
    )
    g = ev.groupBy("event_type", "dow").agg(F.count(F.lit(1)).alias("cnt"))
    t = g.select(
        "event_type",
        "dow",
        "cnt",
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("type_total"),
        F.sum("cnt").over(Window.partitionBy("dow")).alias("dow_total"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    return t.select(
        "event_type",
        "dow",
        "cnt",
        ratio4(
            F.col("cnt") * F.col("total"),
            F.col("type_total") * F.col("dow_total"),
        ).alias("lift4"),
    )


@declared(
    "user_session_stats",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, sec,
             CASE WHEN sec - lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) > 1800
               OR lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM ev
    ),
    sess AS (
      SELECT user_id, sec,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(sec) - min(sec) AS BIGINT) AS dur_s
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           {ratio4_sql("sum(dur_s)", "count(*)")} AS avg_dur_s4
    FROM per_sess GROUP BY user_id
    """,
)
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream on >30 min
    silence (gaps-and-islands: lag -> boundary flag -> running sum), then
    per-user session count, event count, and mean session duration.

    The batch twin of the streaming session_window operator
    (streaming/windows.py) -- same session semantics, expressed as
    windows so a backfill job and the live stream agree.  All three
    window steps and both aggregations partition by user_id: ONE shuffle
    total, every subsequent step reuses the partitioning.  Durations are
    integer epoch seconds (floor on both engines); the mean is integer
    ratio4.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec")
    )
    wo = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.select(
        "user_id",
        "sec",
        F.when(
            (F.col("sec") - F.lag("sec").over(wo) > 1800)
            | F.lag("sec").over(wo).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        F.col("event_id"),
    )
    sess = flagged.select(
        "user_id",
        "sec",
        F.sum("new_sess")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("sec") - F.min("sec")).cast("bigint").alias("dur_s"),
    )
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        ratio4(F.sum("dur_s"), F.count(F.lit(1))).alias("avg_dur_s4"),
    )


@declared(
    "user_session_stats_chunked",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, sec,
             CASE WHEN sec - lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) > 1800
               OR lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_sess
      FROM ev
    ),
    sess AS (
      SELECT user_id, sec,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(max(sec) - min(sec) AS BIGINT) AS dur_s
      FROM sess GROUP BY user_id, sess_id
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           {ratio4_sql("sum(dur_s)", "count(*)")} AS avg_dur_s4
    FROM per_sess GROUP BY user_id
    """,
)
def user_session_stats_chunked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Skew-proof sessionization: identical results to
    `user_session_stats` (the oracle IS the flat spelling) computed in
    TWO levels so no window partition ever holds one user's whole
    history -- the answer to the wall the round-8 skew decade
    documented (skew_sessions: a user with 10% of all events
    sessionizes in ONE partition; fine at 1M rows, fatal at 10B).

    Level 1 partitions by (user, UTC day chunk): local gaps-and-islands
    inside each bounded chunk -> per-session summaries (start, end,
    n_events).  Level 2 partitions by user over the SUMMARIES --
    session-scaled, not event-scaled -- and re-merges consecutive
    summaries whose boundary gap <= 1800 s (a chunk cut can split a
    true session; it can never create one: same-chunk neighbors are
    > 1800 s apart by construction, so the level-2 rule only heals the
    cuts).  Merged n_events = sum, duration = max(end) - min(start):
    associative, so the two-level fold equals the flat one exactly.
    Chunk summaries order strictly by start_sec per user (distinct
    chunks occupy disjoint sec ranges; in-chunk sessions are > 1800 s
    apart), so no tiebreak ambiguity survives to level 2.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec")
    )
    chunked = ev.withColumn("chunk", F.expr("sec DIV 86400"))
    w1 = Window.partitionBy("user_id", "chunk").orderBy("sec", "event_id")
    local = chunked.select(
        "user_id",
        "chunk",
        "sec",
        F.when(
            (F.col("sec") - F.lag("sec").over(w1) > 1800)
            | F.lag("sec").over(w1).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        "event_id",
    ).select(
        "user_id",
        "chunk",
        "sec",
        F.sum("new_sess")
        .over(w1.rowsBetween(Window.unboundedPreceding, 0))
        .alias("lsess"),
    )
    summaries = local.groupBy("user_id", "chunk", "lsess").agg(
        F.min("sec").cast("bigint").alias("start_sec"),
        F.max("sec").cast("bigint").alias("end_sec"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("start_sec")
    merged = (
        summaries.select(
            "user_id",
            "start_sec",
            "end_sec",
            "n_events",
            F.when(
                (
                    F.col("start_sec") - F.lag("end_sec").over(w2) > 1800
                )
                | F.lag("end_sec").over(w2).isNull(),
                1,
            )
            .otherwise(0)
            .alias("new_sess"),
        )
        .select(
            "user_id",
            "start_sec",
            "end_sec",
            "n_events",
            F.sum("new_sess")
            .over(w2.rowsBetween(Window.unboundedPreceding, 0))
            .alias("sess_id"),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            (F.max("end_sec") - F.min("start_sec"))
            .cast("bigint")
            .alias("dur_s"),
        )
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("n_events").cast("bigint").alias("n_events"),
        ratio4(F.sum("dur_s"), F.count(F.lit(1))).alias("avg_dur_s4"),
    )


@declared(
    "dod_largest_jump",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    lagged AS (
      SELECT event_type, day, cnt,
             lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev_cnt
      FROM daily
    )
    SELECT event_type, day, prev_cnt, cnt,
           CAST(cnt - prev_cnt AS BIGINT) AS jump
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type
        ORDER BY abs(cnt - prev_cnt) DESC, day) AS rk
      FROM lagged WHERE prev_cnt IS NOT NULL
    ) WHERE rk = 1
    """,
)
def dod_largest_jump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint probe: for each event type, the day with the largest
    absolute day-over-day volume jump -- the first-line telemetry alarm
    (mirrors the reference's availability-indicator transition watching,
    etl_controller.py:3119-3136, generalized to counts).

    Daily counts collapse the stream to days x types rows; lag + argmax
    are windows OVER THE AGGREGATE (tiny), partition-aligned with the
    groupBy so the three steps share one shuffle.  Deterministic argmax:
    ties broken by earliest day.  date_trunc is cast to DATE on both
    engines (Spark returns TIMESTAMP, DuckDB DATE -- the established
    parity trap).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "day", "cnt", F.lag("cnt").over(wo).alias("prev_cnt")
    ).filter(F.col("prev_cnt").isNotNull())
    wr = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cnt") - F.col("prev_cnt")).desc(), F.asc("day")
    )
    return (
        lagged.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "day",
            "prev_cnt",
            "cnt",
            (F.col("cnt") - F.col("prev_cnt")).cast("bigint").alias("jump"),
        )
    )


@declared(
    "ema_user_value",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
                       (acc, x) -> 0.3e0 * x + (1e0 - 0.3e0) * acc)
             AS ema_value
    FROM events GROUP BY user_id
    """,
)
def ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event values in (ts,
    event_id) order, alpha = 0.3 -- the classic smoothed-telemetry
    signal; the stateful-streaming twin (streaming/state.py::
    stream_ema_user_value) folds the same recurrence per micro-batch.

    A sequential float fold CAN be oracle-exact: both engines execute
    the identical left-to-right recurrence (collect ordered values, fold
    0.3e0*x + (1e0-0.3e0)*acc with double literals), so every
    intermediate is bit-identical and the result is emitted raw per the
    conventions (never rounded).  Scale: one shuffle on user_id;
    per-user arrays are bounded by per-key event counts (the same bound
    any per-key state op carries) -- for unbounded keys, the streaming
    twin IS the scale path, holding one scalar per key instead of the
    array.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("value").cast("double").alias("value")
    )
    grouped = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))).alias(
            "arr"
        ),
    )
    return grouped.select(
        "user_id",
        "n_events",
        F.expr(
            "aggregate(slice(arr, 2, size(arr) - 1), "
            "element_at(arr, 1).value, "
            "(acc, s) -> 0.3e0 * s.value + (1e0 - 0.3e0) * acc)"
        ).alias("ema_value"),
    )


@declared(
    "ema_user_value_chunked",
    oracle="""
    WITH RECURSIVE ev AS MATERIALIZED (
      SELECT user_id, ts, event_id, CAST(value AS DOUBLE) AS value,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS chunk
      FROM events
    ),
    summ AS MATERIALIZED (
      SELECT user_id, chunk,
             CAST(count(*) AS BIGINT) AS n_ev,
             list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> 0.3e0 * x + (1e0 - 0.3e0) * acc)
               AS v0,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                            list(value ORDER BY ts, event_id)),
               (acc, x) -> 0.3e0 * x + (1e0 - 0.3e0) * acc) AS v,
             list_reduce(
               list_prepend(CAST(1 AS DOUBLE),
                            list(value ORDER BY ts, event_id)),
               (acc, x) -> (1e0 - 0.3e0) * acc) AS w,
             row_number() OVER (PARTITION BY user_id ORDER BY chunk) AS rn
      FROM ev GROUP BY user_id, chunk
    ),
    nuser AS (
      SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_chunks
      FROM summ GROUP BY user_id
    ),
    fold(user_id, rn, acc) AS (
      SELECT user_id, rn, v0 FROM summ WHERE rn = 1
      UNION ALL
      SELECT f.user_id, s.rn, s.v + s.w * f.acc
      FROM fold f JOIN summ s
        ON s.user_id = f.user_id AND s.rn = f.rn + 1
    )
    SELECT n.user_id AS user_id, n.n_events, n.n_chunks,
           f.acc AS ema_value
    FROM nuser n JOIN fold f
      ON f.user_id = n.user_id AND f.rn = n.n_chunks
    """,
)
def ema_user_value_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-level EMA: the answer to the per-key
    sequential-fold wall that `user_session_stats_chunked` solved for
    sessionization -- `ema_user_value` materializes one user's WHOLE
    history as an in-row array, so a hot key (one user with 10% of all
    events) concentrates its entire fold in one task; fine at 1M rows,
    fatal at 10B.

    The EMA recurrence acc' = a*x + (1-a)*acc composes affinely: a run
    of m values maps acc -> W*acc + V with W = (1-a)^m and V the fold
    seeded from 0.  Level 1 folds each (user, UTC-day chunk)'s values
    into (v0, v, w) -- v0 is the EMA-convention fold seeded with the
    chunk's first value, used when the chunk is the user's first;
    level 2 folds the per-chunk summaries in chunk order:
    acc = v0_1, then acc = v_j + w_j * acc.  Equal to the flat EMA in
    real arithmetic; floating-point reassociation at chunk boundaries
    makes it a distinct declared result, so the ORACLE mirrors the
    chunk structure exactly (the sessionization precedent): identical
    '0.3e0' literals, v/w folds seeded by list_prepend(0)/(1) matching
    Spark's explicit aggregate seeds step for step, and the level-2
    fold as a recursive CTE (the holt_linear_daily_value pattern --
    list_reduce cannot take a seed of a different type than its
    elements).  w comes from m repeated multiplications, never pow():
    libm powers are not bit-portable across engines.

    Scale: level-1 arrays are bounded per (user, day) -- ingest-rate
    x 86400 s, not history length; level-2 state is calendar-bounded
    (one (v0, v, w) triple per active day).  Both levels partition by
    user_id(, chunk): two shuffles, the second over day-grain rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").cast("double").alias("value"),
        F.expr("CAST(ts AS LONG) DIV 86400").alias("chunk"),
    )
    per_chunk = ev.groupBy("user_id", "chunk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("arr"),
    )
    summ = per_chunk.select(
        "user_id",
        "chunk",
        "n_ev",
        F.expr("transform(arr, s -> s.value)").alias("lv"),
    ).select(
        "user_id",
        "chunk",
        "n_ev",
        F.expr(
            "aggregate(slice(lv, 2, size(lv) - 1), element_at(lv, 1), "
            "(acc, x) -> 0.3e0 * x + (1e0 - 0.3e0) * acc)"
        ).alias("v0"),
        F.expr(
            "aggregate(lv, CAST(0 AS DOUBLE), "
            "(acc, x) -> 0.3e0 * x + (1e0 - 0.3e0) * acc)"
        ).alias("v"),
        F.expr(
            "aggregate(lv, CAST(1 AS DOUBLE), "
            "(acc, x) -> (1e0 - 0.3e0) * acc)"
        ).alias("w"),
    )
    level2 = summ.groupBy("user_id").agg(
        F.sum("n_ev").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.array_sort(
            F.collect_list(F.struct("chunk", "v0", "v", "w"))
        ).alias("carr"),
    )
    return level2.select(
        "user_id",
        "n_events",
        "n_chunks",
        F.expr(
            "aggregate(slice(carr, 2, size(carr) - 1), "
            "element_at(carr, 1).v0, "
            "(acc, s) -> s.v + s.w * acc)"
        ).alias("ema_value"),
    )


@declared(
    "late_data_corrections",
    oracle="""
    WITH tagged AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type,
             event_id % 50 = 0 AS is_late
      FROM events
    ),
    agg AS (
      SELECT window_start, event_type,
             CAST(sum(CASE WHEN is_late THEN 0 ELSE 1 END) AS BIGINT)
               AS on_time_n,
             CAST(count(*) AS BIGINT) AS full_n
      FROM tagged GROUP BY window_start, event_type
    )
    SELECT window_start, event_type, on_time_n, full_n,
           full_n - on_time_n AS correction
    FROM agg
    WHERE full_n <> on_time_n
    """,
)
def late_data_corrections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda-architecture reconciliation: the batch backfill recomputes
    each hourly window INCLUDING late arrivals (simulated: every 50th
    event arrived after the watermark closed its window) and emits
    correction records only for windows whose counts changed -- the
    delta feed a serving layer applies on top of the streamed results.

    One pass, one shuffle: both the on-time and full counts fold into
    the same conditional aggregate, so reconciliation costs exactly one
    window recount, not two scans; the correction filter ships only
    changed windows downstream (sparse at any scale -- late data is the
    exception, not the rule).
    """
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.date_trunc("hour", "ts").alias("window_start"),
        "event_type",
        (F.col("event_id") % 50 == 0).alias("is_late"),
    )
    agg = tagged.groupBy("window_start", "event_type").agg(
        F.sum(F.when(F.col("is_late"), 0).otherwise(1))
        .cast("bigint")
        .alias("on_time_n"),
        F.count(F.lit(1)).cast("bigint").alias("full_n"),
    )
    return agg.filter(F.col("full_n") != F.col("on_time_n")).select(
        "window_start",
        "event_type",
        "on_time_n",
        "full_n",
        (F.col("full_n") - F.col("on_time_n")).alias("correction"),
    )


@declared(
    "value_trend_slope",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS xh,
             CAST(round(value * 100) AS BIGINT) AS yc
      FROM events
    ),
    centered AS (
      SELECT event_type, xh - (SELECT min(xh) FROM base) AS x, yc AS y
      FROM base
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM centered GROUP BY event_type
    )
    SELECT event_type, n,
           n * sxy - sx * sy AS slope_num,
           n * sxx - sx * sx AS slope_den,
           (n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx)
             AS slope_cents_per_hour
    FROM s
    """,
)
def value_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend: the slope of event value (cents) against time
    (hours), the drift/trend detector behind burn-rate and regression
    alerts.

    The classic overflow-and-float trap is defused by working in SMALL
    integer units end to end: x = hour offsets from the corpus minimum
    (centering keeps x^2 sums ~1e10, far from int64 limits where raw
    epoch-seconds squared overflow), y = value cents; every moment sum
    (n, Sx, Sy, Sxy, Sxx) is then an exact order-independent integer and
    the slope is ONE float division of two exact integers -- bit-stable
    cross-engine where a naive sum of double products is not.  One pass,
    one shuffle, slope formula n*Sxy - Sx*Sy over n*Sxx - Sx^2.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(unix_timestamp(ts) AS BIGINT) DIV 3600").alias("xh"),
        F.round(F.col("value") * 100).cast("bigint").alias("yc"),
    )
    minx = base.agg(F.min("xh").alias("min_xh"))
    centered = base.crossJoin(F.broadcast(minx)).select(
        "event_type", (F.col("xh") - F.col("min_xh")).alias("x"), F.col("yc").alias("y")
    )
    s = centered.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n",
        num.alias("slope_num"),
        den.alias("slope_den"),
        (num * 1.0 / den).alias("slope_cents_per_hour"),
    )


@declared(
    "funnel_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t_view
      GROUP BY e.user_id
    ),
    d AS (
      SELECT p.user_id,
             CAST(floor(epoch(p.t_purchase)) AS BIGINT)
               - CAST(floor(epoch(v.t_view)) AS BIGINT) AS secs
      FROM p JOIN v ON v.user_id = p.user_id
    ),
    h AS (
      SELECT secs // 3600 AS hours_bucket,
             CAST(count(*) AS BIGINT) AS n_users
      FROM d GROUP BY secs // 3600
    ),
    cum AS (
      SELECT hours_bucket, n_users,
             sum(n_users) OVER (ORDER BY hours_bucket
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cw,
             sum(n_users) OVER () AS tw
      FROM h
    )
    SELECT hours_bucket, n_users,
           CAST(min(CASE WHEN 2 * cw >= tw THEN hours_bucket END)
                OVER () AS BIGINT) AS median_hours_bucket
    FROM cum
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: hours between each user's first view
    and their first subsequent purchase, bucketed by hour, with the
    median bucket annotated -- the DURATION complement to funnel_stages'
    conversion counts (how long, not just how many).

    Same histogram-median discipline as weighted_median_price: durations
    collapse to hour buckets before any window runs, so the cumulative
    selection scans bucket-count rows regardless of user count; epoch
    subtraction is exact integer seconds (floored epochs per the DuckDB
    parity convention).  Two first-event aggregations sharing the
    user_id shuffle, then bucket-sized windows.
    """
    ev = load_table(spark, sf_dir, "events")
    # v is consumed by two joins (purchase gating + duration pairing);
    # checkpoint the per-user first-view aggregate once so the view scan
    # runs once, not once per consumer (was a 3x events plan).  v is
    # user-dim sized at 100 TB: shuffle_hash, not broadcast, not sort.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v.hint("shuffle_hash"), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    d = p.join(v.hint("shuffle_hash"), "user_id").select(
        (
            F.unix_timestamp("t_purchase").cast("bigint")
            - F.unix_timestamp("t_view").cast("bigint")
        ).alias("secs")
    )
    h = d.groupBy(F.expr("secs DIV 3600").alias("hours_bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    wcum = Window.orderBy("hours_bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = h.select(
        "hours_bucket",
        "n_users",
        F.sum("n_users").over(wcum).alias("cw"),
        F.sum("n_users").over(wall).alias("tw"),
    )
    return cum.select(
        "hours_bucket",
        "n_users",
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("hours_bucket"))
        )
        .over(wall)
        .cast("bigint")
        .alias("median_hours_bucket"),
    )


# 5-minute co-activity window; bucket width equals interval length so an
# interval spans at most 2 buckets and overlapping intervals always share
# at least one bucket (|start_a - start_b| < L => bucket ids differ <= 1).
OVERLAP_WINDOW_US = 300_000_000


@declared(
    "interval_overlap_pairs",
    oracle="""
    WITH iv AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             min(ts) AS s, min(ts) + INTERVAL 5 MINUTE AS e
      FROM events GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
    ),
    pairs AS (
      SELECT a.day, a.user_id AS ua, b.user_id AS ub,
             (epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)))
               // 1000000 AS ov_s
      FROM iv a JOIN iv b
        ON a.day = b.day AND a.user_id < b.user_id
       AND a.s < b.e AND b.s < a.e
    )
    SELECT day, CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ov_s) AS BIGINT) AS sum_overlap_secs,
           CAST(max(ov_s) AS BIGINT) AS max_overlap_secs
    FROM pairs GROUP BY day
    """,
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily co-activity: pairs of users whose first-5-minutes-of-day
    windows overlap, via a BUCKET-BLOCKED interval join.

    The scale point: Spark plans a raw inequality-overlap join as a
    range/nested-loop disaster, so the interval predicate is converted
    to an EQUI-join first -- each interval explodes to its (<=2) 5-min
    bucket ids, candidates meet on (day, bucket), and the exact overlap
    predicate verifies.  Bucket width == interval length guarantees no
    missed pair (overlapping starts differ by < one bucket).  This is
    the standard interval-join equi-fication; at 100 TB it is the
    difference between a shuffle join on uniform bucket keys and an
    O(n^2) per-day comparison.  The oracle keeps the direct range-join
    spelling -- same result, different physical strategy.  The exploded
    frame is checkpointed (two self-join aliases) and the equal-size
    stat-less join is pinned to a shuffle HASH join (no sort pass).
    Overlap seconds are integer microsecond arithmetic (DIV), bit-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.min("ts").alias("s"))
        .select(
            "user_id",
            "day",
            F.unix_micros("s").alias("s_us"),
            (F.unix_micros("s") + OVERLAP_WINDOW_US).alias("e_us"),
        )
    )
    bucketed = iv.select(
        "user_id",
        "day",
        "s_us",
        "e_us",
        F.explode(
            F.array_distinct(
                F.array(
                    F.expr(f"s_us DIV {OVERLAP_WINDOW_US}"),
                    F.expr(f"(e_us - 1) DIV {OVERLAP_WINDOW_US}"),
                )
            )
        ).alias("bucket"),
    ).localCheckpoint(eager=False)
    a = bucketed.alias("a")
    b = bucketed.alias("b").hint("shuffle_hash")
    pairs = (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_us") < F.col("b.e_us"))
            & (F.col("b.s_us") < F.col("a.e_us")),
        )
        .select(
            F.col("a.day").alias("day"),
            F.col("a.user_id").alias("ua"),
            F.col("b.user_id").alias("ub"),
            F.expr(
                "(least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us))"
                " DIV 1000000"
            ).alias("ov_s"),
        )
        .dropDuplicates(["day", "ua", "ub"])
    )
    return pairs.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("ov_s").cast("bigint").alias("sum_overlap_secs"),
        F.max("ov_s").cast("bigint").alias("max_overlap_secs"),
    )


ATTRIBUTION_WINDOW_US = 1_800_000_000  # 30 minutes


@declared(
    "conversion_attribution",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    conv AS (
      SELECT CASE WHEN touch_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(touch_ts)
                       <= {ATTRIBUTION_WINDOW_US}
                  THEN touch_type ELSE 'none' END AS attributed_type,
             CASE WHEN touch_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(touch_ts)
                       <= {ATTRIBUTION_WINDOW_US}
                  THEN (epoch_us(ts) - epoch_us(touch_ts)) // 1000000
             END AS gap_s
      FROM seq WHERE event_type = 'purchase'
    )
    SELECT attributed_type, CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(coalesce(sum(gap_s), 0) AS BIGINT) AS sum_gap_secs
    FROM conv GROUP BY attributed_type
    """,
)
def conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    click/view by the same user within a 30-minute lookback, else
    'none' -- the marketing-analytics classic, and the same
    carry-last-qualifying-event-forward window the reference's state
    scan uses for route freshness (etl_controller.py:615-623).

    One window shuffle on user_id with a deterministic (ts, event_id)
    total order; ``last(..., ignorenulls)`` over an up-to-previous-row
    frame carries the touch forward without a self-join -- the
    at-100-TB alternative (as-of join purchases to touches) costs a
    second shuffle.  Gap arithmetic is integer microseconds (DIV).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    seq = ev.select(
        "ts",
        "event_type",
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    ).filter(F.col("event_type") == "purchase")
    gap_us = F.unix_micros("ts") - F.unix_micros("touch_ts")
    in_window = F.col("touch_ts").isNotNull() & (
        gap_us <= ATTRIBUTION_WINDOW_US
    )
    conv = seq.select(
        F.when(in_window, F.col("touch_type"))
        .otherwise("none")
        .alias("attributed_type"),
        F.when(in_window, F.expr(
            f"(unix_micros(ts) - unix_micros(touch_ts)) DIV 1000000"
        )).alias("gap_s"),
    )
    return conv.groupBy("attributed_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.coalesce(F.sum("gap_s"), F.lit(0)).cast("bigint").alias(
            "sum_gap_secs"
        ),
    )


DECAY_TOPK = 20


@declared(
    "time_decayed_user_value",
    oracle=f"""
    WITH anchor AS (
      SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS max_day FROM events
    ),
    scored AS (
      SELECT e.user_id,
             CAST(round(e.value * 10000) AS BIGINT)
               // (1::BIGINT << least(
                     date_diff('day', CAST(date_trunc('day', e.ts) AS DATE),
                               a.max_day), 62)) AS decayed
      FROM events e, anchor a
    )
    SELECT user_id,
           CAST(sum(decayed) AS BIGINT) AS decayed_value_x10000,
           CAST(count(*) AS BIGINT) AS n_events
    FROM scored GROUP BY user_id
    ORDER BY decayed_value_x10000 DESC, user_id
    LIMIT {DECAY_TOPK}
    """,
)
def time_decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement with exponential time decay (half-life = one
    day): each event contributes value / 2^age_days relative to the
    newest day in the data -- the recency-weighted score ranking systems
    actually use, but INTEGER-EXACT: scaled value divided by a bigint
    power of two (shift), so no float pow and no cross-engine drift.

    The anchor day is a one-row scalar (aggregate -> broadcast cross
    join, the idiomatic scalar-attach); the decay itself is per-row
    arithmetic folded into one map-side-combinable sum -- at 100 TB this
    is a single scan + one shuffle on user_id, and yesterday's scores
    can be rolled forward incrementally (decay is multiplicative:
    shift the running sum right by the day delta, add today).
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    anchor = ev.agg(
        F.max(F.date_trunc("day", "ts").cast("date")).alias("max_day")
    )
    scored = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.expr(
            "CAST(round(value * 10000) AS BIGINT)"
            " DIV shiftleft(CAST(1 AS BIGINT),"
            " least(datediff(max_day, CAST(date_trunc('day', ts) AS DATE)),"
            " 62))"
        ).alias("decayed"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.sum("decayed").cast("bigint").alias("decayed_value_x10000"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy(F.col("decayed_value_x10000").desc(), "user_id")
        .limit(DECAY_TOPK)
    )


@declared(
    "user_event_sequences",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           (list(event_type ORDER BY ts, event_id))[1:10] AS first_events
    FROM events
    GROUP BY user_id
    """,
)
def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-ordered event-type sequences (first 10), the
    extraction step for behavioral sequence models -- the corpus a
    next-event predictor trains on, analogous to the reference's ordered
    command journals (etl_controller.py:3222-3223 keeps per-group ordered
    name lists for exactly this replay purpose).

    Determinism under parallelism: collect_list order is
    partition-arrival order, so the structs carry (ts, event_id) and are
    sort_array'd before the type is projected out -- (ts, event_id) is a
    total order (ids unique), so both engines produce the identical
    sequence.  Skew guard: rows beyond the per-user top-10 by (ts,
    event_id) are nulled BEFORE the collect (collect_list skips nulls),
    so a power-user hot key contributes at most 10 structs to its row --
    the full history is never materialized into one array (at 100 TB a
    hot key would otherwise build a multi-GB intermediate row).  The
    row_number window and the groupBy share the user_id hash partitioning,
    so Catalyst reuses the exchange: still one shuffle total.
    """
    events = load_table(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    capped = events.select(
        "user_id",
        F.when(rn <= 10, F.struct("ts", "event_id", "event_type")).alias("s"),
    )
    ordered = F.sort_array(F.collect_list("s"))
    return capped.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.transform(ordered, lambda s: s.event_type).alias("first_events"),
    )


@declared(
    "event_trigram_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             lead(event_type, 1) OVER w AS t2,
             lead(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
      SELECT t1 || '>' || t2 || '>' || t3 AS path,
             CAST(count(*) AS BIGINT) AS n_paths
      FROM seq WHERE t3 IS NOT NULL
      GROUP BY t1 || '>' || t2 || '>' || t3
    )
    SELECT path, n_paths, rnk
    FROM (
      SELECT path, n_paths,
             CAST(row_number() OVER (ORDER BY n_paths DESC, path)
               AS BIGINT) AS rnk
      FROM paths
    ) WHERE rnk <= 15
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioral paths: the trigram extension of
    event_transition_counts (bigrams), i.e. the flow segments a Sankey /
    user-journey view renders.  Two leads over one per-user window --
    the same single shuffle the bigram form pays, NOT a self-join per
    extra step (the join form doubles shuffles per path length; the
    window form is O(1) shuffles for any fixed n).  Path cardinality is
    |event_types|^3-bounded, so the count aggregation collapses
    map-side regardless of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    paths = seq.select(
        F.concat_ws(">", "t1", "t2", "t3").alias("path")
    ).groupBy("path").agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
    wr = Window.orderBy(F.desc("n_paths"), F.asc("path"))
    return (
        paths.withColumn("rnk", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rnk") <= 15)
        .select("path", "n_paths", "rnk")
    )


@declared(
    "seasonal_naive_forecast_error",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS v_scaled
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    fc AS (
      SELECT event_type, day, v_scaled,
             lag(v_scaled, 7) OVER (PARTITION BY event_type ORDER BY day)
               AS naive_fc
      FROM daily
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days_scored,
           ((((2 * (CAST(sum(abs(v_scaled - naive_fc)) AS BIGINT)) * 10000 + (CAST(count(*) AS BIGINT) * 10000)) - (2 * (CAST(sum(abs(v_scaled - naive_fc)) AS BIGINT)) * 10000 + (CAST(count(*) AS BIGINT) * 10000)) % (2 * (CAST(count(*) AS BIGINT) * 10000))) / (2 * (CAST(count(*) AS BIGINT) * 10000))) / 10000.0)
             AS mae
    FROM fc
    WHERE naive_fc IS NOT NULL
    GROUP BY event_type
    """,
)
def seasonal_naive_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality floor: mean absolute error of the seasonal-naive
    forecast (each day predicted by the same weekday one week earlier)
    per event type -- the baseline every real forecasting model must
    beat, and the first number a capacity-planning pipeline reports.

    Integer-exact end to end: daily totals are scaled-int sums, the
    absolute errors stay integers, and the MAE divides via the half-up
    integer-rounding convention (the denominator carries the x10000
    scale so the division is one exact step).  Days without a
    week-earlier observation are excluded identically on both engines.
    One shuffle to daily cells, a lag over the per-type day series
    (|days| rows per type), one rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("v_scaled")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    fc = daily.withColumn("naive_fc", F.lag("v_scaled", 7).over(w)).filter(
        F.col("naive_fc").isNotNull()
    )
    err = F.sum(F.abs(F.col("v_scaled") - F.col("naive_fc"))).cast("bigint")
    den = (F.count(F.lit(1)).cast("bigint") * 10000)
    x = 2 * err * 10000 + den
    mae = ((x - x % (2 * den)) / (2 * den)) / 10000.0
    return fc.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        mae.alias("mae"),
    )


@declared(
    "weekday_hour_heatmap",
    oracle="""
    SELECT CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS BIGINT)
             AS dow,
           CAST(date_part('hour', ts) AS BIGINT) AS hour,
           CAST(count(*) AS BIGINT) AS n_events,
           (((((sum(CAST(round(value * 10000) AS BIGINT))) + 50) - ((sum(CAST(round(value * 10000) AS BIGINT))) + 50) % 100) / 100) / 100.0)
             AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7x24 activity heatmap (weekday x hour event counts + value
    mass) every operations dashboard renders -- the 2-D grid behind the
    1-D seasonality views (dow_seasonality_lift, tumbling_hour_counts).

    Weekday is derived portably as (days_since_epoch + 4) % 7
    (0=Sunday): Spark's and DuckDB's dayofweek() conventions differ
    (CLAUDE.md trap), integer epoch arithmetic does not.  Single
    partial-aggregable pass; output cardinality is a constant 168
    cells regardless of corpus size.
    """
    ev = load_table(spark, sf_dir, "events")
    dow = (F.expr("unix_timestamp(ts) DIV 86400") + 4) % 7
    return ev.groupBy(
        dow.cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        int_round_scaled(
            F.sum(F.round(F.col("value") * 10000).cast("bigint")), 2
        ).alias("sum_value"),
    )


@declared(
    "daily_value_autocorr_lag1",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS v
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    pairs AS (
      SELECT event_type, v AS x,
             lead(v) OVER (PARTITION BY event_type ORDER BY day) AS y
      FROM daily
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pairs WHERE y IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n AS n_pairs,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS autocorr
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def daily_value_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each event type's daily value series --
    the diagnostic that says whether the seasonal-naive baseline
    (seasonal_naive_forecast_error) is even beatable: autocorr near 0
    means the series is white noise around its mean and no forecaster
    will improve on it; strong autocorr means structure worth modeling.

    Exact-moment Pearson on (x_t, x_{t+1}) pairs -- the
    quality_length_corr_by_source method applied to a lagged self-pair:
    daily totals are exact scaled-int sums, the six moments accumulate
    as integers (DECIMAL(38,0) for headroom), and only the three final
    exact integers convert to double.  The day series per type is
    |days| rows, so the lead window and moment rollup cost nothing
    after the one daily aggregation pass.  Zero-variance series are
    excluded identically on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = (
        daily.select(
            "event_type",
            F.col("v").alias("x"),
            F.lead("v").over(w).alias("y"),
        )
        .filter(F.col("y").isNotNull())
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # Cast EACH OPERAND to decimal before multiplying: a bigint*bigint
    # product wraps silently in non-ANSI Spark where DuckDB's HUGEINT
    # errors loudly -- the decimal headroom must cover the product, not
    # just the accumulation.
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
    )
    var_x = F.expr("n * sxx - sx * sx")
    var_y = F.expr("n * syy - sy * sy")
    corr = F.expr(
        "CAST(n * sxy - sx * sy AS DOUBLE)"
        " / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))"
        " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))"
    )
    return (
        m.filter((var_x > 0) & (var_y > 0))
        .select("event_type", F.col("n").alias("n_pairs"), corr.alias("autocorr"))
    )


@declared(
    "cuped_variance_reduction",
    oracle="""
    WITH per_user AS (
      SELECT event_type, user_id,
             CAST(sum(CASE WHEN CAST(date_part('day', ts) AS BIGINT) <= 15
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN CAST(date_part('day', ts) AS BIGINT) > 15
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS y
      FROM events
      GROUP BY event_type, user_id
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS HUGEINT)
               AS sxx,
             CAST(sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
               AS syy,
             CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS HUGEINT)
               AS sxy
      FROM per_user GROUP BY event_type
    )
    SELECT event_type, n AS n_users,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
           (CAST(n * sxy - sx * sy AS DOUBLE)
              * CAST(n * sxy - sx * sy AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS var_reduction
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED pre-experiment covariate adjustment (Deng et al. 2013), the
    standard experimentation-platform variance cutter: per user, the
    first half-month's value total is the pre-period covariate X and the
    second half's is the metric Y; theta = cov(X,Y)/var(X) is the
    adjustment coefficient, and the achievable variance reduction is
    exactly rho^2 = cov^2/(var X * var Y) -- the fraction of metric
    variance the covariate explains, i.e. how much smaller the
    experiment's sample size could be.

    Exactness: all five moments accumulate as DECIMAL(38,0) (operands
    cast BEFORE multiplying, the HUGEINT-parity rule); only the final
    theta and rho^2 convert to double, as single fixed-order
    multiply/divide expressions over identical integers -- bit-equal
    across engines.  Squaring cov INSIDE the decimal space could
    overflow 38 digits at scale, so the square happens in double on both
    sides.  Plan: one events scan -> per-(type,user) conditional sums
    (partial-agg map-side) -> per-type moment reduction; two shuffles
    total, both key-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("bigint")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.when(F.dayofmonth("ts") <= 15, v).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(F.dayofmonth("ts") > 15, v).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("y"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d(F.col("x"))).alias("sx"),
        F.sum(d(F.col("y"))).alias("sy"),
        F.sum(d(F.col("x")) * d(F.col("x"))).alias("sxx"),
        F.sum(d(F.col("y")) * d(F.col("y"))).alias("syy"),
        F.sum(d(F.col("x")) * d(F.col("y"))).alias("sxy"),
    )
    var_x = F.expr("n * sxx - sx * sx")
    var_y = F.expr("n * syy - sy * sy")
    theta = F.expr(
        "CAST(n * sxy - sx * sy AS DOUBLE)"
        " / CAST(n * sxx - sx * sx AS DOUBLE)"
    )
    vr = F.expr(
        "(CAST(n * sxy - sx * sy AS DOUBLE)"
        " * CAST(n * sxy - sx * sy AS DOUBLE))"
        " / (CAST(n * sxx - sx * sx AS DOUBLE)"
        " * CAST(n * syy - sy * sy AS DOUBLE))"
    )
    return (
        m.filter((var_x > 0) & (var_y > 0))
        .select(
            "event_type",
            F.col("n").alias("n_users"),
            theta.alias("theta"),
            vr.alias("var_reduction"),
        )
    )


@declared(
    "rfm_segments",
    oracle="""
    WITH anchor AS (
      SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS max_day FROM events
    ),
    per_user AS (
      SELECT user_id,
             CAST(datediff('day',
                           max(CAST(date_trunc('day', ts) AS DATE)),
                           max(a.max_day)) AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_c
      FROM events CROSS JOIN anchor a
      GROUP BY user_id
    ),
    binned AS (
      SELECT user_id,
             CAST((row_number() OVER (ORDER BY recency_days, user_id) - 1) * 3
                  // count(*) OVER () AS BIGINT) AS r_bin,
             CAST((row_number() OVER (ORDER BY frequency, user_id) - 1) * 3
                  // count(*) OVER () AS BIGINT) AS f_bin,
             CAST((row_number() OVER (ORDER BY monetary_c, user_id) - 1) * 3
                  // count(*) OVER () AS BIGINT) AS m_bin
      FROM per_user
    )
    SELECT r_bin, f_bin, m_bin, CAST(count(*) AS BIGINT) AS n_users
    FROM binned
    GROUP BY r_bin, f_bin, m_bin
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation -- the classic behavioral-marketing rollup: per
    user, Recency (days since last event vs the corpus anchor day),
    Frequency (event count), Monetary (value total in cents), each cut
    into tertiles, then users counted per (R, F, M) cell; the 27-cell
    table that drives churn/VIP/win-back targeting.

    Tertile cuts are RANK-based integers -- bin = (rn-1)*3 DIV n over a
    (metric, user_id) total order -- so the cuts are engine-exact
    (value-quantile cuts would put engines on different sides of a float
    boundary).  Plan: one events scan -> per-user partial-agg rollup;
    the three rank windows run over the USER table (corpus-independent);
    the output is 27-cell-bounded.  The anchor day is a 1-row broadcast.
    At 100 TB the three global rank sorts over users become histogram
    cumulative ranks (doc_char_length_mad's trick) if the user table
    itself is huge.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(
        F.max(F.date_trunc("day", "ts").cast("date")).alias("max_day")
    )
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.max("max_day"),
                F.max(F.date_trunc("day", "ts").cast("date")),
            )
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_c"),
        )
    )
    n_all = Window.partitionBy()
    ranked = per_user.select(
        "user_id",
        F.row_number()
        .over(Window.orderBy("recency_days", "user_id"))
        .alias("rn_r"),
        F.row_number().over(Window.orderBy("frequency", "user_id")).alias("rn_f"),
        F.row_number().over(Window.orderBy("monetary_c", "user_id")).alias("rn_m"),
        F.count(F.lit(1)).over(n_all).alias("n"),
    )
    binned = ranked.select(
        F.expr("CAST((rn_r - 1) * 3 DIV n AS BIGINT)").alias("r_bin"),
        F.expr("CAST((rn_f - 1) * 3 DIV n AS BIGINT)").alias("f_bin"),
        F.expr("CAST((rn_m - 1) * 3 DIV n AS BIGINT)").alias("m_bin"),
    )
    return binned.groupBy("r_bin", "f_bin", "m_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


@declared(
    "conversion_latency_quantiles",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS first_signup
      FROM events
    ),
    conv AS (
      SELECT user_id,
             CAST(min(CAST(floor(epoch(ts)) AS BIGINT)
                      - CAST(floor(epoch(first_signup)) AS BIGINT))
               AS BIGINT) AS delay_sec
      FROM seq
      WHERE event_type = 'purchase' AND first_signup IS NOT NULL
      GROUP BY user_id
    ),
    ranked AS (
      SELECT CAST(delay_sec // 60 AS BIGINT) AS delay_min,
             row_number() OVER (ORDER BY delay_sec, user_id) AS rn,
             count(*) OVER () AS n
      FROM conv
    )
    SELECT 'p50' AS quantile, delay_min,
           CAST(n AS BIGINT) AS n_converted
    FROM ranked WHERE rn = (n + 1) // 2
    UNION ALL
    SELECT 'p90' AS quantile, delay_min,
           CAST(n AS BIGINT) AS n_converted
    FROM ranked WHERE rn = (9 * n + 9) // 10
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-to-first-purchase latency quantiles (p50/p90) -- the
    product-analytics time-to-convert distribution: how long after their
    FIRST signup users take to make their first purchase, summarized at
    the median and tail.

    The first-signup carry is one running-min window per user (ordered
    by (ts, event_id)), so purchases see the signup that precedes them
    without a self-join; per-user first conversion is a groupBy over the
    SAME user_id partitioning (exchange reused).  Quantiles are
    percentile_disc rank selections over the converted-user table
    (p50 at (n+1) DIV 2, p90 at ceil(0.9n) = (9n+9) DIV 10), and the
    delay is integer seconds (both engines floor the epoch -- DuckDB's
    epoch() is fractional, Spark's long cast truncates) DIV 60.
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).over(w).alias("first_signup"),
    )
    conv = (
        seq.filter(
            (F.col("event_type") == "purchase")
            & F.col("first_signup").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.min(
                F.col("ts").cast("long") - F.col("first_signup").cast("long")
            )
            .cast("bigint")
            .alias("delay_sec")
        )
    )
    # Both quantile filters consume this frame; checkpoint so the events
    # window + conversion rollup run once (shared-consumer rule).
    ranked = conv.select(
        F.expr("CAST(delay_sec DIV 60 AS BIGINT)").alias("delay_min"),
        F.row_number()
        .over(Window.orderBy("delay_sec", "user_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).localCheckpoint(eager=True)
    p50 = ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        F.lit("p50").alias("quantile"),
        "delay_min",
        F.col("n").cast("bigint").alias("n_converted"),
    )
    p90 = ranked.filter(F.col("rn") == F.expr("(9 * n + 9) DIV 10")).select(
        F.lit("p90").alias("quantile"),
        "delay_min",
        F.col("n").cast("bigint").alias("n_converted"),
    )
    return p50.unionByName(p90)


@declared(
    "holt_linear_daily_value",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    series AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             list(CAST(v AS DOUBLE) ORDER BY day) AS ys
      FROM daily GROUP BY event_type
    ),
    fold(event_type, n_days, i, l, b) AS (
      SELECT event_type, n_days, 1, ys[1], 0.0e0 FROM series
      UNION ALL
      SELECT f.event_type, f.n_days, f.i + 1,
             0.5e0 * s.ys[f.i + 1] + 0.5e0 * (f.l + f.b),
             0.3e0 * ((0.5e0 * s.ys[f.i + 1] + 0.5e0 * (f.l + f.b)) - f.l)
               + 0.7e0 * f.b
      FROM fold f JOIN series s ON s.event_type = f.event_type
      WHERE f.i < f.n_days
    )
    SELECT event_type, n_days,
           l / 10000.0e0 AS level,
           b / 10000.0e0 AS trend,
           (l + b) / 10000.0e0 AS forecast_next
    FROM fold WHERE i = n_days
    """,
)
def holt_linear_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing over each event
    type's daily value series: final level, trend, and the one-step
    forecast l+b -- the trend-aware upgrade of the EMA fold
    (`ema_user_value`) and the model the seasonal-naive baseline
    (`seasonal_naive_forecast_error`) is compared against.

    Two-component state rides a STRUCT accumulator on the Spark side
    (F.aggregate, seeded with the first element per the EMA mirror
    rule); the ORACLE folds via a recursive CTE, NOT list_reduce --
    DuckDB's list_reduce with a struct accumulator evaluates cross-field
    acc references inconsistently (acc.l inside the b field sees a
    different iteration's value; verified empirically), so multi-state
    folds must use the recursive-CTE spelling.  Daily totals are exact
    scaled-int sums (order-independent); the fold uses identical
    '0.5e0'/'0.3e0' literals and an identical operation sequence on both
    engines (the l' expression is repeated verbatim inside b' -- IEEE
    doubles make textually identical expression trees bit-identical);
    final outputs are single divisions of identical doubles, emitted
    raw.  Scale: the fold is per
    (event_type, day) SERIES -- |days| elements after a
    map-side-combinable daily aggregation, never per raw event; at
    100 TB the state array is bounded by the calendar, not the data.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))),
            lambda s: s.getField("v").cast("double"),
        ).alias("ys"),
    )
    elems = F.transform(
        F.col("ys"),
        lambda y: F.struct(y.alias("l"), F.lit(0.0).alias("b")),
    )

    def merge(acc, e):
        lp = F.lit(0.5) * e.getField("l") + F.lit(0.5) * (
            acc.getField("l") + acc.getField("b")
        )
        return F.struct(
            lp.alias("l"),
            (
                F.lit(0.3) * (lp - acc.getField("l"))
                + F.lit(0.7) * acc.getField("b")
            ).alias("b"),
        )

    st = F.aggregate(
        F.slice(elems, 2, F.size("ys") - 1),
        F.element_at(elems, 1),
        merge,
    )
    return series.select(
        "event_type",
        "n_days",
        (st.getField("l") / 10000.0).alias("level"),
        (st.getField("b") / 10000.0).alias("trend"),
        ((st.getField("l") + st.getField("b")) / 10000.0).alias(
            "forecast_next"
        ),
    )


@declared(
    "holt_linear_daily_chunked",
    oracle="""
    WITH RECURSIVE daily AS MATERIALIZED (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    series AS MATERIALIZED (
      SELECT event_type,
             CAST(floor(epoch(day)) AS BIGINT) // 86400 // 7 AS chunk,
             CAST(count(*) AS BIGINT) AS n_days,
             list(CAST(v AS DOUBLE) ORDER BY day) AS ys
      FROM daily
      GROUP BY event_type, CAST(floor(epoch(day)) AS BIGINT) // 86400 // 7
    ),
    chunks AS MATERIALIZED (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY chunk) AS rn
      FROM series
    ),
    -- level 1, day-by-day inside each chunk: the homogeneous affine
    -- summary (M = 2x2 matrix by columns (m11,m21),(m12,m22); d =
    -- offset (dl,db)) plus the SEEDED flat fold (l0,b0) used when the
    -- chunk is the type's first.  Every l-row expression is repeated
    -- verbatim inside its b-row (IEEE doubles: identical trees are
    -- bit-identical), and the Spark side builds the same trees.
    lvl1(event_type, rn, n_days, i,
         m11, m21, m12, m22, dl, db, l0, b0) AS (
      SELECT event_type, rn, n_days, 0,
             1.0e0, 0.0e0, 0.0e0, 1.0e0, 0.0e0, 0.0e0, ys[1], 0.0e0
      FROM chunks
      UNION ALL
      SELECT f.event_type, f.rn, f.n_days, f.i + 1,
             0.5e0 * (f.m11 + f.m21),
             0.3e0 * ((0.5e0 * (f.m11 + f.m21)) - f.m11) + 0.7e0 * f.m21,
             0.5e0 * (f.m12 + f.m22),
             0.3e0 * ((0.5e0 * (f.m12 + f.m22)) - f.m12) + 0.7e0 * f.m22,
             0.5e0 * c.ys[f.i + 1] + 0.5e0 * (f.dl + f.db),
             0.3e0 * ((0.5e0 * c.ys[f.i + 1] + 0.5e0 * (f.dl + f.db))
                      - f.dl) + 0.7e0 * f.db,
             CASE WHEN f.i + 1 >= 2
                  THEN 0.5e0 * c.ys[f.i + 1] + 0.5e0 * (f.l0 + f.b0)
                  ELSE f.l0 END,
             CASE WHEN f.i + 1 >= 2
                  THEN 0.3e0 * ((0.5e0 * c.ys[f.i + 1]
                                 + 0.5e0 * (f.l0 + f.b0)) - f.l0)
                       + 0.7e0 * f.b0
                  ELSE f.b0 END
      FROM lvl1 f JOIN chunks c
        ON c.event_type = f.event_type AND c.rn = f.rn
      WHERE f.i < f.n_days
    ),
    summ AS MATERIALIZED (
      SELECT * FROM lvl1 WHERE i = n_days
    ),
    totals AS (
      SELECT event_type, CAST(sum(n_days) AS BIGINT) AS n_days,
             CAST(count(*) AS BIGINT) AS n_chunks
      FROM summ GROUP BY event_type
    ),
    -- level 2, chunk-by-chunk: s_1 = the first chunk's seeded fold;
    -- s_j = M_j * s + d_j spelled exactly as the Spark merge
    fold2(event_type, rn, l, b) AS (
      SELECT event_type, rn, l0, b0 FROM summ WHERE rn = 1
      UNION ALL
      SELECT f.event_type, c.rn,
             f.l * c.m11 + f.b * c.m12 + c.dl,
             f.l * c.m21 + f.b * c.m22 + c.db
      FROM fold2 f JOIN summ c
        ON c.event_type = f.event_type AND c.rn = f.rn + 1
    )
    SELECT t.event_type AS event_type, t.n_days, t.n_chunks,
           f.l / 10000.0e0 AS level,
           f.b / 10000.0e0 AS trend,
           (f.l + f.b) / 10000.0e0 AS forecast_next
    FROM totals t JOIN fold2 f
      ON f.event_type = t.event_type AND f.rn = t.n_chunks
    """,
)
def holt_linear_daily_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-level Holt (round-10 verdict task #7 -- the last
    per-key sequential-fold family without a chunked twin).
    `holt_linear_daily_value` folds each type's WHOLE daily history as
    one in-row array: calendar-bounded, but still one sequential fold
    per key -- a decade of daily history is a 3650-step chain in a
    single task.  The Holt step s' = (l', b') is AFFINE in s = (l, b):
    l' = 0.5y + 0.5(l+b), b' = 0.3(l'-l) + 0.7b.  So a 7-day chunk
    composes as a 2x2 matrix + offset: level 1 folds each (type, week
    chunk)'s days into (M, d) -- M built by pushing the identity's
    columns through the homogeneous step, d by pushing (0,0) through
    the full step -- plus the seeded flat fold (l0, b0) for when the
    chunk is the type's first; level 2 folds chunk summaries in chunk
    order: s = (l0_1, b0_1), then s = M_j s + d_j.

    Equal to the flat Holt in real arithmetic; float reassociation at
    chunk boundaries makes it a distinct declared result, so the ORACLE
    mirrors the chunk structure exactly (the ema_user_value_chunked
    precedent): identical '0.5e0'/'0.3e0' literals, every l-row
    expression repeated verbatim inside its b-row, level-1 day steps
    and the level-2 chunk fold as recursive CTEs (multi-component state
    cannot ride DuckDB's list_reduce -- the struct-accumulator
    cross-field bug), matrix-vector products spelled term for term.

    Scale: level-1 arrays are bounded by the CHUNK (7 days), not
    history length; the only sequential chain is n_chunks long
    (calendar/7) and each level-1 fold runs parallel across (type,
    chunk) partitions -- the 3650-step chain becomes 52 sequential
    steps over 7-step parallel folds.  Same two-shuffle shape as the
    chunked EMA."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    per_chunk = daily.withColumn(
        "chunk", F.expr("CAST(day AS LONG) DIV 86400 DIV 7")
    ).groupBy("event_type", "chunk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))),
            lambda s: s.getField("v").cast("double"),
        ).alias("ys"),
    )

    # seeded flat fold (l0, b0): identical trees to holt_linear_daily_value
    elems = F.transform(
        F.col("ys"),
        lambda y: F.struct(y.alias("l"), F.lit(0.0).alias("b")),
    )

    def seed_merge(acc, e):
        lp = F.lit(0.5) * e.getField("l") + F.lit(0.5) * (
            acc.getField("l") + acc.getField("b")
        )
        return F.struct(
            lp.alias("l"),
            (
                F.lit(0.3) * (lp - acc.getField("l"))
                + F.lit(0.7) * acc.getField("b")
            ).alias("b"),
        )

    seeded = F.aggregate(
        F.slice(elems, 2, F.size("ys") - 1),
        F.element_at(elems, 1),
        seed_merge,
    )

    # homogeneous (M, d) fold over ALL of the chunk's days
    def hom_merge(acc, y):
        m11p = F.lit(0.5) * (acc.getField("m11") + acc.getField("m21"))
        m12p = F.lit(0.5) * (acc.getField("m12") + acc.getField("m22"))
        dlp = F.lit(0.5) * y + F.lit(0.5) * (
            acc.getField("dl") + acc.getField("db")
        )
        return F.struct(
            m11p.alias("m11"),
            (
                F.lit(0.3) * (m11p - acc.getField("m11"))
                + F.lit(0.7) * acc.getField("m21")
            ).alias("m21"),
            m12p.alias("m12"),
            (
                F.lit(0.3) * (m12p - acc.getField("m12"))
                + F.lit(0.7) * acc.getField("m22")
            ).alias("m22"),
            dlp.alias("dl"),
            (
                F.lit(0.3) * (dlp - acc.getField("dl"))
                + F.lit(0.7) * acc.getField("db")
            ).alias("db"),
        )

    hom = F.aggregate(
        F.col("ys"),
        F.struct(
            F.lit(1.0).alias("m11"),
            F.lit(0.0).alias("m21"),
            F.lit(0.0).alias("m12"),
            F.lit(1.0).alias("m22"),
            F.lit(0.0).alias("dl"),
            F.lit(0.0).alias("db"),
        ),
        hom_merge,
    )
    summ = per_chunk.select(
        "event_type",
        "chunk",
        "n_days",
        seeded.getField("l").alias("l0"),
        seeded.getField("b").alias("b0"),
        hom.getField("m11").alias("m11"),
        hom.getField("m21").alias("m21"),
        hom.getField("m12").alias("m12"),
        hom.getField("m22").alias("m22"),
        hom.getField("dl").alias("dl"),
        hom.getField("db").alias("db"),
    )

    level2 = summ.groupBy("event_type").agg(
        F.sum("n_days").cast("bigint").alias("n_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    "chunk", "l0", "b0", "m11", "m21", "m12", "m22",
                    "dl", "db",
                )
            )
        ).alias("carr"),
    )

    def chunk_merge(acc, c):
        return F.struct(
            (
                acc.getField("l") * c.getField("m11")
                + acc.getField("b") * c.getField("m12")
                + c.getField("dl")
            ).alias("l"),
            (
                acc.getField("l") * c.getField("m21")
                + acc.getField("b") * c.getField("m22")
                + c.getField("db")
            ).alias("b"),
        )

    first = F.element_at(F.col("carr"), 1)
    st = F.aggregate(
        F.slice(F.col("carr"), 2, F.size("carr") - 1),
        F.struct(
            first.getField("l0").alias("l"), first.getField("b0").alias("b")
        ),
        chunk_merge,
    )
    return level2.select(
        "event_type",
        "n_days",
        "n_chunks",
        (st.getField("l") / 10000.0).alias("level"),
        (st.getField("b") / 10000.0).alias("trend"),
        ((st.getField("l") + st.getField("b")) / 10000.0).alias(
            "forecast_next"
        ),
    )


@declared(
    "event_markov_stationary",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    tc AS (
      SELECT prev_type AS s, cur_type AS d, CAST(count(*) AS BIGINT) AS c
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    rs AS (SELECT s, CAST(sum(c) AS BIGINT) AS rsum FROM tc GROUP BY s),
    t AS (SELECT tc.s, tc.d, tc.c, rs.rsum FROM tc JOIN rs ON rs.s = tc.s),
    nf AS (SELECT CAST(count(*) AS BIGINT) AS n_states FROM rs),
    x0 AS (
      SELECT s AS state, CAST(1000000 // n_states AS BIGINT) AS x
      FROM rs CROSS JOIN nf
    ),
    x1 AS (
      SELECT t.d AS state, CAST(sum((x0.x * t.c) // t.rsum) AS BIGINT) AS x
      FROM t JOIN x0 ON x0.state = t.s GROUP BY t.d
    ),
    x2 AS (
      SELECT t.d AS state, CAST(sum((x1.x * t.c) // t.rsum) AS BIGINT) AS x
      FROM t JOIN x1 ON x1.state = t.s GROUP BY t.d
    )
    SELECT state, x AS stationary_ppm,
           CAST(row_number() OVER (ORDER BY x DESC, state) AS BIGINT) AS rnk
    FROM x2
    """,
)
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary-distribution estimate of the event-type Markov chain:
    two power-iteration steps x -> xP from the uniform start, in ppm
    FIXED-POINT integer arithmetic -- where user journeys concentrate in
    the long run (the `event_transition_counts` matrix put to its
    standard use; the journey-simulation prior).

    Exactness: each term floors ((x[s] * c(s,d)) DIV rowsum(s)) in
    integer space, so the iteration is deterministic on both engines --
    the float form would sum order-dependent doubles and cannot hash-
    match.  Total mass drifts a few ppm below 1e6 from the per-term
    floors; that bias is the declared semantics (and vanishes at ppm
    scale).  Plan: one user-timeline shuffle builds the |types|^2 count
    matrix distributedly; the matrix is dimension-bounded (<= |types|^2
    cells), so the power iterations run DRIVER-SIDE over the collected
    cells (the shapley lattice discipline) -- the previous unrolled-in-
    plan form paid two checkpoints and per-step broadcast joins for a
    handful of states.
    """
    from etl_rf_matrix_controller_spark.plans.scale import collect_bounded

    # |event-types|^2 cells; the type enum is ~10 values here, 100^2
    # headroom keeps the guard loose yet driver-safe (collect_bounded
    # fails loudly if the dimension-bounded argument ever breaks).
    cells = collect_bounded(
        event_transition_counts(spark, sf_dir).select(
            F.col("prev_type").alias("s"),
            F.col("cur_type").alias("d"),
            F.col("n_transitions").cast("bigint").alias("c"),
        ),
        10000,
        "event-type transition matrix",
    )
    rs: dict[str, int] = {}
    for r in cells:
        rs[r.s] = rs.get(r.s, 0) + r.c
    n_states = len(rs)
    x = {s: 1000000 // n_states for s in rs}
    for _ in range(2):
        nx: dict[str, int] = {}
        for r in cells:
            if r.s in x:
                nx[r.d] = nx.get(r.d, 0) + (x[r.s] * r.c) // rs[r.s]
        x = nx
    ranked = sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(st, v, i + 1) for i, (st, v) in enumerate(ranked)],
        "state string, stationary_ppm bigint, rnk bigint",
    )


@declared(
    "cohort_ltv_curve",
    oracle=f"""
    WITH ev AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 7 AS wk,
             CAST(round(value * 10000) AS BIGINT) AS v_s
      FROM events
    ),
    firsts AS (
      SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users
      FROM firsts GROUP BY cohort_week
    ),
    weekly AS (
      SELECT f.cohort_week, e.wk - f.cohort_week AS week_index,
             CAST(sum(e.v_s) AS BIGINT) AS wv
      FROM ev e JOIN firsts f ON f.user_id = e.user_id
      GROUP BY f.cohort_week, e.wk - f.cohort_week
    ),
    cum AS (
      SELECT cohort_week, week_index,
             CAST(sum(wv) OVER (PARTITION BY cohort_week ORDER BY week_index
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_s
      FROM weekly
    )
    SELECT c.cohort_week, c.week_index, s.n_users,
           {int_round_scaled_sql('c.cum_s')} AS cum_value,
           {ratio4_sql('c.cum_s', 's.n_users * 10000')} AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users cohorted by the epoch-week of
    their first event; per (cohort, weeks-since-entry) the CUMULATIVE
    value mass and its per-user average -- the revenue twin of
    `cohort_retention` (that one counts active users; this one
    accumulates value), the curve LTV forecasting reads off.

    Weeks are integer epoch arithmetic (epoch-day DIV 7; the anchor is
    arbitrary but identical on both engines -- the weekday_hour_heatmap
    portability rule).  Value mass is exact scaled-int sums; the
    cumulative is a ROWS-framed running sum over the per-week partials
    (|cohorts| x |weeks| rows, trivial after the one user-cohort join);
    money and per-user outputs round in integer space.  Scale: firsts is
    a per-user aggregation (shuffle on user_id, reused by the join);
    sizes is |cohorts| rows, broadcast.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("unix_timestamp(ts) DIV 86400 DIV 7").alias("wk"),
        F.round(F.col("value") * 10000).cast("bigint").alias("v_s"),
    )
    firsts = (
        ev.groupBy("user_id")
        .agg(F.min("wk").alias("cohort_week"))
        .localCheckpoint(eager=True)  # cohort sizes AND the event join
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    weekly = (
        ev.join(firsts.hint("shuffle_hash"), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_index"),
        )
        .agg(F.sum("v_s").cast("bigint").alias("wv"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("week_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = weekly.select(
        "cohort_week",
        "week_index",
        F.sum("wv").over(w).cast("bigint").alias("cum_s"),
    )
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_index",
        "n_users",
        int_round_scaled(F.col("cum_s")).alias("cum_value"),
        ratio4(F.col("cum_s"), F.col("n_users") * 10000).alias("ltv_per_user"),
    )


@declared(
    "time_weighted_avg_value",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
             CAST(round(value * 10000) AS BIGINT) AS v_s,
             lead(CAST(floor(epoch(ts)) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t_next
      FROM events
    ),
    held AS (
      SELECT user_id, v_s, t_next - t_s AS dur_s
      FROM seq WHERE t_next IS NOT NULL
    ),
    agg AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_intervals,
             CAST(sum(dur_s) AS BIGINT) AS total_s,
             CAST(sum(CAST(v_s AS DECIMAL(38,0))
                      * CAST(dur_s AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS wsum
      FROM held GROUP BY user_id
    )
    SELECT user_id, n_intervals, total_s,
           CAST(wsum AS DOUBLE)
             / (CAST(total_s AS DOUBLE) * 10000.0e0) AS twap
    FROM agg WHERE total_s > 0
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each observation is
    weighted by how long it was the CURRENT value (until the user's next
    event) -- the step-function integral that plain AVG gets wrong on
    irregular event series (a value held for an hour counts 3600x one
    held for a second), the standard form for utilization, position, and
    price averaging.

    One user-timeline shuffle (lead window, ties broken on event_id);
    the integral accumulates as DECIMAL(38,0) products of exact ints
    (operand-cast rule -- v_s * dur_s can pass 2^63 for long gaps at
    high values), and the final TWAP is one double division of identical
    exact integers.  The last observation per user carries no duration
    (no next event bounds it) and is excluded identically on both
    engines; zero-duration users drop with total_s = 0.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("t_s"),
        F.round(F.col("value") * 10000).cast("bigint").alias("v_s"),
        "ts",
        "event_id",
    ).withColumn("t_next", F.lead("t_s").over(w))
    held = seq.filter(F.col("t_next").isNotNull()).select(
        "user_id", "v_s", (F.col("t_next") - F.col("t_s")).alias("dur_s")
    )
    agg = held.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum("dur_s").cast("bigint").alias("total_s"),
        F.sum(
            F.expr(
                "CAST(v_s AS DECIMAL(38,0)) * CAST(dur_s AS DECIMAL(38,0))"
            )
        ).cast("decimal(38,0)").alias("wsum"),
    )
    return agg.filter(F.col("total_s") > 0).select(
        "user_id",
        "n_intervals",
        "total_s",
        (
            F.expr("CAST(wsum AS DOUBLE)")
            / (F.expr("CAST(total_s AS DOUBLE)") * F.lit(10000.0))
        ).alias("twap"),
    )


@declared(
    "peak_concurrency_daily",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    flagged AS (
      SELECT user_id, sec,
             CASE WHEN sec - lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) > 1800
               OR lag(sec) OVER (
               PARTITION BY user_id ORDER BY sec, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_sess,
             event_id
      FROM ev
    ),
    sess AS (
      SELECT user_id, sec,
             sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      FROM flagged
    ),
    bounds AS (
      SELECT user_id, sess_id, min(sec) AS s, max(sec) + 1 AS e
      FROM sess GROUP BY user_id, sess_id
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM bounds
      UNION ALL
      SELECT e AS t, -1 FROM bounds
    ),
    net AS (SELECT t, CAST(sum(d) AS BIGINT) AS nd FROM deltas GROUP BY t),
    run AS (
      SELECT t, CAST(sum(nd) OVER (ORDER BY t
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS conc
      FROM net
    )
    SELECT t // 86400 AS day_idx,
           CAST(DATE '1970-01-01' + CAST(t // 86400 AS INT) AS DATE) AS day,
           CAST(max(conc) AS BIGINT) AS peak_concurrency,
           CAST(count(*) AS BIGINT) AS n_boundaries
    FROM run
    GROUP BY t // 86400
    """,
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily peak concurrent sessions: sessionize (the
    `user_session_stats` 30-min-gap convention), sweep-line the session
    [start, end) boundaries (+1/-1 deltas, end-exclusive at last event
    second + 1), and report each day's maximum of the running
    concurrency -- the capacity-planning readout (how many users were
    simultaneously active at the worst moment of each day).

    The running sum orders the BOUNDARY stream, which is session-
    bounded and collapses further by grouping same-second deltas first;
    the peak of a day is taken over its boundary points (a carried-in
    plateau was already counted on the day its opening boundary fired,
    the standard sweep-line attribution).  At 100 TB the single ordered
    window becomes a per-day partition with a carried prefix sum (two
    passes, same integers); here the global ROWS window keeps it one
    pass.  day derives from pure epoch-day integer arithmetic (the
    portable-weekday rule), rendered as DATE identically on both
    engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("long").alias("sec")
    )
    wo = Window.partitionBy("user_id").orderBy("sec", "event_id")
    flagged = ev.select(
        "user_id",
        "sec",
        F.when(
            (F.col("sec") - F.lag("sec").over(wo) > 1800)
            | F.lag("sec").over(wo).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        "event_id",
    )
    sess = flagged.select(
        "user_id",
        "sec",
        F.sum("new_sess")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    bounds = sess.groupBy("user_id", "sess_id").agg(
        F.min("sec").alias("s"), (F.max("sec") + 1).alias("e")
    )
    deltas = bounds.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        bounds.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t").agg(F.sum("d").cast("bigint").alias("nd"))
    run = net.select(
        "t",
        F.sum("nd")
        .over(
            Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        )
        .cast("bigint")
        .alias("conc"),
    )
    day_idx = F.expr("t DIV 86400")
    return run.groupBy(day_idx.alias("day_idx")).agg(
        F.max("conc").cast("bigint").alias("peak_concurrency"),
        F.count(F.lit(1)).cast("bigint").alias("n_boundaries"),
    ).select(
        "day_idx",
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("day_idx").cast("int"))
        .alias("day"),
        "peak_concurrency",
        "n_boundaries",
    )


@declared(
    "theil_sen_daily_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    pairs AS (
      SELECT CAST(b.v_s - a.v_s AS DOUBLE)
               / ((b.day_idx - a.day_idx) * 10000.0e0) AS slope
      FROM daily a JOIN daily b ON b.day_idx > a.day_idx
    ),
    ranked AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope) AS rn,
             count(*) OVER () AS n_pairs
      FROM pairs
    )
    SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
           CAST(n_pairs AS BIGINT) AS n_pairs, slope AS sen_slope
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
)
def theil_sen_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of the daily value series: the median of
    all pairwise slopes between daily totals -- insensitive to up to
    ~29% outlier days, unlike the least-squares `value_trend_slope` it
    complements (one anomalous day drags an OLS fit; the pairwise-slope
    median shrugs it off; Sen 1968).

    The pair fan-out is over the DAILY aggregate, so its size is
    (calendar days)^2 -- bounded by the time range, independent of row
    count (a year is ~66k pairs; the corpus scan stays one partial
    aggregation).  Each slope is one double division of exact scaled
    integers (identical operands -> identical IEEE result on both
    engines), and the median is the discrete lower-middle element by
    slope order, so the reported value is engine-exact even where pair
    identity ties.  At 100 TB only the daily rollup touches the data;
    the pairwise stage runs on a frame that fits in one partition.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.expr("unix_timestamp(ts) DIV 86400").alias("day_idx"))
        .agg(F.sum(F.round(F.col("value") * 10000).cast("bigint")).alias("v_s"))
        .localCheckpoint(eager=True)  # pair join (2 aliases) + n_days scalar
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = (
        a.join(F.broadcast(b), F.col("b.day_idx") > F.col("a.day_idx"))
        .select(
            (
                (F.col("b.v_s") - F.col("a.v_s")).cast("double")
                / ((F.col("b.day_idx") - F.col("a.day_idx")) * F.lit(10000.0))
            ).alias("slope")
        )
    )
    w = Window.orderBy("slope")
    ranked = pairs.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_pairs"),
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        ranked.filter(F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
        .crossJoin(F.broadcast(n_days))
        .select("n_days", F.col("n_pairs").cast("bigint"), F.col("slope").alias("sen_slope"))
    )


@declared(
    "interarrival_burstiness",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap
      FROM events
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS sg,
             CAST(sum(gap * gap) AS BIGINT) AS sg2
      FROM seq WHERE gap IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap,
           sqrt(greatest(
             CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
               - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                 * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
             0.0e0)) AS sd_gap,
           (sqrt(greatest(
              CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                  * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
              0.0e0))
            - CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
           / (sqrt(greatest(
                CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                  - (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                    * (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
                0.0e0))
              + CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS burstiness
    FROM agg WHERE sg > 0
    """,
)
def interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of each event type's arrival process: Goh-Barabasi
    B = (sigma - mu) / (sigma + mu) over inter-arrival gaps.  B -> -1
    for a metronome, 0 for a Poisson process, -> +1 for extreme bursts
    -- the one-number rhythm signature that separates organic traffic
    from scripted streams (complements the per-user cadence stats in
    `user_interevent_gap_stats` at the event-type level).

    Gaps come from one lag window per event_type (whole floored epoch
    seconds, the documented portable-epoch rule; ties break on
    event_id).  Moments accumulate as exact integers: sum(gap) is
    telescoping (bounded by the corpus time SPAN, not row count) and
    sum(gap^2) <= span^2, under 2^53 for spans to ~3 years -- so
    mean/sd/B are a fixed sequence of correctly-rounded double ops on
    identical operands, bit-equal across engines (sqrt is IEEE
    correctly rounded; greatest() clamps the -epsilon cancellation
    case).  At 100 TB the per-type ordered window repartitions by
    (type, day) with a carried boundary row -- same gaps, no hot
    partition; metronome types (sg = 0) drop on both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.expr("unix_timestamp(ts)").alias("t_s"),
        "ts",
        "event_id",
    ).withColumn("gap", F.col("t_s") - F.lag("t_s").over(w))
    agg = (
        seq.filter(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("sg"),
            F.sum(F.col("gap") * F.col("gap")).cast("bigint").alias("sg2"),
        )
    )
    mean = F.col("sg").cast("double") / F.col("n_gaps").cast("double")
    var = F.greatest(
        F.col("sg2").cast("double") / F.col("n_gaps").cast("double")
        - mean * mean,
        F.lit(0.0),
    )
    sd = F.sqrt(var)
    return agg.filter(F.col("sg") > 0).select(
        "event_type",
        "n_gaps",
        mean.alias("mean_gap"),
        sd.alias("sd_gap"),
        ((sd - mean) / (sd + mean)).alias("burstiness"),
    )


@declared(
    "kaplan_meier_conversion",
    oracle="""
    WITH RECURSIVE evs AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS fe
      FROM events
    ),
    users AS (
      SELECT user_id, min(fe) AS entry,
             min(CASE WHEN event_type = 'purchase' THEN fe END) AS conv,
             max(fe) AS censor
      FROM evs GROUP BY user_id
    ),
    ud AS (
      SELECT (coalesce(conv, censor) - entry) // 86400 AS dur,
             CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS conv_f
      FROM users
    ),
    per AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS u,
             CAST(sum(conv_f) AS BIGINT) AS c
      FROM ud GROUP BY dur
    ),
    risk AS (
      SELECT dur, u, c,
             (SELECT CAST(count(*) AS BIGINT) FROM ud)
               - (CAST(sum(u) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) - u) AS n_at_risk
      FROM per
    ),
    ev_days AS (
      SELECT dur, n_at_risk, c,
             CAST(row_number() OVER (ORDER BY dur) AS BIGINT) AS i
      FROM risk WHERE c > 0
    ),
    series AS (
      SELECT CAST(count(*) AS BIGINT) AS m,
             list(CAST(n_at_risk - c AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
                  ORDER BY dur) AS fs
      FROM ev_days
    ),
    fold(i, s) AS (
      SELECT CAST(1 AS BIGINT), fs[1] FROM series
      UNION ALL
      SELECT f.i + 1, f.s * sr.fs[f.i + 1]
      FROM fold f JOIN series sr ON TRUE
      WHERE f.i < sr.m
    )
    SELECT e.dur AS dur_day, e.n_at_risk, e.c AS n_conv,
           CAST((1000000 * e.c) // e.n_at_risk AS BIGINT) AS hazard_ppm,
           f.s AS survival
    FROM ev_days e JOIN fold f ON f.i = e.i
    """,
)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase: each user
    enters at their first event; users who never purchase are
    right-censored at their last event.  Per conversion day (days since
    entry): the at-risk count, conversions, the discrete hazard, and
    the KM survival estimate S(d) = prod(1 - d_i/n_i) -- the
    censoring-correct answer to "what fraction of users have converted
    by day d", which a naive conversion-rate cut gets wrong whenever
    observation windows differ (Kaplan & Meier 1958).

    Shape: one per-user aggregation (entry / first purchase / censor),
    one bounded per-duration rollup, then the survival fold runs over
    the EVENT-DAY series (<= calendar span elements) exactly like the
    Holt fold: a sequential array fold on the Spark side, mirrored by a
    recursive CTE in the oracle (NOT list_reduce -- the documented
    struct-accumulator trap).  Each factor is one double division of
    exact integers; the running product multiplies identical doubles in
    identical order, so the curve is bit-equal across engines.  The
    convention at tied times is the standard one: conversions at d are
    counted against the at-risk set INCLUDING users censored at d.
    Hazard is integer-floored ppm.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min(F.expr("unix_timestamp(ts)")).alias("entry"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.expr("unix_timestamp(ts)"))
        ).alias("conv"),
        F.max(F.expr("unix_timestamp(ts)")).alias("censor"),
    )
    ud = users.select(
        F.expr("(coalesce(conv, censor) - entry) DIV 86400").alias("dur"),
        F.when(F.col("conv").isNotNull(), 1).otherwise(0).alias("conv_f"),
    )
    per = ud.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        F.sum("conv_f").cast("bigint").alias("c"),
    )
    n_total = ud.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    risk = (
        per.withColumn("cum_u", F.sum("u").over(w).cast("bigint"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "dur",
            "u",
            "c",
            (F.col("n_total") - (F.col("cum_u") - F.col("u"))).alias("n_at_risk"),
        )
    )
    ev_days = risk.filter(F.col("c") > 0)
    series = ev_days.agg(
        F.array_sort(
            F.collect_list(F.struct("dur", "n_at_risk", "c"))
        ).alias("days")
    ).select(
        "days",
        F.transform(
            "days",
            lambda s: (s.getField("n_at_risk") - s.getField("c")).cast("double")
            / s.getField("n_at_risk").cast("double"),
        ).alias("fs"),
    )
    prefix = F.aggregate(
        F.slice(F.col("fs"), 2, F.size("fs") - 1),
        F.array(F.element_at(F.col("fs"), 1)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) * x)),
    )
    zipped = series.select(
        F.explode(F.arrays_zip(F.col("days"), prefix.alias("s"))).alias("z")
    )
    return zipped.select(
        F.col("z.days.dur").alias("dur_day"),
        F.col("z.days.n_at_risk").alias("n_at_risk"),
        F.col("z.days.c").alias("n_conv"),
        F.expr("CAST((1000000 * z.days.c) DIV z.days.n_at_risk AS BIGINT)").alias(
            "hazard_ppm"
        ),
        F.col("z.s").alias("survival"),
    )


_GAP_BAND_SQL = """CASE WHEN gap = 0 THEN '0s'
               WHEN gap < 10 THEN '1-9s'
               WHEN gap < 100 THEN '10-99s'
               WHEN gap < 1000 THEN '100-999s'
               WHEN gap < 10000 THEN '1000-9999s'
               ELSE '10000s+' END"""


@declared(
    "interevent_gap_bands",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT)
               - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id) AS gap
      FROM events
    ),
    banded AS (
      SELECT event_type, {_GAP_BAND_SQL} AS band
      FROM seq WHERE gap IS NOT NULL
    ),
    counts AS (
      SELECT event_type, band, CAST(count(*) AS BIGINT) AS n
      FROM banded GROUP BY event_type, band
    ),
    tot AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS t
      FROM counts GROUP BY event_type
    )
    SELECT c.event_type, c.band, c.n,
           CAST((1000000 * c.n) // t.t AS BIGINT) AS share_ppm
    FROM counts c JOIN tot t ON t.event_type = c.event_type
    """,
)
def interevent_gap_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decade-banded histogram of inter-arrival gaps per event type: the
    distribution view behind the one-number `interarrival_burstiness`
    (a bursty process shows mass at both tails; a metronome collapses
    into one band).  Fixed integer band edges (powers of ten, seconds)
    instead of floor(log10): float logs at exact boundaries round
    differently across engines, integer compares never do.

    One lag window per event_type (the burstiness pass shape), one
    combinable band count, and a per-type total join over the
    |types| x |bands| result -- bounded output, integer-ppm shares.
    At 100 TB the ordered window repartitions by (type, day) with a
    carried boundary row, same as its siblings.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.expr("unix_timestamp(ts)").alias("t_s"),
        "ts",
        "event_id",
    ).withColumn("gap", F.col("t_s") - F.lag("t_s").over(w))
    banded = seq.filter(F.col("gap").isNotNull()).select(
        "event_type", F.expr(_GAP_BAND_SQL).alias("band")
    )
    counts = banded.groupBy("event_type", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.groupBy("event_type").agg(F.sum("n").cast("bigint").alias("t"))
    return counts.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "band",
        "n",
        F.expr("CAST((1000000 * n) DIV t AS BIGINT)").alias("share_ppm"),
    )


@declared(
    "ewma_control_chart",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v
      FROM events
      GROUP BY event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    series AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(v) AS BIGINT) AS sv,
             list(CAST(v AS DOUBLE) ORDER BY day_idx) AS ys,
             list(day_idx ORDER BY day_idx) AS ds
      FROM daily GROUP BY event_type
    ),
    mr AS (
      SELECT a.event_type,
             CAST(sum(abs(b.v - a.v)) AS BIGINT) AS smr,
             CAST(count(*) AS BIGINT) AS nmr
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.day_idx = (
          SELECT min(c.day_idx) FROM daily c
          WHERE c.event_type = a.event_type AND c.day_idx > a.day_idx)
      GROUP BY a.event_type
    ),
    fold(event_type, i, e) AS (
      SELECT event_type, 1, ys[1] FROM series
      UNION ALL
      SELECT f.event_type, f.i + 1,
             0.2e0 * s.ys[f.i + 1] + 0.8e0 * f.e
      FROM fold f JOIN series s ON s.event_type = f.event_type
      WHERE f.i < s.n_days
    ),
    lim AS (
      SELECT s.event_type,
             CAST(s.sv AS DOUBLE) / CAST(s.n_days AS DOUBLE) AS mu,
             3.0e0 * ((CAST(m.smr AS DOUBLE) / CAST(m.nmr AS DOUBLE))
                      / 1.128e0)
               * sqrt(0.2e0 / 1.8e0) AS halfwidth
      FROM series s JOIN mr m ON m.event_type = s.event_type
    )
    SELECT f.event_type, s.ds[f.i] AS day_idx,
           s.ys[f.i] / 10000.0e0 AS y,
           f.e / 10000.0e0 AS ewma,
           (l.mu + l.halfwidth) / 10000.0e0 AS ucl,
           (l.mu - l.halfwidth) / 10000.0e0 AS lcl,
           f.e > l.mu + l.halfwidth OR f.e < l.mu - l.halfwidth
             AS out_of_control
    FROM fold f
    JOIN series s ON s.event_type = f.event_type
    JOIN lim l ON l.event_type = f.event_type
    """,
)
def ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over each event type's daily value series
    (lambda = 0.2, asymptotic 3-sigma limits): per day the smoothed
    statistic, the control band around the series mean, and the
    out-of-control flag -- the drift-sensitive sibling of the CUSUM
    changepoint op (`value_changepoint_cusum`): EWMA charts catch
    small persistent shifts that Shewhart-style per-point tests miss
    (Roberts 1959; NIST/SEMATECH 6.3.2.4).

    Process sigma comes from the moving range (MRbar / d2, d2 = 1.128
    -- the standard individuals-chart estimator), with MRbar an exact
    integer sum over consecutive-day absolute deltas; the asymptotic
    limit factor sqrt(lambda/(2-lambda)) avoids the per-i pow() whose
    cross-engine rounding is not guaranteed.  The EWMA itself is the
    repo's sequential-fold pattern (array fold emitting every prefix on
    the Spark side, recursive CTE in the oracle, identical '0.2e0'
    literals) -- bit-identical doubles.  Cost: one map-side-combinable
    daily rollup, then everything runs on calendar-bounded series.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("unix_timestamp(ts) DIV 86400").alias("day_idx"),
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("v")
    ).localCheckpoint(eager=True)  # series + moving-range consumers
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("v").cast("bigint").alias("sv"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day_idx", "v"))),
            lambda s: s.getField("v").cast("double"),
        ).alias("ys"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day_idx", "v"))),
            lambda s: s.getField("day_idx"),
        ).alias("ds"),
    )
    # Moving range over consecutive days: exact integer |delta| sums.
    wd = Window.partitionBy("event_type").orderBy("day_idx")
    mr = (
        daily.withColumn("pv", F.lag("v").over(wd))
        .filter(F.col("pv").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum(F.abs(F.col("v") - F.col("pv"))).cast("bigint").alias("smr"),
            F.count(F.lit(1)).cast("bigint").alias("nmr"),
        )
    )
    # Prefix EWMA: seed with ys[1], then e' = 0.2*y + 0.8*e per element.
    prefix = F.aggregate(
        F.slice(F.col("ys"), 2, F.size("ys") - 1),
        F.array(F.element_at(F.col("ys"), 1)),
        lambda acc, y: F.concat(
            acc, F.array(F.lit(0.2) * y + F.lit(0.8) * F.element_at(acc, -1))
        ),
    )
    folded = series.select(
        "event_type",
        "sv",
        "n_days",
        F.explode(
            F.arrays_zip(F.col("ds"), F.col("ys"), prefix.alias("e"))
        ).alias("z"),
    )
    mu = F.col("sv").cast("double") / F.col("n_days").cast("double")
    out = folded.join(F.broadcast(mr), "event_type").select(
        "event_type",
        F.col("z.ds").alias("day_idx"),
        (F.col("z.ys") / F.lit(10000.0)).alias("y"),
        (F.col("z.e") / F.lit(10000.0)).alias("ewma"),
        (
            (
                mu
                + F.lit(3.0)
                * (
                    (F.col("smr").cast("double") / F.col("nmr").cast("double"))
                    / F.lit(1.128)
                )
                * F.sqrt(F.lit(0.2) / F.lit(1.8))
            )
            / F.lit(10000.0)
        ).alias("ucl"),
        (
            (
                mu
                - F.lit(3.0)
                * (
                    (F.col("smr").cast("double") / F.col("nmr").cast("double"))
                    / F.lit(1.128)
                )
                * F.sqrt(F.lit(0.2) / F.lit(1.8))
            )
            / F.lit(10000.0)
        ).alias("lcl"),
        (
            (
                F.col("z.e")
                > mu
                + F.lit(3.0)
                * (
                    (F.col("smr").cast("double") / F.col("nmr").cast("double"))
                    / F.lit(1.128)
                )
                * F.sqrt(F.lit(0.2) / F.lit(1.8))
            )
            | (
                F.col("z.e")
                < mu
                - F.lit(3.0)
                * (
                    (F.col("smr").cast("double") / F.col("nmr").cast("double"))
                    / F.lit(1.128)
                )
                * F.sqrt(F.lit(0.2) / F.lit(1.8))
            )
        ).alias("out_of_control"),
    )
    return out


@declared(
    "mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    s_stat AS (
      SELECT CAST(sum(CASE WHEN b.v_s > a.v_s THEN 1
                           WHEN b.v_s < a.v_s THEN -1 ELSE 0 END)
                  AS BIGINT) AS s
      FROM daily a JOIN daily b ON b.day_idx > a.day_idx
    ),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT count(*) AS t FROM daily GROUP BY v_s) g
      WHERE t > 1
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
    SELECT n, s,
           CAST(n * (n - 1) * (2 * n + 5) - tie_term AS BIGINT) AS var18,
           z, abs(z) > 1.96e0 AS significant
    FROM (
      SELECT nn.n, st.s, ti.tie_term,
             CASE WHEN st.s > 0 THEN
               CAST(st.s - 1 AS DOUBLE)
               / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                           - ti.tie_term AS DOUBLE) / 18.0e0)
             WHEN st.s < 0 THEN
               CAST(st.s + 1 AS DOUBLE)
               / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                           - ti.tie_term AS DOUBLE) / 18.0e0)
             ELSE 0.0e0 END AS z
      FROM nn CROSS JOIN s_stat st CROSS JOIN ties ti
    )
    """,
)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test on the daily value series: S =
    sum over day pairs of sign(later - earlier), the tie-corrected
    variance n(n-1)(2n+5)/18 - sum t(t-1)(2t+5)/18, and the
    continuity-corrected z -- the standard distribution-free "is this
    metric drifting" detector (Mann 1945, Kendall 1975) that pairs with
    `theil_sen_daily_trend` (MK decides IF there is a trend, Theil-Sen
    sizes it).

    S, the tie term, and var18 (the variance numerator, kept *18 so it
    stays integer) are exact bigints; z is one fixed float expression
    (a division by an IEEE sqrt of an exactly-represented integer / 18)
    written identically in the oracle, so it hash-matches.  The day
    pair join is quadratic in DISTINCT DAYS -- calendar-bounded, never
    data-bounded (the `theil_sen` posture); the daily frame is
    localCheckpointed once for its three consumers (pair join x2 sides,
    tie count, n).
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
        .localCheckpoint(eager=True)  # pair join both sides + ties + n
    )
    a = daily.select(F.col("day_idx").alias("da"), F.col("v_s").alias("va"))
    b = daily.select(F.col("day_idx").alias("db"), F.col("v_s").alias("vb"))
    s_stat = (
        a.join(b.hint("shuffle_hash"), F.col("db") > F.col("da"))
        .agg(
            F.sum(
                F.when(F.col("vb") > F.col("va"), 1)
                .when(F.col("vb") < F.col("va"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("v_s")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    joined = (
        F.broadcast(nn)
        .crossJoin(F.broadcast(s_stat))
        .crossJoin(F.broadcast(ties))
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    )
    sd = F.sqrt(var18.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        "n",
        "s",
        var18.cast("bigint").alias("var18"),
        z.alias("z"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


@declared(
    "acf_daily_lags",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(v_s AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(v_s AS HUGEINT) * v_s) AS HUGEINT) AS q
      FROM daily
    ),
    pairs AS (
      SELECT lg.lag AS lag,
             CAST(count(*) AS HUGEINT) AS cnt,
             CAST(sum(CAST(a.v_s AS HUGEINT) * b.v_s) AS HUGEINT) AS sab,
             CAST(sum(CAST(a.v_s AS HUGEINT)) AS HUGEINT) AS sa,
             CAST(sum(CAST(b.v_s AS HUGEINT)) AS HUGEINT) AS sb
      FROM generate_series(1, 7) AS lg(lag)
      JOIN daily a ON true
      JOIN daily b ON b.day_idx = a.day_idx + lg.lag
      GROUP BY lg.lag
    )
    SELECT CAST(p.lag AS INT) AS lag, CAST(p.cnt AS BIGINT) AS n_pairs,
           CAST(m.n * m.n * p.sab - m.n * m.s * (p.sa + p.sb)
                + p.cnt * m.s * m.s AS DOUBLE)
           / CAST(m.n * m.n * m.q - m.n * m.s * m.s AS DOUBLE) AS acf
    FROM pairs p CROSS JOIN mom m
    WHERE m.n * m.n * m.q - m.n * m.s * m.s > 0
    """,
)
def acf_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the overall daily value series at lags
    1..7 -- the full weekly ACF profile that generalizes the per-type
    `daily_value_autocorr_lag1` spot check: a spike at lag 7 confirms
    weekly seasonality (what `dow_seasonality_lift` asserts piecewise),
    slow decay says trend (what `mann_kendall_trend` tests).

    Exactness: the classic ACF r_k = sum_(t)(x_t-xbar)(x_(t+k)-xbar) /
    sum(x-xbar)^2 is cleared of the rational mean by multiplying both
    sides by n^2: numerator n^2*sab - n*S*(sa+sb) + cnt*S^2, denominator
    n^2*Q - n*S^2 -- every term an exact integer (DECIMAL(38,0); daily
    sums-of-squares exceed int64 at sf0.1 already), so acf is ONE float
    division of two exact integers, identical in the oracle.  Envelope:
    n^2*Q < 1e38 holds to ~1e9-day series with 1e14-scaled daily sums.

    Cost: one events scan -> calendar-bounded daily frame
    (localCheckpointed: moments + both pair-join sides), then
    broadcast-joined lag pairs over <=365*7 rows.  Everything after the
    first aggregation is calendar-bounded, never data-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
        .localCheckpoint(eager=True)  # moments + pair-join a + b sides
    )
    dec = "decimal(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("v_s").cast(dec)).cast(dec).alias("s"),
        F.sum(F.col("v_s").cast(dec) * F.col("v_s")).cast(dec).alias("q"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day_idx").alias("da"), F.col("v_s").alias("va"))
    b = daily.select(F.col("day_idx").alias("db"), F.col("v_s").alias("vb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("cnt"),
            F.sum(F.col("va").cast(dec) * F.col("vb")).cast(dec).alias("sab"),
            F.sum(F.col("va").cast(dec)).cast(dec).alias("sa"),
            F.sum(F.col("vb").cast(dec)).cast(dec).alias("sb"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("sab")
        - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("cnt") * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    return (
        pairs.crossJoin(F.broadcast(mom))
        .filter(den > 0)
        .select(
            F.col("lag").cast("int").alias("lag"),
            F.col("cnt").cast("bigint").alias("n_pairs"),
            (num.cast("double") / den.cast("double")).alias("acf"),
        )
    )


@declared(
    "pareto_revenue_share",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev_c,
             CAST(row_number() OVER (ORDER BY rev_c DESC, o_custkey)
                  AS BIGINT) AS rn,
             CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_c,
             CAST(sum(rev_c) OVER () AS BIGINT) AS total_c
      FROM rev
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(CASE WHEN 5 * cum_c >= 4 * total_c THEN rn END)
                AS BIGINT) AS n_top80,
           CAST((1000000 * min(CASE WHEN 5 * cum_c >= 4 * total_c
                                    THEN rn END)) // count(*)
                AS BIGINT) AS top80_ppm
    FROM ranked
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue concentration: the smallest number of
    customers -- ranked by lifetime order revenue -- whose cumulative
    revenue reaches 80% of the total, and that count as ppm of the
    customer base.  The single-number "how top-heavy is demand" readout
    that complements `source_coverage_concentration`'s HHI (which has no
    threshold semantics) and the RFM segmentations (which bucket, not
    rank-accumulate).

    Integer-exact throughout: revenue in cents, the 80% threshold as the
    cross-multiplied 5*cum >= 4*total (no float share), ppm by integer
    floor-division on positive counts.  Envelope: 5*total_cents < 2^63
    to ~1.8e18 cents (~1e16 USD).

    Cost: one orders scan -> per-customer partial+final agg, then an
    ordered window over the AGGREGATED customer dimension.  The rank
    window is single-partition over |customers| rows -- the accepted
    concentration-family posture; at extreme scale swap the exact rank
    for the `equidepth_value_bands` quantile grid and take the band
    containing the 80% crossing.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("r_c"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("r_c").cast("bigint").alias("rev_c"))
    )
    w = Window.orderBy(F.col("rev_c").desc(), F.col("o_custkey"))
    ranked = rev.select(
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum("rev_c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_c"),
        F.sum("rev_c").over(Window.partitionBy()).cast("bigint").alias("total_c"),
    )
    hit = F.when(5 * F.col("cum_c") >= 4 * F.col("total_c"), F.col("rn"))
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.min(hit).cast("bigint").alias("n_top80"),
        F.expr(
            "CAST((1000000 * min(CASE WHEN 5 * cum_c >= 4 * total_c"
            "                         THEN rn END)) DIV count(*) AS BIGINT)"
        ).alias("top80_ppm"),
    )


@declared(
    "clamped_running_balance",
    oracle="""
    WITH RECURSIVE ev AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 10000) AS BIGINT)
                  ELSE -CAST(round(value * 10000) AS BIGINT) END AS d,
             ts, event_id
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    arr AS (
      SELECT user_id, list(d ORDER BY ts, event_id) AS ds,
             CAST(count(*) AS BIGINT) AS m
      FROM ev GROUP BY user_id
    ),
    fold(user_id, i, bal, clamps) AS (
      SELECT user_id, CAST(1 AS BIGINT),
             CASE WHEN ds[1] < 0 THEN CAST(0 AS BIGINT) ELSE ds[1] END,
             CASE WHEN ds[1] < 0 THEN CAST(1 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END
      FROM arr
      UNION ALL
      SELECT f.user_id, f.i + 1,
             CASE WHEN f.bal + a.ds[f.i + 1] < 0 THEN 0
                  ELSE f.bal + a.ds[f.i + 1] END,
             f.clamps + CASE WHEN f.bal + a.ds[f.i + 1] < 0 THEN 1
                             ELSE 0 END
      FROM fold f JOIN arr a USING (user_id) WHERE f.i < a.m
    )
    SELECT f.user_id, f.bal AS balance_s, f.clamps AS n_clamps,
           CAST(f.bal AS DOUBLE) / 10000.0e0 AS balance
    FROM fold f JOIN arr a USING (user_id) WHERE f.i = a.m
    """,
)
def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user clamped running balance: purchases credit `value`,
    errors debit it, and the balance CLAMPS AT ZERO after every step
    (inventory / prepaid-credit semantics: you cannot go negative, and
    lost debit is gone even if credit arrives later).  Emits each
    user's final balance and how often the clamp fired.

    This is the canonical NON-LINEAR fold that plain window functions
    cannot express -- max(0, prev + delta) does not decompose into a
    cumulative sum (the clamp erases history), so it needs a true
    sequential fold: Spark runs F.aggregate over each user's
    time-ordered delta array (the `ema_user_value` shape with a
    two-component integer state), the oracle advances every user one
    step per recursive-CTE iteration (NOT list_reduce -- the documented
    struct-accumulator trap).  All-integer state on 1e4-scaled values,
    so the fold is bit-exact cross-engine; the only float is the final
    display division, identical on both sides.

    Cost: one events scan, one shuffle on user_id into per-user sorted
    arrays (array length = that user's purchase+error count -- bounded
    by per-user activity, the `user_event_sequences` hot-key caveat
    applies), then a map-side fold.  Recursion depth on the oracle side
    is max per-user length, rows |users| per step.
    """
    ev = load_table(spark, sf_dir, "events")
    rows_in = ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 10000).cast("bigint"),
        )
        .otherwise(-F.round(F.col("value") * 10000).cast("bigint"))
        .alias("d"),
    )
    arr = rows_in.groupBy("user_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "d"))),
            lambda s: s["d"],
        ).alias("ds")
    )
    folded = arr.select(
        "user_id",
        F.aggregate(
            "ds",
            F.struct(
                F.lit(0).cast("bigint").alias("bal"),
                F.lit(0).cast("bigint").alias("clamps"),
            ),
            lambda acc, x: F.struct(
                F.greatest(acc["bal"] + x, F.lit(0).cast("bigint")).alias(
                    "bal"
                ),
                (
                    acc["clamps"]
                    + F.when(acc["bal"] + x < 0, 1).otherwise(0)
                ).alias("clamps"),
            ),
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        F.col("st.bal").alias("balance_s"),
        F.col("st.clamps").alias("n_clamps"),
        (F.col("st.bal").cast("double") / F.lit(10000.0)).alias("balance"),
    )


@declared(
    "seasonal_decompose_additive",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    tr AS (
      SELECT day_idx, v_s,
             CAST(sum(v_s) OVER wnd AS BIGINT) AS trend7_s,
             CAST(count(*) OVER wnd AS BIGINT) AS wcnt
      FROM daily
      WINDOW wnd AS (ORDER BY day_idx ROWS BETWEEN 3 PRECEDING
                     AND 3 FOLLOWING)
    ),
    det AS (
      SELECT day_idx, v_s, trend7_s,
             (day_idx + 4) % 7 AS wd,
             7 * v_s - trend7_s AS det7
      FROM tr WHERE wcnt = 7
    ),
    seas AS (
      SELECT wd, CAST(sum(det7) AS BIGINT) AS s7_num,
             CAST(count(*) AS BIGINT) AS s7_cnt
      FROM det GROUP BY wd
    )
    SELECT d.day_idx,
           CAST(d.v_s AS DOUBLE) / 10000.0e0 AS value,
           CAST(d.trend7_s AS DOUBLE) / 70000.0e0 AS trend,
           CAST(s.s7_num AS DOUBLE)
             / (70000.0e0 * CAST(s.s7_cnt AS DOUBLE)) AS seasonal,
           CAST(d.det7 AS DOUBLE) / 70000.0e0
             - CAST(s.s7_num AS DOUBLE)
               / (70000.0e0 * CAST(s.s7_cnt AS DOUBLE)) AS residual
    FROM det d JOIN seas s USING (wd)
    """,
)
def seasonal_decompose_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily value
    series: trend = 7-day centered moving average (interior days only --
    the window must be full), seasonal = per-weekday mean of the
    detrended series, residual = the rest.  The decomposition behind
    every "is this dip seasonal or real" judgment; its pieces feed the
    simpler declared ops (`dow_seasonality_lift` is the seasonal
    component as a ratio; `seasonal_naive_forecast_error` assumes what
    this measures).  Weekday is the portable (days+4)%7 formula.

    Exactness: the mov-avg denominator is cleared by carrying 7x-scaled
    integers (trend7_s = the 7-day sum; det7 = 7*v - trend7_s), and the
    per-weekday mean stays a (sum, count) integer pair -- every stored
    quantity is an exact bigint, and the three output doubles are fixed
    float expressions of those integers (value/1e4, trend7/7e4,
    s7_num/(7e4*cnt)), written identically in the oracle.  No integer
    division anywhere, so no trunc-vs-floor hazard on the negative
    detrended values.

    Cost: one events scan -> calendar-bounded daily frame; the centered
    window, weekday rollup, and join-back are all over <=|days| rows
    (the weekday dim is broadcast).  Single-partition ordered window
    over the day series -- calendar-bounded, never data-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
    )
    wnd = Window.orderBy("day_idx").rowsBetween(-3, 3)
    tr = daily.select(
        "day_idx",
        "v_s",
        F.sum("v_s").over(wnd).cast("bigint").alias("trend7_s"),
        F.count(F.lit(1)).over(wnd).cast("bigint").alias("wcnt"),
    )
    det = tr.filter(F.col("wcnt") == 7).select(
        "day_idx",
        "v_s",
        "trend7_s",
        ((F.col("day_idx") + 4) % 7).alias("wd"),
        (7 * F.col("v_s") - F.col("trend7_s")).alias("det7"),
    )
    # det feeds the weekday rollup and the final join -- checkpoint once;
    # stat-less after checkpoint, so the tiny seasonal dim is broadcast.
    det = det.localCheckpoint(eager=True)
    seas = det.groupBy("wd").agg(
        F.sum("det7").cast("bigint").alias("s7_num"),
        F.count(F.lit(1)).cast("bigint").alias("s7_cnt"),
    )
    seasonal = F.col("s7_num").cast("double") / (
        F.lit(70000.0) * F.col("s7_cnt").cast("double")
    )
    return det.join(F.broadcast(seas), "wd").select(
        "day_idx",
        (F.col("v_s").cast("double") / F.lit(10000.0)).alias("value"),
        (F.col("trend7_s").cast("double") / F.lit(70000.0)).alias("trend"),
        seasonal.alias("seasonal"),
        (F.col("det7").cast("double") / F.lit(70000.0) - seasonal).alias(
            "residual"
        ),
    )


@declared(
    "item_cooccurrence_similarity",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    cnt AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM op GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b,
             CAST(count(*) AS BIGINT) AS cooc
      FROM op a JOIN op b ON b.ok = a.ok AND b.pk > a.pk
      GROUP BY a.pk, b.pk
    ),
    scored AS (
      SELECT p.part_a, p.part_b, p.cooc, ca.n AS n_a, cb.n AS n_b,
             CAST(p.cooc AS DOUBLE)
               / sqrt(CAST(ca.n * cb.n AS DOUBLE)) AS cosine
      FROM pairs p
      JOIN cnt ca ON ca.pk = p.part_a
      JOIN cnt cb ON cb.pk = p.part_b
    )
    SELECT part_a, part_b, cooc, n_a, n_b, cosine
    FROM (
      SELECT *, row_number() OVER (ORDER BY cosine DESC, part_a, part_b)
               AS rnk
      FROM scored
    ) WHERE rnk <= 20
    """,
)
def item_cooccurrence_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering scores: cosine similarity on
    order co-occurrence -- cooc(a,b)/sqrt(n_a*n_b) over the binary
    part-x-order incidence -- reported as the global top-20 pairs.  The
    "customers who bought X also bought Y" primitive (Linden et al.
    2003), and the part-level refinement of `brand_affinity_lift`
    (lift vs cosine, 25 brands vs the full part dim).

    Pair fan-out is bounded by ORDER WIDTH (4-7 items), never by the
    part count: the distinct incidence self-joins on l_orderkey, so each
    order contributes ~width^2/2 pairs -- linear in orders at any scale.
    Counts are exact integers; cosine is one float division of exact
    integers (identical expression in the oracle) and the top-20 is
    total-ordered by (cosine, part_a, part_b).

    Plan: one lineitem scan -> distinct incidence (localCheckpointed:
    self-join both sides + part counts), shuffle-hash self-join, then
    two broadcast joins of the part-count dim.
    """
    li = load_table(spark, sf_dir, "lineitem")
    op = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
        .localCheckpoint(eager=True)  # self-join sides + count dim
    )
    cnt = op.groupBy("pk").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = op.select("ok", F.col("pk").alias("part_a"))
    bb = op.select("ok", F.col("pk").alias("part_b"))
    pairs = (
        a.join(bb.hint("shuffle_hash"), "ok")
        .filter(F.col("part_b") > F.col("part_a"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cooc"))
    )
    scored = (
        pairs.join(
            F.broadcast(cnt.select(F.col("pk").alias("part_a"), F.col("n").alias("n_a"))),
            "part_a",
        )
        .join(
            F.broadcast(cnt.select(F.col("pk").alias("part_b"), F.col("n").alias("n_b"))),
            "part_b",
        )
        .select(
            "part_a",
            "part_b",
            "cooc",
            "n_a",
            "n_b",
            (
                F.col("cooc").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("part_a"), F.asc("part_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("part_a", "part_b", "cooc", "n_a", "n_b", "cosine")
    )


@declared(
    "ljung_box_whiteness",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(v_s AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(v_s AS HUGEINT) * v_s) AS HUGEINT) AS q
      FROM daily
    ),
    pairs AS (
      SELECT lg.lag AS lag,
             CAST(count(*) AS HUGEINT) AS cnt,
             CAST(sum(CAST(a.v_s AS HUGEINT) * b.v_s) AS HUGEINT) AS sab,
             CAST(sum(CAST(a.v_s AS HUGEINT)) AS HUGEINT) AS sa,
             CAST(sum(CAST(b.v_s AS HUGEINT)) AS HUGEINT) AS sb
      FROM generate_series(1, 7) AS lg(lag)
      JOIN daily a ON true
      JOIN daily b ON b.day_idx = a.day_idx + lg.lag
      GROUP BY lg.lag
    ),
    rs AS (
      SELECT m.n,
             max(CASE WHEN p.lag = 1 THEN r END) AS r1,
             max(CASE WHEN p.lag = 2 THEN r END) AS r2,
             max(CASE WHEN p.lag = 3 THEN r END) AS r3,
             max(CASE WHEN p.lag = 4 THEN r END) AS r4,
             max(CASE WHEN p.lag = 5 THEN r END) AS r5,
             max(CASE WHEN p.lag = 6 THEN r END) AS r6,
             max(CASE WHEN p.lag = 7 THEN r END) AS r7
      FROM (
        SELECT p.lag,
               CAST(m.n * m.n * p.sab - m.n * m.s * (p.sa + p.sb)
                    + p.cnt * m.s * m.s AS DOUBLE)
               / CAST(m.n * m.n * m.q - m.n * m.s * m.s AS DOUBLE) AS r
        FROM pairs p CROSS JOIN mom m
        WHERE m.n * m.n * m.q - m.n * m.s * m.s > 0
      ) p CROSS JOIN mom m
      GROUP BY m.n
    )
    SELECT CAST(n AS BIGINT) AS n_days, q_stat,
           q_stat > 14.067e0 AS reject_whiteness
    FROM (
      SELECT n,
             CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0e0)
             * (r1 * r1 / CAST(n - 1 AS DOUBLE)
                + r2 * r2 / CAST(n - 2 AS DOUBLE)
                + r3 * r3 / CAST(n - 3 AS DOUBLE)
                + r4 * r4 / CAST(n - 4 AS DOUBLE)
                + r5 * r5 / CAST(n - 5 AS DOUBLE)
                + r6 * r6 / CAST(n - 6 AS DOUBLE)
                + r7 * r7 / CAST(n - 7 AS DOUBLE)) AS q_stat
      FROM rs
      WHERE r1 IS NOT NULL AND r2 IS NOT NULL AND r3 IS NOT NULL
        AND r4 IS NOT NULL AND r5 IS NOT NULL AND r6 IS NOT NULL
        AND r7 IS NOT NULL
    )
    """,
)
def ljung_box_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test on the daily value series, lags 1-7:
    Q = n(n+2) * sum r_k^2/(n-k), rejected against the chi-square(7)
    95% critical value 14.067 -- the one-number "is there ANY serial
    structure" gate that summarizes what `acf_daily_lags` shows per lag
    (and the whiteness check to run before trusting
    `seasonal_naive_forecast_error`'s baseline).

    Exactness: each r_k is the `acf_daily_lags` single float division of
    two exact integers; Q then assembles the seven r_k in one FIXED
    left-to-right expression (conditional-aggregated into columns first
    -- never a float SUM over rows, which is partial-agg
    order-dependent).  The identical expression runs on both engines,
    so Q hash-matches.  Series shorter than 8 days (any lag missing)
    drop the row identically on both sides.

    Cost: one events scan -> calendar-bounded daily frame
    (localCheckpointed: moments + both pair-join sides), broadcast lag
    pairs, then a 7-row pivot -- everything after the first aggregation
    is calendar-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
        .localCheckpoint(eager=True)  # moments + pair-join a + b sides
    )
    dec = "decimal(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("v_s").cast(dec)).cast(dec).alias("s"),
        F.sum(F.col("v_s").cast(dec) * F.col("v_s")).cast(dec).alias("q"),
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day_idx").alias("da"), F.col("v_s").alias("va"))
    b = daily.select(F.col("day_idx").alias("db"), F.col("v_s").alias("vb"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("cnt"),
            F.sum(F.col("va").cast(dec) * F.col("vb")).cast(dec).alias("sab"),
            F.sum(F.col("va").cast(dec)).cast(dec).alias("sa"),
            F.sum(F.col("vb").cast(dec)).cast(dec).alias("sb"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("sab")
        - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("cnt") * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    rlag = (
        pairs.crossJoin(F.broadcast(mom))
        .filter(den > 0)
        .select("lag", "n", (num.cast("double") / den.cast("double")).alias("r"))
    )
    rs = rlag.groupBy("n").agg(
        *[
            F.max(F.when(F.col("lag") == k, F.col("r"))).alias(f"r{k}")
            for k in range(1, 8)
        ]
    )
    nd = F.col("n").cast("double")
    qsum = None
    for k in range(1, 8):
        term = F.col(f"r{k}") * F.col(f"r{k}") / (F.col("n") - k).cast("double")
        qsum = term if qsum is None else qsum + term
    q_stat = nd * (nd + F.lit(2.0)) * qsum
    cond = None
    for k in range(1, 8):
        c = F.col(f"r{k}").isNotNull()
        cond = c if cond is None else (cond & c)
    return rs.filter(cond).select(
        F.col("n").cast("bigint").alias("n_days"),
        q_stat.alias("q_stat"),
        (q_stat > F.lit(14.067)).alias("reject_whiteness"),
    )


@declared(
    "runs_test_daily_direction",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    diffs AS (
      SELECT day_idx,
             CASE WHEN v_s > lag(v_s) OVER (ORDER BY day_idx) THEN 1
                  WHEN v_s < lag(v_s) OVER (ORDER BY day_idx) THEN -1
             END AS sgn
      FROM daily
    ),
    sgns AS (
      SELECT day_idx, sgn,
             lag(sgn) OVER (ORDER BY day_idx) AS prev_sgn
      FROM diffs WHERE sgn IS NOT NULL
    ),
    agg AS (
      SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(1 + sum(CASE WHEN prev_sgn IS NOT NULL
                               AND sgn <> prev_sgn THEN 1 ELSE 0 END)
                  AS BIGINT) AS runs
      FROM sgns
    )
    SELECT n1, n2, runs, z, abs(z) > 1.96e0 AS significant
    FROM (
      SELECT n1, n2, runs,
             (CAST(runs AS DOUBLE)
              - (1.0e0 + 2.0e0 * CAST(n1 * n2 AS DOUBLE)
                         / CAST(n1 + n2 AS DOUBLE)))
             / sqrt(2.0e0 * CAST(n1 * n2 AS DOUBLE)
                    * (2.0e0 * CAST(n1 * n2 AS DOUBLE)
                       - CAST(n1 + n2 AS DOUBLE))
                    / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                       * CAST(n1 + n2 - 1 AS DOUBLE))) AS z
      FROM agg WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    )
    """,
)
def runs_test_daily_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the direction of day-over-day moves
    of the daily value total: too FEW runs of consecutive ups/downs
    means trending/sticky, too MANY means oscillating -- the
    distribution-free randomness check that completes the
    `mann_kendall_trend` / `ljung_box_whiteness` diagnostic trio (MK
    asks "monotone?", LB "any serial correlation?", runs "random sign
    sequence?").  Zero-change days are dropped, identically.

    Counts (n1 ups, n2 downs, runs = 1 + sign changes) are exact
    integers off two lag windows over the calendar-bounded day series;
    z assembles E[R] = 1 + 2*n1*n2/n and Var[R] in ONE fixed float
    expression of those integers, written identically in the oracle.

    Cost: one events scan -> daily frame; everything after is a
    single-partition window over <=|days| rows -- calendar-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
    )
    wd = Window.orderBy("day_idx")
    diffs = daily.select(
        "day_idx",
        F.when(F.col("v_s") > F.lag("v_s").over(wd), 1)
        .when(F.col("v_s") < F.lag("v_s").over(wd), -1)
        .alias("sgn"),
    )
    sgns = diffs.filter(F.col("sgn").isNotNull()).select(
        "day_idx", "sgn", F.lag("sgn").over(wd).alias("prev_sgn")
    )
    agg = sgns.agg(
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev_sgn").isNotNull()
                    & (F.col("sgn") != F.col("prev_sgn")),
                    1,
                ).otherwise(0)
            )
        )
        .cast("bigint")
        .alias("runs"),
    )
    nn = (F.col("n1") + F.col("n2")).cast("double")
    n12 = (F.col("n1") * F.col("n2")).cast("double")
    er = F.lit(1.0) + F.lit(2.0) * n12 / nn
    varr = (
        F.lit(2.0)
        * n12
        * (F.lit(2.0) * n12 - nn)
        / (nn * nn * (F.col("n1") + F.col("n2") - 1).cast("double"))
    )
    z = (F.col("runs").cast("double") - er) / F.sqrt(varr)
    return agg.filter(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1)
    ).select(
        "n1",
        "n2",
        "runs",
        z.alias("z"),
        (F.abs(z) > F.lit(1.96)).alias("significant"),
    )


@declared(
    "hysteresis_alarm_days",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    arr AS (
      SELECT list(v_s ORDER BY day_idx) AS vs,
             list(v_s ORDER BY v_s) AS sorted_vs,
             CAST(count(*) AS BIGINT) AS m
      FROM daily
    ),
    med AS (
      SELECT vs, m, sorted_vs[CAST((m + 1) // 2 AS INT)] AS med_s FROM arr
    ),
    thr AS (
      SELECT vs, m, med_s,
             CAST((11 * med_s) // 10 AS BIGINT) AS hi_s,
             CAST((9 * med_s) // 10 AS BIGINT) AS lo_s
      FROM med
    ),
    fold(i, in_alarm, episodes, alarm_days) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT)
      UNION ALL
      SELECT f.i + 1,
             CASE WHEN f.in_alarm = 0 AND t.vs[CAST(f.i + 1 AS INT)] > t.hi_s
                    THEN 1
                  WHEN f.in_alarm = 1 AND t.vs[CAST(f.i + 1 AS INT)] < t.lo_s
                    THEN 0
                  ELSE f.in_alarm END,
             f.episodes
               + CASE WHEN f.in_alarm = 0
                        AND t.vs[CAST(f.i + 1 AS INT)] > t.hi_s
                      THEN 1 ELSE 0 END,
             f.alarm_days
               + CASE WHEN f.in_alarm = 0 AND t.vs[CAST(f.i + 1 AS INT)] > t.hi_s
                      THEN 1
                      WHEN f.in_alarm = 1 AND t.vs[CAST(f.i + 1 AS INT)] < t.lo_s
                      THEN 0
                      ELSE f.in_alarm END
      FROM fold f JOIN thr t ON TRUE WHERE f.i < t.m
    )
    SELECT t.m AS n_days, t.med_s, t.hi_s, t.lo_s,
           f.episodes, f.alarm_days
    FROM fold f JOIN thr t ON f.i = t.m
    """,
)
def hysteresis_alarm_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hysteresis alerting replay over the daily value series: the alarm
    ENTERS when a day's total exceeds 110% of the series median and only
    EXITS when it drops below 90% -- the two-threshold latch every
    monitoring system uses to stop threshold-flapping (a single
    threshold re-alerts on every boundary wiggle; compare
    `ewma_control_chart`, which flags points, not episodes).  Emits the
    episode count and total days in alarm.

    Like `clamped_running_balance`, the latch is a history-erasing
    NON-LINEAR fold no window function expresses: Spark folds the
    day-ordered integer array with a (state, episodes, alarm_days)
    accumulator; the oracle advances a recursive CTE one day per step
    (multi-component state -- the documented reason list_reduce is
    unusable here).  The median threshold is the exact lower-median
    element of the value-sorted array; everything is integer, so the
    replay is bit-identical cross-engine.

    Cost: one events scan -> calendar-bounded daily frame; the fold
    runs over <=|days| elements in one driver-free projection.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
    )
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day_idx", "v_s"))),
            lambda s: s["v_s"],
        ).alias("vs"),
        F.array_sort(F.collect_list("v_s")).alias("sorted_vs"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    thr = arr.select(
        "vs",
        "m",
        F.expr("element_at(sorted_vs, CAST((m + 1) DIV 2 AS INT))").alias(
            "med_s"
        ),
    ).select(
        "vs",
        "m",
        "med_s",
        F.expr("CAST((11 * med_s) DIV 10 AS BIGINT)").alias("hi_s"),
        F.expr("CAST((9 * med_s) DIV 10 AS BIGINT)").alias("lo_s"),
    )
    folded = thr.select(
        "m",
        "med_s",
        "hi_s",
        "lo_s",
        F.aggregate(
            "vs",
            F.struct(
                F.lit(0).cast("bigint").alias("in_alarm"),
                F.lit(0).cast("bigint").alias("episodes"),
                F.lit(0).cast("bigint").alias("alarm_days"),
            ),
            lambda acc, x: F.struct(
                F.when(
                    (acc["in_alarm"] == 0) & (x > F.col("hi_s")), F.lit(1).cast("bigint")
                )
                .when(
                    (acc["in_alarm"] == 1) & (x < F.col("lo_s")), F.lit(0).cast("bigint")
                )
                .otherwise(acc["in_alarm"])
                .alias("in_alarm"),
                (
                    acc["episodes"]
                    + F.when(
                        (acc["in_alarm"] == 0) & (x > F.col("hi_s")), 1
                    ).otherwise(0)
                ).alias("episodes"),
                (
                    acc["alarm_days"]
                    + F.when(
                        (acc["in_alarm"] == 0) & (x > F.col("hi_s")),
                        F.lit(1).cast("bigint"),
                    )
                    .when(
                        (acc["in_alarm"] == 1) & (x < F.col("lo_s")),
                        F.lit(0).cast("bigint"),
                    )
                    .otherwise(acc["in_alarm"])
                ).alias("alarm_days"),
            ),
        ).alias("st"),
    )
    return folded.select(
        F.col("m").alias("n_days"),
        "med_s",
        "hi_s",
        "lo_s",
        F.col("st.episodes").alias("episodes"),
        F.col("st.alarm_days").alias("alarm_days"),
    )


@declared(
    "shapley_attribution",
    oracle="""
    WITH firstp AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
      FROM events GROUP BY 1, 2
    ),
    touched AS (
      SELECT f.user_id, f.day,
             CASE WHEN f.p_ts IS NOT NULL THEN 1 ELSE 0 END AS conv,
             CAST(coalesce(sum(DISTINCT
               CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                                 WHEN 'signup' THEN 4 WHEN 'view' THEN 8
               END), 0) AS BIGINT) AS mask
      FROM firstp f
      LEFT JOIN events e ON e.user_id = f.user_id
                        AND CAST(floor(epoch(e.ts)) AS BIGINT) // 86400
                            = f.day
                        AND e.event_type <> 'purchase'
                        AND (f.p_ts IS NULL OR e.ts < f.p_ts)
      GROUP BY 1, 2, 3
    ),
    stats AS (
      SELECT mask, CAST(count(*) AS BIGINT) AS users,
             CAST(sum(conv) AS BIGINT) AS convs
      FROM touched GROUP BY mask
    ),
    grid AS (
      SELECT g.m AS mask,
             coalesce(s.users, 0) AS users, coalesce(s.convs, 0) AS convs,
             CASE WHEN coalesce(s.users, 0) > 0
                  THEN CAST(s.convs AS DOUBLE) / CAST(s.users AS DOUBLE)
                  ELSE 0.0e0 END AS v
      FROM generate_series(0, 15) AS g(m)
      LEFT JOIN stats s ON s.mask = g.m
    ),
    channels AS (
      SELECT * FROM (VALUES (1, 'click'), (2, 'error'),
                            (4, 'signup'), (8, 'view')) c(bit, channel)
    ),
    terms AS (
      SELECT c.channel, g0.mask,
             (CASE bit_count(g0.mask)
                WHEN 0 THEN 6.0e0 / 24.0e0
                WHEN 1 THEN 2.0e0 / 24.0e0
                WHEN 2 THEN 2.0e0 / 24.0e0
                ELSE 6.0e0 / 24.0e0 END) * (g1.v - g0.v) AS term
      FROM channels c
      JOIN grid g0 ON (g0.mask & c.bit) = 0
      JOIN grid g1 ON g1.mask = (g0.mask | c.bit)
    ),
    folded AS (
      SELECT channel, CAST(count(*) AS BIGINT) AS n_terms,
             list_reduce(list(term ORDER BY mask), (a, b) -> a + b) AS phi
      FROM terms GROUP BY channel
    )
    SELECT channel, n_terms, phi FROM folded
    """,
)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value conversion attribution over the four non-purchase
    channels: each user's PRE-FIRST-PURCHASE touchset is a 4-bit
    coalition, v(S) = observed conversion rate of users with exactly
    that touchset (unobserved coalitions contribute v=0, the standard
    simplified-Shapley convention in marketing attribution), and each
    channel's credit is the exact Shapley sum phi_i = sum_(S not
    containing i) |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)) -- the
    axiomatically fair split of conversion credit that first/last-touch
    (`conversion_attribution`) provably distorts (Shapley 1953; Zhao et
    al. 2018).

    The coalition lattice is 2^4 = 16 masks -- DIMENSION-bounded, so
    the whole Shapley computation after the one per-user pass is free
    at any corpus scale (channels would cap ~20 before 2^n bites; then
    you sample permutations).  v and the factorial weights are
    identical fixed float expressions; each channel's 8 marginal terms
    are summed by an ORDERED list fold (never an unordered float sum
    -- the `neyman_allocation` discipline), seeded with the first
    element to mirror DuckDB's list_reduce.

    Cost: one events scan -> per-user-day (conv, touchset bitmask)
    aggregate (the DISTINCT-sum builds the mask without a second
    explode), one 16-row rollup, then broadcast lattice joins.
    """
    ev = load_table(spark, sf_dir, "events")
    firstp = ev.groupBy(
        "user_id", F.expr("CAST(ts AS LONG) DIV 86400").alias("day")
    ).agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p_ts")
    )
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "error", 2)
        .when(F.col("event_type") == "signup", 4)
        .when(F.col("event_type") == "view", 8)
    )
    touched = (
        firstp.join(
            ev.filter(F.col("event_type") != "purchase").select(
                F.col("user_id").alias("e_uid"),
                F.expr("CAST(ts AS LONG) DIV 86400").alias("e_day"),
                "event_type",
                "ts",
            ),
            (F.col("e_uid") == F.col("user_id"))
            & (F.col("e_day") == F.col("day"))
            & (F.col("p_ts").isNull() | (F.col("ts") < F.col("p_ts"))),
            "left",
        )
        .groupBy("user_id", "day", "p_ts")
        .agg(
            F.coalesce(F.sum_distinct(bit), F.lit(0)).cast("bigint").alias("mask")
        )
        .select(
            F.when(F.col("p_ts").isNotNull(), 1).otherwise(0).alias("conv"),
            "mask",
        )
    )
    stats = touched.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("users"),
        F.sum("conv").cast("bigint").alias("convs"),
    )
    grid = (
        spark.range(16)
        .select(F.col("id").cast("bigint").alias("mask"))
        .join(F.broadcast(stats), "mask", "left")
        .select(
            "mask",
            F.when(
                F.coalesce(F.col("users"), F.lit(0)) > 0,
                F.col("convs").cast("double") / F.col("users").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
        .localCheckpoint(eager=True)  # joined as g0 and g1
    )
    channels = spark.createDataFrame(
        [(1, "click"), (2, "error"), (4, "signup"), (8, "view")],
        "bit int, channel string",
    )
    g0 = grid.select(F.col("mask"), F.col("v").alias("v0"))
    g1 = grid.select(F.col("mask").alias("mask1"), F.col("v").alias("v1"))
    w_s = F.expr(
        "CASE bit_count(mask) WHEN 0 THEN 6.0D / 24.0D"
        " WHEN 1 THEN 2.0D / 24.0D WHEN 2 THEN 2.0D / 24.0D"
        " ELSE 6.0D / 24.0D END"
    )
    terms = (
        g0.crossJoin(F.broadcast(channels))
        .filter(F.expr("(mask & bit) = 0"))
        .join(F.broadcast(g1), F.expr("mask1 = (mask | bit)"))
        .select(
            "channel", "mask", (w_s * (F.col("v1") - F.col("v0"))).alias("term")
        )
    )
    folded = terms.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("mask", "term"))),
            lambda s: s["term"],
        ).alias("ts_arr"),
    )
    phi = F.aggregate(
        F.slice(F.col("ts_arr"), 2, F.greatest(F.size("ts_arr") - 1, F.lit(0))),
        F.element_at(F.col("ts_arr"), 1),
        lambda a, x: a + x,
    )
    return folded.select("channel", "n_terms", phi.alias("phi"))


@declared(
    "cooc_recommender_hitrate",
    oracle="""
    WITH thr AS (
      SELECT CAST((min(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                   + max(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400)
                   + 1) // 2 AS BIGINT) AS mid_day
      FROM orders
    ),
    op AS (
      SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk,
             CASE WHEN CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400
                       < t.mid_day
                  THEN 0 ELSE 1 END AS is_test
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      CROSS JOIN thr t
    ),
    train_pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b,
             CAST(count(*) AS BIGINT) AS cooc
      FROM op a JOIN op b ON b.ok = a.ok AND b.pk <> a.pk
      WHERE a.is_test = 0 AND b.is_test = 0
      GROUP BY a.pk, b.pk
    ),
    model AS (
      SELECT part_a, part_b AS predicted
      FROM (
        SELECT part_a, part_b,
               row_number() OVER (PARTITION BY part_a
                                  ORDER BY cooc DESC, part_b) AS rk
        FROM train_pairs
      ) WHERE rk = 1
    ),
    preds AS (
      SELECT t.ok, t.pk, m.predicted,
             CASE WHEN EXISTS (
               SELECT 1 FROM op x
               WHERE x.ok = t.ok AND x.pk = m.predicted
             ) THEN 1 ELSE 0 END AS hit
      FROM op t JOIN model m ON m.part_a = t.pk
      WHERE t.is_test = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_predictions,
           CAST(sum(hit) AS BIGINT) AS n_hits,
           CAST((1000000 * sum(hit)) // count(*) AS BIGINT) AS hitrate_ppm
    FROM preds
    """,
)
def cooc_recommender_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline evaluation of the co-occurrence recommender with a
    TEMPORAL train/test split: the top-1 'also bought' partner per part
    is learned on first-half orders only, then scored on second-half
    baskets (hit = the predicted partner appears in the same test
    basket) -- the leakage-free replay protocol every recommender eval
    needs (training on the full corpus inflates hit-rate via the very
    co-occurrences being predicted; `item_cooccurrence_similarity` is
    the model, this is its honest scorecard).

    The calendar split is the same integer-midpoint scalar as
    `trade_edge_drift`, broadcast onto the incidence rows, so train
    membership is a column, not a second scan.  All-integer counts and
    a ppm floor division.

    Cost: one lineitem+orders pass -> the tagged (order, part)
    incidence (localCheckpointed: train self-join sides + test probe +
    the hit anti-probe), order-width-bounded pair fan-out, then a
    broadcast of the <=|parts|-row model; the hit check is one more
    incidence equi-join.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    oday = F.expr("to_unix_timestamp(o_orderdate) DIV 86400")
    thr = orders.agg(
        ((F.min(oday) + F.max(oday) + 1) / 2).cast("bigint").alias("mid_day")
    )
    op = (
        li.join(
            orders.select("o_orderkey", oday.alias("oday")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .crossJoin(F.broadcast(thr))
        .select(
            F.col("l_orderkey").alias("ok"),
            F.col("l_partkey").alias("pk"),
            F.when(F.col("oday") < F.col("mid_day"), 0).otherwise(1).alias("is_test"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # train pair sides + test + hit probe
    )
    tr = op.filter(F.col("is_test") == 0)
    a = tr.select("ok", F.col("pk").alias("part_a"))
    b = tr.select("ok", F.col("pk").alias("part_b"))
    train_pairs = (
        a.join(b.hint("shuffle_hash"), "ok")
        .filter(F.col("part_b") != F.col("part_a"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cooc"))
    )
    wm = Window.partitionBy("part_a").orderBy(F.desc("cooc"), F.asc("part_b"))
    model = (
        train_pairs.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select("part_a", F.col("part_b").alias("predicted"))
    )
    test = op.filter(F.col("is_test") == 1).select("ok", "pk")
    preds = test.join(F.broadcast(model), test.pk == model.part_a).select(
        "ok", "pk", "predicted"
    )
    hits = preds.join(
        op.select(F.col("ok").alias("h_ok"), F.col("pk").alias("h_pk")).hint(
            "shuffle_hash"
        ),
        (F.col("h_ok") == F.col("ok")) & (F.col("h_pk") == F.col("predicted")),
        "left",
    ).select(F.when(F.col("h_pk").isNotNull(), 1).otherwise(0).alias("hit"))
    return hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_predictions"),
        F.sum("hit").cast("bigint").alias("n_hits"),
        F.expr("CAST((1000000 * sum(hit)) DIV count(*) AS BIGINT)").alias(
            "hitrate_ppm"
        ),
    )


@declared(
    "max_drawdown_daily_value",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    cum AS (
      SELECT day_idx,
             CAST(sum(v_s) OVER (ORDER BY day_idx
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      FROM daily
    ),
    dd AS (
      SELECT day_idx, c,
             CAST(max(c) OVER (ORDER BY day_idx
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
      FROM cum
    ),
    scored AS (
      SELECT day_idx, c, peak, peak - c AS drawdown_s,
             CAST((1000000 * (peak - c)) // peak AS BIGINT) AS drawdown_ppm
      FROM dd WHERE peak > 0
    )
    SELECT day_idx AS worst_day, c AS cum_value_s, peak AS peak_s,
           drawdown_s, drawdown_ppm
    FROM (
      SELECT *, row_number() OVER (ORDER BY drawdown_s DESC, day_idx) AS rk
      FROM scored
    ) WHERE rk = 1
    """,
)
def max_drawdown_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily value series: running
    peak minus current cumulative, maximized -- the risk statistic that
    says how bad the worst peak-to-trough slide was (finance's
    canonical path-dependent metric; here "how far did cumulative
    revenue fall behind its best run-rate").  Two stacked running
    windows (cumsum, then running max) and one total-ordered argmax --
    a shape plain aggregation cannot express but windows do in one
    pass; the path-dependence is why it pairs with
    `value_changepoint_cusum` (same cumulative machinery, different
    question).

    All-integer (scaled cents, ppm floor division against the peak);
    first-crossing tiebreak by day.  With non-negative daily values
    the series is monotone and drawdown is 0 -- still a valid,
    oracle-equal answer; the statistic bites when refunds/corrections
    make days net-negative (late_data_corrections' world).

    Cost: one events scan -> calendar-bounded day series; both windows
    and the argmax run single-partition over <=|days| rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
    )
    wc = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.select(
        "day_idx",
        F.sum("v_s").over(wc).cast("bigint").alias("c"),
    ).select(
        "day_idx",
        "c",
        F.max("c").over(wc).cast("bigint").alias("peak"),
    )
    scored = dd.filter(F.col("peak") > 0).select(
        "day_idx",
        "c",
        "peak",
        (F.col("peak") - F.col("c")).alias("drawdown_s"),
        F.expr("CAST((1000000 * (peak - c)) DIV peak AS BIGINT)").alias(
            "drawdown_ppm"
        ),
    )
    wr = Window.orderBy(F.desc("drawdown_s"), F.asc("day_idx"))
    return (
        scored.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            F.col("day_idx").alias("worst_day"),
            F.col("c").alias("cum_value_s"),
            F.col("peak").alias("peak_s"),
            "drawdown_s",
            "drawdown_ppm",
        )
    )


@declared(
    "bollinger_band_days",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    roll AS (
      SELECT day_idx, v_s,
             CAST(count(*) OVER wnd AS BIGINT) AS k,
             CAST(sum(CAST(v_s AS HUGEINT)) OVER wnd AS HUGEINT) AS s,
             CAST(sum(CAST(v_s AS HUGEINT) * v_s) OVER wnd AS HUGEINT) AS q
      FROM daily
      WINDOW wnd AS (ORDER BY day_idx ROWS BETWEEN 6 PRECEDING
                     AND CURRENT ROW)
    ),
    bands AS (
      SELECT day_idx, v_s, k,
             CAST(s AS DOUBLE) / CAST(k AS DOUBLE) AS mid,
             2.0e0 * sqrt(CAST(k * q - s * s AS DOUBLE)
                          / CAST(k * k AS DOUBLE)) AS width
      FROM roll WHERE k = 7
    )
    SELECT day_idx,
           CAST(v_s AS DOUBLE) / 10000.0e0 AS value,
           mid / 10000.0e0 AS band_mid,
           (mid - width) / 10000.0e0 AS band_lo,
           (mid + width) / 10000.0e0 AS band_hi,
           CAST(v_s AS DOUBLE) > mid + width
             OR CAST(v_s AS DOUBLE) < mid - width AS outside
    FROM bands
    """,
)
def bollinger_band_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on the daily value series: trailing-7-day mean
    +- 2 population standard deviations, with the outside-band flag per
    day -- the rolling-volatility envelope that complements
    `ewma_control_chart` (exponential memory, fixed sigma) with a
    finite-window, locally-estimated sigma: a spike after a calm week
    flags here even when the long-run EWMA chart stays quiet.

    The rolling moments (count, sum, sum-of-squares) are exact integer
    window sums (HUGEINT/DECIMAL operand-cast discipline -- daily
    sums-of-squares exceed int64); mean and 2*sigma = 2*sqrt((kQ-S^2)/
    k^2) are fixed float expressions of those integers, identical in
    the oracle, so even the band edges hash-match.  Warm-up days
    (window < 7) are excluded identically on both engines.

    Cost: one events scan -> calendar-bounded day series; one ordered
    window pass carries all three moments at once.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
    )
    dec = "decimal(38,0)"
    wnd = Window.orderBy("day_idx").rowsBetween(-6, 0)
    roll = daily.select(
        "day_idx",
        "v_s",
        F.count(F.lit(1)).over(wnd).cast("bigint").alias("k"),
        F.sum(F.col("v_s").cast(dec)).over(wnd).cast(dec).alias("s"),
        F.sum(F.col("v_s").cast(dec) * F.col("v_s")).over(wnd).cast(dec).alias("q"),
    ).filter(F.col("k") == 7)
    mid = F.col("s").cast("double") / F.col("k").cast("double")
    width = F.lit(2.0) * F.sqrt(
        (F.col("k") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (F.col("k") * F.col("k")).cast("double")
    )
    vd = F.col("v_s").cast("double")
    return roll.select(
        "day_idx",
        (vd / F.lit(10000.0)).alias("value"),
        (mid / F.lit(10000.0)).alias("band_mid"),
        ((mid - width) / F.lit(10000.0)).alias("band_lo"),
        ((mid + width) / F.lit(10000.0)).alias("band_hi"),
        ((vd > mid + width) | (vd < mid - width)).alias("outside"),
    )


@declared(
    "gini_customer_revenue",
    oracle="""
    WITH rev AS (
      SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS rev_c
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev_c,
             CAST(row_number() OVER (ORDER BY rev_c, o_custkey) AS BIGINT)
               AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(sum(CAST(rev_c AS HUGEINT)) OVER () AS HUGEINT) AS total
      FROM rev
    )
    SELECT CAST(max(n) AS BIGINT) AS n_customers,
           CAST(max(total) AS BIGINT) AS total_cents,
           CAST((1000000 * (2 * sum(CAST(rk AS HUGEINT) * rev_c)
                            - (max(n) + 1) * max(total)))
                // (max(n) * max(total)) AS BIGINT) AS gini_ppm
    FROM ranked
    """,
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime revenue -- the Lorenz-curve
    summary of demand concentration, exactly: with revenues sorted
    ascending and ranked 1..n, G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)).  The single-number companion to
    `pareto_revenue_share`'s threshold cut (Pareto answers "how many
    cover 80%", Gini integrates the whole curve) and the revenue-side
    twin of `token_gini_by_source`.

    All-integer: cents, an exact rank-weighted sum (HUGEINT /
    DECIMAL(38,0) operand-cast -- rank*revenue products overflow int64
    past ~1e7 customers), one ppm floor division.  Rank ties broken by
    custkey identically on both engines (ties on the SAME revenue
    contribute the same total rank mass either way, so the tiebreak
    cannot change G -- it only pins row identity).

    Cost: one orders scan -> per-customer agg, then the
    concentration-family single-ordered-window posture over the
    aggregated customer dim (swap in the equidepth grid at extreme
    scale, as pareto_revenue_share documents).
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = (
        orders.select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("r_c"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("r_c").cast("bigint").alias("rev_c"))
    )
    dec = "decimal(38,0)"
    w = Window.orderBy(F.asc("rev_c"), F.asc("o_custkey"))
    ranked = rev.select(
        "rev_c",
        F.row_number().over(w).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("bigint").alias("n"),
        F.sum(F.col("rev_c").cast(dec))
        .over(Window.partitionBy())
        .cast(dec)
        .alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.max("total").cast("bigint").alias("total_cents"),
        F.expr(
            "CAST((1000000 * (2 * sum(CAST(rk AS DECIMAL(38,0)) * rev_c)"
            "                 - (max(n) + 1) * max(total)))"
            " DIV (max(n) * max(total)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


@declared(
    "rescaled_range_daily",
    oracle="""
    WITH daily AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day_idx,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_s
      FROM events
      GROUP BY CAST(floor(epoch(ts)) AS BIGINT) // 86400
    ),
    mom AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(v_s AS HUGEINT)) AS HUGEINT) AS s,
             CAST(sum(CAST(v_s AS HUGEINT) * v_s) AS HUGEINT) AS q
      FROM daily
    ),
    dev AS (
      SELECT d.day_idx,
             CAST(sum(CAST(d2.v_s AS HUGEINT)) AS HUGEINT) AS cum,
             CAST(count(*) AS HUGEINT) AS t
      FROM daily d JOIN daily d2 ON d2.day_idx <= d.day_idx
      CROSS JOIN mom m
      GROUP BY d.day_idx
    ),
    rng AS (
      SELECT CAST(max(m.n * dv.cum - dv.t * m.s) AS HUGEINT) AS mx,
             CAST(min(m.n * dv.cum - dv.t * m.s) AS HUGEINT) AS mn
      FROM dev dv CROSS JOIN mom m
    )
    SELECT CAST(m.n AS BIGINT) AS n_days,
           (CAST(r.mx - r.mn AS DOUBLE) / CAST(m.n AS DOUBLE))
           / sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE)
                  / CAST(m.n * m.n AS DOUBLE)) AS rs_ratio
    FROM rng r CROSS JOIN mom m
    WHERE m.n * m.q - m.s * m.s > 0
    """,
)
def rescaled_range_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled range (R/S) statistic of the daily value series -- the
    Hurst-analysis kernel (Hurst 1951; Mandelbrot's long-memory
    diagnostic): R = range of the mean-adjusted cumulative deviations,
    S = population std; R/S well above sqrt(n/2) suggests persistent
    long-memory, well below suggests mean-reversion -- complementing
    `ljung_box_whiteness` (short-lag correlation) with a whole-path
    statistic.  (The full Hurst exponent needs a log-log fit across
    window sizes -- log sums are not order-stable cross-engine, so the
    engine ships the exact single-window statistic instead.)

    Exactness: cumulative deviations are cleared of the rational mean
    by scaling with n (n*cum_t - t*S, exact integers in DECIMAL /
    HUGEINT); R/n and S = sqrt((nQ-S^2)/n^2) convert to doubles in one
    fixed expression each, so rs_ratio hash-matches.  The cumulative
    sums come from a day-pair join (quadratic in DISTINCT DAYS --
    calendar-bounded, the `mann_kendall_trend` posture) to keep both
    engines on identical integer paths.

    Cost: one events scan -> calendar-bounded daily frame
    (localCheckpointed: moments + both pair sides), then <=|days|^2/2
    broadcast pair rows.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.expr("CAST(ts AS LONG) DIV 86400").alias("day_idx"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v_si"),
        )
        .groupBy("day_idx")
        .agg(F.sum("v_si").cast("bigint").alias("v_s"))
        .localCheckpoint(eager=True)  # moments + pair-join sides
    )
    dec = "decimal(38,0)"
    mom = daily.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("v_s").cast(dec)).cast(dec).alias("s"),
        F.sum(F.col("v_s").cast(dec) * F.col("v_s")).cast(dec).alias("q"),
    )
    d = daily.select(F.col("day_idx").alias("di"))
    d2 = daily.select(F.col("day_idx").alias("dj"), F.col("v_s").alias("vj"))
    dev = (
        d.join(F.broadcast(d2), F.col("dj") <= F.col("di"))
        .groupBy("di")
        .agg(
            F.sum(F.col("vj").cast(dec)).cast(dec).alias("cum"),
            F.count(F.lit(1)).cast(dec).alias("t"),
        )
    )
    rng = dev.crossJoin(F.broadcast(mom)).agg(
        F.max(F.col("n") * F.col("cum") - F.col("t") * F.col("s"))
        .cast(dec)
        .alias("mx"),
        F.min(F.col("n") * F.col("cum") - F.col("t") * F.col("s"))
        .cast(dec)
        .alias("mn"),
    )
    den = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    rs = (
        (F.col("mx") - F.col("mn")).cast("double") / F.col("n").cast("double")
    ) / F.sqrt(
        den.cast("double") / (F.col("n") * F.col("n")).cast("double")
    )
    return (
        rng.crossJoin(F.broadcast(mom))
        .filter(den > 0)
        .select(F.col("n").cast("bigint").alias("n_days"), rs.alias("rs_ratio"))
    )


@declared(
    "mcnemar_activity_shift",
    oracle="""
    WITH ud AS (
      SELECT user_id, event_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM ud
    ),
    thr AS (SELECT v AS q FROM ranked WHERE rn = (99 * n + 99) // 100),
    bounds AS (
      SELECT CAST(min(day) AS BIGINT) AS lo, CAST(max(day) AS BIGINT) AS hi
      FROM ud
    ),
    mid AS (SELECT CAST((lo + hi + 1) // 2 AS BIGINT) AS m FROM bounds),
    per_user AS (
      SELECT user_id,
             CAST(max(CASE WHEN day < m AND v >= q THEN 1 ELSE 0 END)
               AS BIGINT) AS h1,
             CAST(max(CASE WHEN day >= m AND v >= q THEN 1 ELSE 0 END)
               AS BIGINT) AS h2
      FROM ud CROSS JOIN mid CROSS JOIN thr
      GROUP BY user_id
    )
    SELECT CAST(sum(h1 * h2) AS BIGINT) AS n_both,
           CAST(sum(h1 * (1 - h2)) AS BIGINT) AS b_lost,
           CAST(sum((1 - h1) * h2) AS BIGINT) AS c_gained,
           CAST(1000000
                * (sum(h1 * (1 - h2)) - sum((1 - h1) * h2))
                * (sum(h1 * (1 - h2)) - sum((1 - h1) * h2))
                // NULLIF(sum(h1 * (1 - h2)) + sum((1 - h1) * h2), 0)
             AS BIGINT) AS mcnemar_ppm,
           CAST(1000000
                * greatest(abs(sum(h1 * (1 - h2)) - sum((1 - h1) * h2)) - 1, 0)
                * greatest(abs(sum(h1 * (1 - h2)) - sum((1 - h1) * h2)) - 1, 0)
                // NULLIF(sum(h1 * (1 - h2)) + sum((1 - h1) * h2), 0)
             AS BIGINT) AS mcnemar_cc_ppm
    FROM per_user
    """,
)
def mcnemar_activity_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test on paired user outcomes across the two halves of
    the observation window: each user is a matched pair (hit a top-1%%
    value event in H1?, in H2?); the statistic (b-c)^2/(b+c) over the
    DISCORDANT cells asks whether losing the high-value behavior (b) and
    gaining it (c) are symmetric -- the right paired test where a
    two-proportion z-test (`ab_conversion_ztest`) would wrongly treat
    the halves as independent samples.  Also emits the
    continuity-corrected (|b-c|-1)^2/(b+c) variant.  All thresholds and
    statistics are integer-exact: the top-1%% cut is the value at
    ascending rank ceil(99n/100) computed as (99n+99) DIV 100 (no float
    percentile), cents domain, ppm output via cross-multiplied floor
    division; NULL if no discordant pairs (degenerate on both engines
    identically).  The half boundary is the integer midpoint of the
    observed day range -- data-derived but deterministic.

    Plan: one events scan -> narrow (user, day, v) projection
    (checkpointed: consumed by the threshold rank, the bounds scalar,
    AND the per-user rollup), per-user flags via max-of-indicator
    partial agg, single-row final agg.  The global rank for the p99
    scalar is the one sort -- at 100 TB swap it for a two-pass
    histogram-refine selection (equidepth_value_bands machinery); the
    rest scales with distinct users.
    """
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        "event_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    ).localCheckpoint(eager=True)  # 3 consumers: thr rank, bounds, rollup
    w_rank = Window.orderBy("v", "event_id")
    w_all = Window.partitionBy()
    thr = (
        ud.select(
            "v",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        )
        .filter(F.col("rn") == F.expr("(99 * n + 99) DIV 100"))
        .select(F.col("v").alias("q"))
    )
    bounds = ud.agg(
        F.min("day").cast("bigint").alias("lo"),
        F.max("day").cast("bigint").alias("hi"),
    )
    mid = bounds.select(F.expr("CAST((lo + hi + 1) DIV 2 AS BIGINT)").alias("m"))
    per_user = (
        ud.crossJoin(F.broadcast(mid))
        .crossJoin(F.broadcast(thr))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when((F.col("day") < F.col("m")) & (F.col("v") >= F.col("q")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("h1"),
            F.max(
                F.when((F.col("day") >= F.col("m")) & (F.col("v") >= F.col("q")), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("h2"),
        )
    )
    return per_user.agg(
        F.sum(F.col("h1") * F.col("h2")).cast("bigint").alias("n_both"),
        F.sum(F.col("h1") * (1 - F.col("h2"))).cast("bigint").alias("b_lost"),
        F.sum((1 - F.col("h1")) * F.col("h2")).cast("bigint").alias("c_gained"),
        F.expr(
            "CAST(1000000"
            " * (sum(h1 * (1 - h2)) - sum((1 - h1) * h2))"
            " * (sum(h1 * (1 - h2)) - sum((1 - h1) * h2))"
            " DIV NULLIF(sum(h1 * (1 - h2)) + sum((1 - h1) * h2), 0)"
            " AS BIGINT)"
        ).alias("mcnemar_ppm"),
        F.expr(
            "CAST(1000000"
            " * greatest(abs(sum(h1 * (1 - h2)) - sum((1 - h1) * h2)) - 1, 0)"
            " * greatest(abs(sum(h1 * (1 - h2)) - sum((1 - h1) * h2)) - 1, 0)"
            " DIV NULLIF(sum(h1 * (1 - h2)) + sum((1 - h1) * h2), 0)"
            " AS BIGINT)"
        ).alias("mcnemar_cc_ppm"),
    )


# Holt-Winters init expressions, shared verbatim by level/trend/seasonal
# (IEEE doubles: textually identical expression trees are bit-identical).
_HW_L0 = "(ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6]+ys[7]) / 7.0e0"
_HW_B0 = (
    "((ys[8]+ys[9]+ys[10]+ys[11]+ys[12]+ys[13]+ys[14])"
    " - (ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6]+ys[7])) / 49.0e0"
)
# one fold step, l' spelled out verbatim wherever referenced
_HW_LP = "0.3e0 * (s.ys[f.i + 1] - f.s[(f.i % 7) + 1]) + 0.7e0 * (f.l + f.b)"


@declared(
    "holt_winters_daily_value",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v
      FROM events
      GROUP BY event_type, date_trunc('day', ts)
    ),
    series AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             list(CAST(v AS DOUBLE) ORDER BY day) AS ys
      FROM daily GROUP BY event_type
      HAVING count(*) >= 15
    ),
    fold(event_type, n_days, i, l, b, s) AS (
      SELECT event_type, n_days, 7,
             {_HW_L0},
             {_HW_B0},
             list_transform(generate_series(1, 7), j -> ys[j] - ({_HW_L0}))
      FROM series
      UNION ALL
      SELECT f.event_type, f.n_days, f.i + 1,
             {_HW_LP},
             0.1e0 * (({_HW_LP}) - f.l) + 0.9e0 * f.b,
             list_transform(generate_series(1, 7), j ->
               CASE WHEN j = (f.i % 7) + 1
                    THEN 0.2e0 * (s.ys[f.i + 1] - ({_HW_LP}))
                         + 0.8e0 * f.s[(f.i % 7) + 1]
                    ELSE f.s[j] END)
      FROM fold f JOIN series s ON s.event_type = f.event_type
      WHERE f.i < f.n_days
    )
    SELECT event_type, n_days,
           l / 10000.0e0 AS level,
           b / 10000.0e0 AS trend,
           (l + b + s[(CAST(n_days AS INT) % 7) + 1]) / 10000.0e0
             AS forecast_next
    FROM fold WHERE i = n_days
    """,
)
def holt_winters_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple-exponential smoothing (alpha=0.3,
    beta=0.1, gamma=0.2, period 7) over each event type's daily value
    series: final level, trend, and the seasonal one-step forecast
    l + b + s_{{next slot}} -- the weekly-seasonality upgrade of
    `holt_linear_daily_value` and the model-based complement of
    `seasonal_naive_forecast_error` / `seasonal_decompose_additive`.
    Series shorter than 15 days are dropped (the init needs two full
    seasons).

    Classic init: l0 = mean of season 1, b0 = (mean season 2 - mean
    season 1)/7 averaged per step, s_j = y_j - l0; the fold then runs
    t = 8..n with l' = a*(y_t - s_{{t-7}}) + (1-a)(l+b), b' =
    B*(l'-l) + (1-B)b, s'_{{slot}} = g*(y_t - l') + (1-g)*s_{{slot}}.
    Three-component state (l, b, 7-slot seasonal ARRAY) rides a STRUCT
    accumulator on the Spark side; the oracle is a recursive CTE
    carrying the list -- NOT list_reduce, whose struct-accumulator
    cross-field references are broken (the holt_linear finding).  Both
    engines evaluate textually identical double expression trees
    ('0.3e0' literals, l' repeated verbatim), so the result is
    bit-identical with no rounding step.  Scale: the fold is per
    (event_type) series of |days| elements after a map-side-combinable
    daily rollup -- calendar-bounded state, never per-event.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 10000).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    series = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))),
            lambda s: s.getField("v").cast("double"),
        ).alias("ys"),
    ).filter(F.col("n_days") >= 15)

    ys = F.col("ys")

    def el(j):
        return F.element_at(ys, j)

    l0 = (el(1) + el(2) + el(3) + el(4) + el(5) + el(6) + el(7)) / F.lit(7.0)
    b0 = (
        (el(8) + el(9) + el(10) + el(11) + el(12) + el(13) + el(14))
        - (el(1) + el(2) + el(3) + el(4) + el(5) + el(6) + el(7))
    ) / F.lit(49.0)
    s0 = F.transform(F.slice(ys, 1, 7), lambda y: y - l0)
    init = F.struct(l0.alias("l"), b0.alias("b"), s0.alias("s"))
    # elements t = 8..n with their 1-based seasonal slot
    elems = F.transform(
        F.slice(ys, 8, F.size(ys) - 7),
        lambda y, i: F.struct(y.alias("y"), ((i % 7) + 1).alias("idx")),
    )

    def merge(acc, e):
        y, idx = e.getField("y"), e.getField("idx")
        sprev = F.element_at(acc.getField("s"), idx)
        lp = F.lit(0.3) * (y - sprev) + F.lit(0.7) * (
            acc.getField("l") + acc.getField("b")
        )
        snew = F.lit(0.2) * (y - lp) + F.lit(0.8) * sprev
        return F.struct(
            lp.alias("l"),
            (F.lit(0.1) * (lp - acc.getField("l"))
             + F.lit(0.9) * acc.getField("b")).alias("b"),
            F.transform(
                acc.getField("s"),
                lambda v, j: F.when(j + 1 == idx, snew).otherwise(v),
            ).alias("s"),
        )

    st = F.aggregate(elems, init, merge)
    nxt = F.element_at(
        st.getField("s"), (F.col("n_days").cast("int") % 7) + 1
    )
    return series.select(
        "event_type",
        "n_days",
        (st.getField("l") / 10000.0).alias("level"),
        (st.getField("b") / 10000.0).alias("trend"),
        ((st.getField("l") + st.getField("b") + nxt) / 10000.0).alias(
            "forecast_next"
        ),
    )


@declared(
    "nelson_aalen_hazard",
    oracle="""
    WITH evs AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS fe
      FROM events
    ),
    users AS (
      SELECT user_id, min(fe) AS entry,
             min(CASE WHEN event_type = 'purchase' THEN fe END) AS conv,
             max(fe) AS censor
      FROM evs GROUP BY user_id
    ),
    ud AS (
      SELECT (coalesce(conv, censor) - entry) // 86400 AS dur,
             CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS conv_f
      FROM users
    ),
    per AS (
      SELECT dur, CAST(count(*) AS BIGINT) AS u,
             CAST(sum(conv_f) AS BIGINT) AS c
      FROM ud GROUP BY dur
    ),
    risk AS (
      SELECT dur, u, c,
             (SELECT CAST(count(*) AS BIGINT) FROM ud)
               - (CAST(sum(u) OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)
                       AS BIGINT) - u) AS n_at_risk
      FROM per
    ),
    hz AS (
      SELECT dur, n_at_risk, c,
             CAST((1000000 * c) // n_at_risk AS BIGINT) AS hazard_ppm,
             CAST((1000000 * c * c)
                  // (n_at_risk * n_at_risk) AS BIGINT) AS var_term_ppm
      FROM risk WHERE c > 0
    )
    SELECT dur AS dur_day, n_at_risk, c AS n_conv, hazard_ppm,
           CAST(sum(hazard_ppm) OVER (ORDER BY dur
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumhaz_ppm,
           CAST(sum(var_term_ppm) OVER (ORDER BY dur
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumvar_ppm
    FROM hz
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator for time-to-first-
    purchase: H(d) = sum_{d_i <= d} c_i/n_i over the same entry/censor
    construction as `kaplan_meier_conversion`, plus the running
    Poisson-type variance sum c_i/n_i^2 -- the hazard-scale counterpart
    of KM's survival product (and the better-behaved estimator at small
    at-risk counts; Aalen 1978).  KM answers "what fraction survive";
    N-A answers "how much cumulative risk has accrued" -- the quantity
    regression models (Cox) calibrate against.

    Every term is an integer ppm floor division and the cumulative sums
    are integer windows -- no float anywhere, unlike KM's double
    product, so the whole curve is trivially bit-exact.  Shape: one
    events scan -> per-user rollup -> per-duration rollup; windows run
    over the <=|calendar|-row event-day series.
    """
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.min(F.expr("unix_timestamp(ts)")).alias("entry"),
        F.min(
            F.when(
                F.col("event_type") == "purchase", F.expr("unix_timestamp(ts)")
            )
        ).alias("conv"),
        F.max(F.expr("unix_timestamp(ts)")).alias("censor"),
    )
    ud = users.select(
        F.expr("(coalesce(conv, censor) - entry) DIV 86400").alias("dur"),
        F.when(F.col("conv").isNotNull(), 1).otherwise(0).alias("conv_f"),
    ).localCheckpoint(eager=True)  # per + n_total consumers
    per = ud.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        F.sum("conv_f").cast("bigint").alias("c"),
    )
    n_total = ud.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    w = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        per.withColumn("cum_u", F.sum("u").over(w).cast("bigint"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "dur",
            "u",
            "c",
            (F.col("n_total") - (F.col("cum_u") - F.col("u"))).alias(
                "n_at_risk"
            ),
        )
    )
    hz = risk.filter(F.col("c") > 0).select(
        "dur",
        "n_at_risk",
        "c",
        F.expr("CAST((1000000 * c) DIV n_at_risk AS BIGINT)").alias(
            "hazard_ppm"
        ),
        F.expr(
            "CAST((1000000 * c * c) DIV (n_at_risk * n_at_risk) AS BIGINT)"
        ).alias("var_term_ppm"),
    )
    return hz.select(
        F.col("dur").alias("dur_day"),
        "n_at_risk",
        F.col("c").alias("n_conv"),
        "hazard_ppm",
        F.sum("hazard_ppm").over(w.orderBy("dur")).cast("bigint").alias(
            "cumhaz_ppm"
        ),
        F.sum("var_term_ppm").over(w.orderBy("dur")).cast("bigint").alias(
            "cumvar_ppm"
        ),
    )


@declared(
    "als_user_factors_exact",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, event_type
    ),
    items AS (
      SELECT event_type,
             CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS idx
      FROM (SELECT DISTINCT event_type FROM events)
    ),
    fi AS (
      SELECT event_type, CAST(1 + (idx % 3) AS BIGINT) AS f1,
             CAST(1 + ((2 * idx) % 5) AS BIGINT) AS f2
      FROM items
    ),
    sys AS (
      SELECT r.user_id,
             CAST(count(*) AS BIGINT) AS n_items,
             CAST(10 + sum(f.f1 * f.f1) AS BIGINT) AS a11,
             CAST(sum(f.f1 * f.f2) AS BIGINT) AS a12,
             CAST(10 + sum(f.f2 * f.f2) AS BIGINT) AS a22,
             CAST(sum(r.cnt * f.f1) AS BIGINT) AS b1,
             CAST(sum(r.cnt * f.f2) AS BIGINT) AS b2
      FROM r JOIN fi f ON f.event_type = r.event_type
      GROUP BY r.user_id
    )
    SELECT user_id, n_items,
           CAST(a11 * a22 - a12 * a12 AS BIGINT) AS det,
           CAST(a22 * b1 - a12 * b2 AS BIGINT) AS x1_num,
           CAST(a11 * b2 - a12 * b1 AS BIGINT) AS x2_num,
           CAST(a22 * b1 - a12 * b2 AS DOUBLE)
             / (a11 * a22 - a12 * a12) AS x1,
           CAST(a11 * b2 - a12 * b1 AS DOUBLE)
             / (a11 * a22 - a12 * a12) AS x2
    FROM sys
    """,
)
def als_user_factors_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS half-step for a 2-factor implicit recommender: with
    the item (event_type) factor matrix F FIXED at a deterministic
    integer init (f = (1 + idx%3, 1 + 2*idx%5) over the rank-ordered
    item index), each user's factors solve the d=2 ridge system
    (F_u'F_u + lambda*I) x = F_u'r_u (lambda=10) IN CLOSED FORM via the
    2x2 adjugate -- so the solution is an exact RATIONAL (x1_num/det,
    x2_num/det), emitted as integers plus their one IEEE double
    division.  This is the real alternating-least-squares iteration
    body (Hu/Koren/Volinsky shape, observed-entries variant): per-user
    independent solves, which is exactly why ALS distributes -- and the
    integer closed form is what makes it oracle-checkable where a
    float Cholesky would drift.

    Plan: one events scan -> (user, item) counts (map-side combine);
    the item-factor table is |items| rows broadcast; the per-user solve
    is a 5-term aggregation -- no shuffle beyond the user rollup.
    Envelope: a22*b1 ~ (10+2*25)*(cnt*2) stays far below 2^63 up to
    ~1e17 interactions/user.
    """
    ev = load_table(spark, sf_dir, "events")
    r = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    items = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("event_type")).cast("bigint"),
        )
    )
    fi = items.select(
        "event_type",
        (1 + (F.col("idx") % 3)).cast("bigint").alias("f1"),
        (1 + ((2 * F.col("idx")) % 5)).cast("bigint").alias("f2"),
    )
    sys_ = (
        r.join(F.broadcast(fi), "event_type")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            (F.lit(10) + F.sum(F.col("f1") * F.col("f1")))
            .cast("bigint")
            .alias("a11"),
            F.sum(F.col("f1") * F.col("f2")).cast("bigint").alias("a12"),
            (F.lit(10) + F.sum(F.col("f2") * F.col("f2")))
            .cast("bigint")
            .alias("a22"),
            F.sum(F.col("cnt") * F.col("f1")).cast("bigint").alias("b1"),
            F.sum(F.col("cnt") * F.col("f2")).cast("bigint").alias("b2"),
        )
    )
    return sys_.select(
        "user_id",
        "n_items",
        F.expr("CAST(a11 * a22 - a12 * a12 AS BIGINT)").alias("det"),
        F.expr("CAST(a22 * b1 - a12 * b2 AS BIGINT)").alias("x1_num"),
        F.expr("CAST(a11 * b2 - a12 * b1 AS BIGINT)").alias("x2_num"),
        F.expr(
            "CAST(a22 * b1 - a12 * b2 AS DOUBLE) / (a11 * a22 - a12 * a12)"
        ).alias("x1"),
        F.expr(
            "CAST(a11 * b2 - a12 * b1 AS DOUBLE) / (a11 * a22 - a12 * a12)"
        ).alias("x2"),
    )


@declared(
    "isotonic_purchase_rate_fit",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS ne,
             CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS pos
      FROM events GROUP BY user_id
    ),
    dec AS (
      SELECT ntile(10) OVER (ORDER BY ne, user_id) AS dk, pos FROM per_user
    ),
    b AS (
      SELECT dk, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
      FROM dec GROUP BY dk
    ),
    cum AS (
      SELECT dk, n, np,
             CAST(sum(n) OVER (ORDER BY dk ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cn,
             CAST(sum(np) OVER (ORDER BY dk ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cp
      FROM b
    ),
    pairs AS (
      SELECT i.dk AS i, j.dk AS j,
             CAST(j.cp - (i.cp - i.np) AS DOUBLE)
               / (j.cn - (i.cn - i.n)) AS avg_ij
      FROM cum i JOIN cum j ON j.dk >= i.dk
    ),
    m AS (
      SELECT i, j AS k,
             min(avg_ij) OVER (PARTITION BY i ORDER BY j DESC
                               ROWS UNBOUNDED PRECEDING) AS m_ik
      FROM pairs
    ),
    fit AS (SELECT k, max(m_ik) AS iso_rate FROM m GROUP BY k)
    SELECT b.dk AS decile, b.n AS n_users, b.np AS n_purchasers,
           CAST((1000000 * b.np) // b.n AS BIGINT) AS raw_rate_ppm,
           f.iso_rate
    FROM b JOIN fit f ON f.k = b.dk
    """,
)
def isotonic_purchase_rate_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression of purchase rate on activity decile: users
    are binned into 10 deciles by event count (ntile over the total
    order (n_events, user_id)), and the per-decile empirical purchase
    rate is replaced by its best MONOTONE non-decreasing fit -- the
    minimax (prefix-max of suffix-min of interval averages) form of the
    pool-adjacent-violators solution, y_k = max_{i<=k} min_{j>=k}
    avg(y_i..y_j) (Robertson/Wright/Dykstra).  The calibration step a
    score-based sampler needs before trusting "more active => more
    likely to buy" monotonically; the model-based sibling of
    `lang_score_calibration`'s ECE diagnosis and
    `curriculum_quality_bins`' monotone assumption.

    Determinism: every interval average is ONE IEEE division of exact
    integer prefix-sum differences (bit-identical cross-engine), and
    min/max over identical doubles is order-free.  The b^2 interval
    pairs live on the 10-row decile frame -- the quadratic minimax form
    is chosen over sequential PAV precisely because it is pure
    window/join algebra at O(bins^2), never touching row scale.

    Plan: one events scan -> per-user rollup -> 10-row decile frame
    (checkpointed for its self-join aliases); everything after is
    constant-size.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ne"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("pos"),
    )
    dec = per_user.select(
        F.ntile(10).over(Window.orderBy("ne", "user_id")).alias("dk"), "pos"
    )
    b = (
        dec.groupBy("dk")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("np"),
        )
        .localCheckpoint(eager=True)  # cum + final join consumers
    )
    wc = Window.orderBy("dk").rowsBetween(Window.unboundedPreceding, 0)
    cum = b.select(
        "dk",
        "n",
        "np",
        F.sum("n").over(wc).cast("bigint").alias("cn"),
        F.sum("np").over(wc).cast("bigint").alias("cp"),
    ).localCheckpoint(eager=True)  # two self-join aliases
    ci = cum.select(
        F.col("dk").alias("i"),
        F.col("n").alias("ni"),
        F.col("np").alias("npi"),
        F.col("cn").alias("cni"),
        F.col("cp").alias("cpi"),
    )
    cj = cum.select(
        F.col("dk").alias("j"),
        F.col("cn").alias("cnj"),
        F.col("cp").alias("cpj"),
    )
    pairs = ci.join(F.broadcast(cj), F.col("j") >= F.col("i")).select(
        "i",
        "j",
        (
            (F.col("cpj") - (F.col("cpi") - F.col("npi"))).cast("double")
            / (F.col("cnj") - (F.col("cni") - F.col("ni")))
        ).alias("avg_ij"),
    )
    wm = (
        Window.partitionBy("i")
        .orderBy(F.desc("j"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = pairs.select(
        "i", F.col("j").alias("k"), F.min("avg_ij").over(wm).alias("m_ik")
    )
    fit = m.groupBy("k").agg(F.max("m_ik").alias("iso_rate"))
    return b.join(F.broadcast(fit), b.dk == fit.k).select(
        F.col("dk").alias("decile"),
        F.col("n").alias("n_users"),
        F.col("np").alias("n_purchasers"),
        F.expr("CAST((1000000 * np) DIV n AS BIGINT)").alias("raw_rate_ppm"),
        "iso_rate",
    )


@declared(
    "bandit_replay_policy_eval",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT d.day, t.event_type, CAST(coalesce(da.c, 0) AS BIGINT) AS c
      FROM (SELECT DISTINCT day FROM daily) d
      CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
      LEFT JOIN daily da ON da.day = d.day AND da.event_type = t.event_type
    ),
    hist AS (
      SELECT day, event_type, c,
             CAST(coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY day
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
      FROM grid
    ),
    pol AS (
      SELECT day, event_type AS policy_type FROM (
        SELECT day, event_type,
               row_number() OVER (PARTITION BY day
                                  ORDER BY cum_before DESC, event_type) AS rk
        FROM hist
      ) WHERE rk = 1
    ),
    per_day AS (
      SELECT h.day, p.policy_type,
             CAST(sum(h.c) AS BIGINT) AS n_events,
             CAST(sum(CASE WHEN h.event_type = p.policy_type
                           THEN h.c ELSE 0 END) AS BIGINT) AS n_match
      FROM hist h JOIN pol p ON p.day = h.day
      GROUP BY h.day, p.policy_type
    )
    SELECT day, policy_type, n_events, n_match,
           CAST((1000000 * n_match) // n_events AS BIGINT) AS match_ppm,
           CAST((1000000 * sum(n_match) OVER ())
                // sum(n_events) OVER () AS BIGINT) AS overall_ppm
    FROM per_day
    """,
)
def bandit_replay_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline replay evaluation (Li et al. 2011) of the greedy
    most-popular policy over the event stream: each day the policy
    recommends the event type with the highest CUMULATIVE count over
    strictly earlier days (ties: lexicographic; day 1 has an empty
    history, so it degenerates to the tie-break -- kept, deterministic),
    and is scored by replay matching against that day's logged events:
    match share per day plus the overall replay CTR.  The
    counterfactual-evaluation primitive a recommender pipeline needs
    before an online A/B (`ab_conversion_ztest` is the online half;
    `cooc_recommender_hitrate` evaluates a different policy the same
    offline way).

    Exactness: the history cumsum runs over the DENSE day x type grid
    (types absent on a day carry 0 -- both engines build the same
    grid), the policy argmax has a total tie-break order, and all
    scores are integer ppm floor divisions.

    Plan: one events scan -> (day, type) partial agg; the grid, windows,
    and argmax all run on the |days| x |types| frame -- calendar x
    dimension bounded, never event-bounded.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=True)  # days dim, types dim, grid join
    )
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(F.broadcast(daily), ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("c"),
        )
    )
    wh = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = grid.select(
        "day",
        "event_type",
        "c",
        F.coalesce(F.sum("c").over(wh), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    ).localCheckpoint(eager=True)  # policy argmax + replay join
    wp = Window.partitionBy("day").orderBy(
        F.desc("cum_before"), F.asc("event_type")
    )
    pol = (
        hist.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("day", F.col("event_type").alias("policy_type"))
    )
    per_day = (
        hist.join(F.broadcast(pol), "day")
        .groupBy("day", "policy_type")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.sum(
                F.when(
                    F.col("event_type") == F.col("policy_type"), F.col("c")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_match"),
        )
    )
    return per_day.select(
        "day",
        "policy_type",
        "n_events",
        "n_match",
        F.expr("CAST((1000000 * n_match) DIV n_events AS BIGINT)").alias(
            "match_ppm"
        ),
        F.expr(
            "CAST((1000000 * sum(n_match) OVER ())"
            " DIV sum(n_events) OVER () AS BIGINT)"
        ).alias("overall_ppm"),
    )


@declared(
    "diff_in_diff_value",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events
    ),
    bounds AS (
      SELECT CAST(min(day) AS BIGINT) AS lo, CAST(max(day) AS BIGINT) AS hi
      FROM ev
    ),
    mid AS (SELECT CAST((lo + hi + 1) // 2 AS BIGINT) AS m FROM bounds),
    treated AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END AS treat,
             CASE WHEN e.day >= mi.m THEN 1 ELSE 0 END AS post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(e.v) AS BIGINT) AS s
      FROM ev e
      LEFT JOIN treated t ON t.user_id = e.user_id
      CROSS JOIN mid mi
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN n END) AS BIGINT)
          AS n_t_pre,
        CAST(sum(CASE WHEN treat = 1 AND post = 0 THEN s END) AS BIGINT)
          AS s_t_pre,
        CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN n END) AS BIGINT)
          AS n_t_post,
        CAST(sum(CASE WHEN treat = 1 AND post = 1 THEN s END) AS BIGINT)
          AS s_t_post,
        CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN n END) AS BIGINT)
          AS n_c_pre,
        CAST(sum(CASE WHEN treat = 0 AND post = 0 THEN s END) AS BIGINT)
          AS s_c_pre,
        CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN n END) AS BIGINT)
          AS n_c_post,
        CAST(sum(CASE WHEN treat = 0 AND post = 1 THEN s END) AS BIGINT)
          AS s_c_post
      FROM cells
    )
    SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
           CAST(s_t_pre AS DOUBLE) / n_t_pre AS mean_t_pre_c,
           CAST(s_t_post AS DOUBLE) / n_t_post AS mean_t_post_c,
           CAST(s_c_pre AS DOUBLE) / n_c_pre AS mean_c_pre_c,
           CAST(s_c_post AS DOUBLE) / n_c_post AS mean_c_post_c,
           (CAST(s_t_post AS DOUBLE) / n_t_post
              - CAST(s_t_pre AS DOUBLE) / n_t_pre)
             - (CAST(s_c_post AS DOUBLE) / n_c_post
                - CAST(s_c_pre AS DOUBLE) / n_c_pre) AS did_c
    FROM wide
    """,
)
def diff_in_diff_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the purchase-cohort effect
    on mean event value: treated = users who ever purchase, periods =
    halves of the observed day range (the `mcnemar_activity_shift`
    midpoint convention); DiD = (post - pre change for treated) minus
    (post - pre change for controls) in cents -- the parallel-trends
    causal estimator that closes the experimentation family
    (`ab_conversion_ztest` randomized compare, `cuped_variance_reduction`
    variance control, this the observational fallback).

    Each of the four cell means is ONE IEEE division of an exact
    integer (sum-of-cents, count); the estimate chains those identical
    doubles, so it is bit-equal cross-engine with no rounding
    convention.  NULL cells (an empty quadrant) propagate to a NULL
    estimate on both engines -- the honest degenerate answer.

    Plan: one events scan into (user, day, cents) plus one treated-user
    semi-dim (broadcast left join marks treatment); the 2x2 rollup is a
    4-group partial agg -- no window, no sort, user-scale bounded.
    """
    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.col("event_type"),
    ).localCheckpoint(eager=True)  # bounds + treated + cells consumers
    bounds = ev.agg(
        F.min("day").cast("bigint").alias("lo"),
        F.max("day").cast("bigint").alias("hi"),
    )
    mid = bounds.select(F.expr("CAST((lo + hi + 1) DIV 2 AS BIGINT)").alias("m"))
    treated = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .withColumn("is_t", F.lit(1))
    )
    cells = (
        ev.join(F.broadcast(treated), "user_id", "left")
        .crossJoin(F.broadcast(mid))
        .groupBy(
            F.coalesce("is_t", F.lit(0)).alias("treat"),
            F.when(F.col("day") >= F.col("m"), 1).otherwise(0).alias("post"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
        )
    )

    def cell(t, p, col):
        return F.sum(
            F.when((F.col("treat") == t) & (F.col("post") == p), F.col(col))
        ).cast("bigint")

    wide = cells.agg(
        cell(1, 0, "n").alias("n_t_pre"),
        cell(1, 0, "s").alias("s_t_pre"),
        cell(1, 1, "n").alias("n_t_post"),
        cell(1, 1, "s").alias("s_t_post"),
        cell(0, 0, "n").alias("n_c_pre"),
        cell(0, 0, "s").alias("s_c_pre"),
        cell(0, 1, "n").alias("n_c_post"),
        cell(0, 1, "s").alias("s_c_post"),
    )
    m = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    return wide.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        m("s_t_pre", "n_t_pre").alias("mean_t_pre_c"),
        m("s_t_post", "n_t_post").alias("mean_t_post_c"),
        m("s_c_pre", "n_c_pre").alias("mean_c_pre_c"),
        m("s_c_post", "n_c_post").alias("mean_c_post_c"),
        (
            (m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre"))
            - (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre"))
        ).alias("did_c"),
    )


# ---------------------------------------------------------------------------
# Median-of-means robust estimator (round 7b)
# ---------------------------------------------------------------------------

# Bucket count for the median-of-means estimator: 32 buckets gives the
# standard sub-Gaussian deviation bound at ~3% bucket-failure tolerance.
MOM_BUCKETS = 32

from etl_rf_matrix_controller_spark.plans.conventions import (  # noqa: E402
    exact_avg_sql as _exact_avg_sql,
)


@declared(
    "median_of_means_value",
    oracle=f"""
    WITH bucketed AS (
      SELECT ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % {MOM_BUCKETS} AS b,
             value
      FROM events
    ),
    per_bucket AS (
      SELECT b,
             CAST(count(*) AS BIGINT) AS n,
             (2 * sum(CAST(round(value * {SCALE}) AS BIGINT)) + count(*))
               AS x
      FROM bucketed GROUP BY b
    ),
    means AS (
      SELECT b, n,
             CAST((x - x % (2 * n)) // (2 * n) AS BIGINT) AS mean_s
      FROM per_bucket
    ),
    ranked AS (
      SELECT mean_s,
             row_number() OVER (ORDER BY mean_s, b) AS rn,
             count(*) OVER () AS k
      FROM means
    ),
    mom AS (
      SELECT CAST(mean_s AS BIGINT) AS mom_s FROM ranked
      WHERE rn = (k + 1) // 2
    )
    SELECT CAST({MOM_BUCKETS} AS BIGINT) AS k_buckets,
           CAST(count(*) AS BIGINT) AS n_events,
           (SELECT mom_s FROM mom) / {SCALE}.0 AS mom_value,
           {_exact_avg_sql('value', 4)} AS mean_value
    FROM events
    """,
)
def median_of_means_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-means robust estimate of the mean event value: hash
    events into {MOM_BUCKETS} deterministic buckets (portable md5
    buckets -- the `hash_mod_sample` discipline, so bucket membership
    survives an engine migration), take each bucket's exact integer-space
    mean, and report the MEDIAN of the bucket means -- the estimator
    with sub-Gaussian deviation bounds under heavy-tailed or
    adversarially-corrupted data where the plain mean is dominated by a
    single outlier (the standard robust-statistics building block next
    to `value_mad_outliers` / `trimmed_mean_brand_price`, which trim by
    VALUE; MoM is robust by PARTITION and never discards clean mass).

    Exactness: bucket means are the conventions.py exact-avg integer
    fold (scaled 4-dec, half-up); the median picks the lower-middle
    scaled INTEGER by (mean, bucket) total order, so the only float is
    the final /10000 division.  Plan: one map-side-combinable agg to
    {MOM_BUCKETS} rows, a {MOM_BUCKETS}-row window, and a scalar cross
    join -- the corpus is touched twice (MoM pass + plain-mean contrast
    pass), both full-scan aggs with no shuffle beyond the bucket key."""
    ev = load_table(spark, sf_dir, "events")
    from etl_rf_matrix_controller_spark.operators.pipeline import hash_bucket

    per_bucket = (
        ev.select(hash_bucket(F.col("event_id"), MOM_BUCKETS).alias("b"), "value")
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (
                2 * F.sum(F.round(F.col("value") * SCALE).cast("bigint"))
                + F.count(F.lit(1))
            ).alias("x"),
        )
    )
    means = per_bucket.select(
        "b",
        F.expr("CAST((x - x % (2 * n)) DIV (2 * n) AS BIGINT)").alias("mean_s"),
    )
    w = Window.orderBy(F.asc("mean_s"), F.asc("b"))
    mom = (
        means.withColumn("rn", F.row_number().over(w))
        .withColumn("k", F.count(F.lit(1)).over(Window.partitionBy()))
        .filter(F.expr("rn = (k + 1) DIV 2"))
        .select(F.col("mean_s").cast("bigint").alias("mom_s"))
    )
    from etl_rf_matrix_controller_spark.plans.conventions import exact_avg

    summary = ev.agg(
        F.lit(MOM_BUCKETS).cast("bigint").alias("k_buckets"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        exact_avg(F.col("value"), 4).alias("mean_value"),
    )
    return summary.crossJoin(F.broadcast(mom)).select(
        "k_buckets",
        "n_events",
        (F.col("mom_s") / float(SCALE)).alias("mom_value"),
        "mean_value",
    )


@declared(
    "logrank_error_cohort_test",
    oracle="""
    WITH evs AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS fe,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    grp AS (
      SELECT user_id,
             CAST(max(CASE WHEN rn = 1 AND event_type = 'error'
                           THEN 1 ELSE 0 END) AS BIGINT) AS g,
             min(fe) AS entry,
             min(CASE WHEN event_type = 'purchase' THEN fe END) AS conv,
             max(fe) AS censor
      FROM evs GROUP BY user_id
    ),
    ud AS MATERIALIZED (
      SELECT g, (coalesce(conv, censor) - entry) // 86400 AS dur,
             CASE WHEN conv IS NOT NULL THEN 1 ELSE 0 END AS conv_f
      FROM grp
    ),
    per AS (
      SELECT dur,
             CAST(count(*) AS BIGINT) AS u,
             CAST(sum(g) AS BIGINT) AS u1,
             CAST(sum(conv_f) AS BIGINT) AS c,
             CAST(sum(conv_f * g) AS BIGINT) AS c1
      FROM ud GROUP BY dur
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_total,
             CAST(sum(g) AS BIGINT) AS n1_total
      FROM ud
    ),
    risk AS (
      SELECT dur, u, u1, c, c1,
             t.n_total
               - (CAST(sum(u) OVER (ORDER BY dur
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  - u) AS n,
             t.n1_total
               - (CAST(sum(u1) OVER (ORDER BY dur
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  - u1) AS n1,
             t.n1_total, t.n_total
      FROM per, tot t
    ),
    terms AS (
      SELECT n1_total, n_total, c1,
             (1000000 * c * n1) // n AS e_ppm,
             ((((((1000000 * c * n1) // n) * (n - n1)) // n)
               * (n - c)) // (n - 1)) AS v_ppm
      FROM risk WHERE c > 0 AND n > 1
    )
    SELECT max(n1_total) AS n1_users,
           max(n_total) - max(n1_total) AS n0_users,
           CAST(sum(c1) AS BIGINT) AS o1,
           CAST(sum(e_ppm) AS BIGINT) AS e1_ppm,
           CAST(sum(v_ppm) AS BIGINT) AS v_ppm,
           (CAST(sum(c1) * 1000000 - sum(e_ppm) AS DOUBLE)
            * CAST(sum(c1) * 1000000 - sum(e_ppm) AS DOUBLE))
             / (CAST(sum(v_ppm) AS DOUBLE) * 1000000.0e0)
             AS logrank_chi2
    FROM terms
    """,
)
def logrank_error_cohort_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test (Mantel 1966) on time-to-first-purchase:
    does a user whose FIRST event is an 'error' convert on a different
    survival curve than everyone else?  Same entry/conversion/censoring
    construction as `kaplan_meier_conversion` / `nelson_aalen_hazard`
    (which characterize ONE curve; this completes the survival family
    with the standard two-sample comparison).  At each conversion day:
    expected group-1 conversions under H0 are c*n1/n and the
    hypergeometric variance is c*(n1/n)*(1-n1/n)*(n-c)/(n-1); the
    statistic (O-E)^2/V is chi-square(1) under H0.

    Determinism: E and V accumulate as ppm FLOORS (the variance term as
    the documented nested floor so no intermediate exceeds int64 at any
    corpus size); the final chi-square is two IEEE ops on exact
    integers, bit-equal cross-engine.  Shape: one per-user rollup, one
    per-duration rollup, one ordered window over <= calendar-span rows,
    one 1-row reduce -- the group split adds two conditional sums to
    the existing survival scan, nothing corpus-squared anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id").orderBy("ts", "event_id")
    evs = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("fe"),
        F.row_number().over(w_first).alias("rn"),
    )
    grp = evs.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("rn") == 1) & (F.col("event_type") == "error"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("g"),
        F.min("fe").alias("entry"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("fe"))).alias(
            "conv"
        ),
        F.max("fe").alias("censor"),
    )
    ud = grp.select(
        "g",
        F.expr("(coalesce(conv, censor) - entry) DIV 86400").alias("dur"),
        F.when(F.col("conv").isNotNull(), 1).otherwise(0).alias("conv_f"),
    ).localCheckpoint(eager=True)  # per-day rollup + totals consumers
    per = ud.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        F.sum("g").cast("bigint").alias("u1"),
        F.sum("conv_f").cast("bigint").alias("c"),
        F.sum(F.col("conv_f") * F.col("g")).cast("bigint").alias("c1"),
    )
    tot = ud.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("g").cast("bigint").alias("n1_total"),
    )
    w = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = (
        per.withColumn("cum_u", F.sum("u").over(w).cast("bigint"))
        .withColumn("cum_u1", F.sum("u1").over(w).cast("bigint"))
        .crossJoin(F.broadcast(tot))
        .select(
            "c1",
            "n1_total",
            "n_total",
            "c",
            (F.col("n_total") - (F.col("cum_u") - F.col("u"))).alias("n"),
            (F.col("n1_total") - (F.col("cum_u1") - F.col("u1"))).alias("n1"),
        )
    )
    terms = risk.filter((F.col("c") > 0) & (F.col("n") > 1)).select(
        "n1_total",
        "n_total",
        "c1",
        F.expr("(1000000 * c * n1) DIV n").alias("e_ppm"),
        F.expr(
            "((((((1000000 * c * n1) DIV n) * (n - n1)) DIV n)"
            " * (n - c)) DIV (n - 1))"
        ).alias("v_ppm"),
    )
    return terms.agg(
        F.max("n1_total").alias("n1_users"),
        (F.max("n_total") - F.max("n1_total")).alias("n0_users"),
        F.sum("c1").cast("bigint").alias("o1"),
        F.sum("e_ppm").cast("bigint").alias("e1_ppm"),
        F.sum("v_ppm").cast("bigint").alias("v_ppm"),
        F.expr(
            "(CAST(sum(c1) * 1000000 - sum(e_ppm) AS DOUBLE)"
            " * CAST(sum(c1) * 1000000 - sum(e_ppm) AS DOUBLE))"
            " / (CAST(sum(v_ppm) AS DOUBLE) * 1000000.0e0)"
        ).alias("logrank_chi2"),
    )


# Benjamini-Hochberg step-up at FDR level ALPHA = BH_ALPHA_NUM/BH_ALPHA_DEN.
BH_ALPHA_NUM, BH_ALPHA_DEN = 1, 20


@declared(
    "bh_fdr_brand_price",
    oracle=f"""
    WITH px AS (
      SELECT p_brand, CAST(round(p_retailprice * 100) AS BIGINT) AS x
      FROM part
    ),
    per AS MATERIALIZED (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS nb,
             CAST(sum(x) AS BIGINT) AS sb
      FROM px GROUP BY p_brand
    ),
    gtot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM px
    ),
    z AS (
      SELECT p_brand, nb,
             CAST(sb * g.n - g.s * nb AS DOUBLE)
               / (CAST(nb AS DOUBLE) * CAST(g.n AS DOUBLE)) AS md,
             (CAST(g.sxx AS DOUBLE)
              - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE)
                / CAST(g.n AS DOUBLE)) / CAST(g.n AS DOUBLE) AS var
      FROM per, gtot g
    ),
    pz AS (
      SELECT p_brand, nb, md,
             CAST(nb AS DOUBLE) * md * md / var AS z2
      FROM z
    ),
    pv AS (
      SELECT p_brand, nb, md, z2,
             CASE WHEN z2 <= 1.0e0 THEN 1.0e0 ELSE 1.0e0 / z2 END AS p_cheb
      FROM pz
    ),
    ranked AS (
      SELECT p_brand, nb, md, z2, p_cheb,
             CAST(row_number() OVER (ORDER BY p_cheb, p_brand)
                  AS BIGINT) AS k,
             CAST(count(*) OVER () AS BIGINT) AS m
      FROM pv
    ),
    stepped AS (
      SELECT *,
             CASE WHEN p_cheb <= CAST(k * {BH_ALPHA_NUM} AS DOUBLE)
                               / (CAST(m AS DOUBLE)
                                  * CAST({BH_ALPHA_DEN} AS DOUBLE))
                  THEN k ELSE 0 END AS pass_k
      FROM ranked
    )
    SELECT p_brand, nb AS n_parts, md AS mean_diff_cents, z2, p_cheb, k,
           CAST(CASE WHEN k <= max(pass_k) OVER () THEN 1 ELSE 0 END
                AS BIGINT) AS rejected
    FROM stepped
    """,
)
def bh_fdr_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR step-up (1995) over the per-brand family
    of mean-price tests: one z^2 statistic per brand (brand mean vs the
    global mean, global variance), p-values via the distribution-free
    Chebyshev bound P(|Z| >= z) <= 1/z^2, then the BH rule -- reject
    ranks 1..k* where k* = max{{k : p_(k) <= k*alpha/m}} at alpha =
    {BH_ALPHA_NUM}/{BH_ALPHA_DEN}.  The multiple-testing control the
    per-test family (welch_t / mann_whitney / ab_conversion_ztest)
    lacked: run m tests and the expected false-discovery FRACTION stays
    <= alpha, the screening rule a 100-TB pipeline applies when it
    tests thousands of segments at once.

    Chebyshev instead of the normal CDF because Phi needs exp/erf --
    libm calls that are NOT bit-stable across engines (the documented
    ln() trap) -- while 1/z^2 is one IEEE division on exact-integer-
    derived doubles: conservative (never anti-conservative) and
    bit-equal.  Every float here is IEEE +,*,/ on exact integers in
    identical order; the step-up threshold k*alpha/m is likewise pure
    IEEE.  Shape: one part scan -> 25-row brand rollup -> 25-row
    window; the 1-row global side rides a broadcast cross join.
    """
    px = load_table(spark, sf_dir, "part").select(
        "p_brand", F.round(F.col("p_retailprice") * 100).cast("bigint").alias("x")
    )
    per = px.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("x").cast("bigint").alias("sb"),
    )
    glob = px.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    z = per.crossJoin(F.broadcast(glob)).select(
        "p_brand",
        "nb",
        F.expr(
            "CAST(sb * n - s * nb AS DOUBLE)"
            " / (CAST(nb AS DOUBLE) * CAST(n AS DOUBLE))"
        ).alias("md"),
        F.expr(
            "(CAST(sxx AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
            " / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)"
        ).alias("var"),
    )
    pv = z.select(
        "p_brand",
        "nb",
        "md",
        F.expr("CAST(nb AS DOUBLE) * md * md / var").alias("z2"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN z2 <= 1.0e0 THEN 1.0e0 ELSE 1.0e0 / z2 END"
        ).alias("p_cheb"),
    )
    w_rank = Window.orderBy(F.asc("p_cheb"), F.asc("p_brand"))
    w_all = Window.partitionBy()
    ranked = pv.select(
        "*",
        F.row_number().over(w_rank).cast("bigint").alias("k"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("m"),
    )
    stepped = ranked.withColumn(
        "pass_k",
        F.expr(
            f"CASE WHEN p_cheb <= CAST(k * {BH_ALPHA_NUM} AS DOUBLE)"
            f" / (CAST(m AS DOUBLE) * CAST({BH_ALPHA_DEN} AS DOUBLE))"
            " THEN k ELSE 0 END"
        ),
    )
    return stepped.select(
        "p_brand",
        F.col("nb").alias("n_parts"),
        F.col("md").alias("mean_diff_cents"),
        "z2",
        "p_cheb",
        "k",
        F.expr(
            "CAST(CASE WHEN k <= max(pass_k) OVER () THEN 1 ELSE 0 END"
            " AS BIGINT)"
        ).alias("rejected"),
    )


# Croston demand definition: daily count of purchase events whose value
# exceeds CROSTON_THR -- high-ticket purchases are genuinely
# intermittent at pytest scale (23/30 zero-demand days at sf0.001).
CROSTON_THR = 160
# SES smoothing constant, written as the 0.3e0 literal on BOTH engines
# (bare 0.3 parses DECIMAL in DuckDB -- the documented trap).
_CROSTON_ALPHA = "0.3e0"


@declared(
    "croston_intermittent_forecast",
    oracle=f"""
    WITH spine AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(count(*) FILTER (event_type = 'purchase'
                                   AND value > {CROSTON_THR})
                  AS BIGINT) AS d
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, d,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM spine
    ),
    demand AS (
      SELECT day, d, i,
             i - coalesce(lag(i) OVER (ORDER BY day), 0) AS p
      FROM idx WHERE d > 0
    ),
    lists AS (
      SELECT CAST(count(*) AS BIGINT) AS n_demand,
             CAST(sum(d) AS BIGINT) AS total_demand,
             list(CAST(d AS DOUBLE) ORDER BY day) AS zs,
             list(CAST(p AS DOUBLE) ORDER BY day) AS ps
      FROM demand
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM spine),
    folded AS (
      SELECT t.n_days, l.n_demand, l.total_demand,
             list_reduce(l.zs,
               (acc, x) -> acc + {_CROSTON_ALPHA} * (x - acc)) AS z_hat,
             list_reduce(l.ps,
               (acc, x) -> acc + {_CROSTON_ALPHA} * (x - acc)) AS p_hat
      FROM lists l, tot t
    )
    SELECT n_days, n_demand, total_demand, z_hat, p_hat,
           z_hat / p_hat AS croston_per_day,
           CAST(total_demand AS DOUBLE) / CAST(n_days AS DOUBLE)
             AS mean_demand_per_day
    FROM folded
    """,
)
def croston_intermittent_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) for intermittent demand: when most
    periods have ZERO demand, SES on the raw series chases zeros and
    systematically under-forecasts just after each demand spike.
    Croston instead smooths two separate series -- nonzero demand SIZES
    z_j and inter-demand INTERVALS p_j -- and forecasts demand per
    period as z_hat/p_hat.  Completes the forecasting family's
    intermittent corner (Holt = trend, Holt-Winters = seasonality,
    seasonal-naive = baseline; none of them handle sparse series).
    Demand here: daily count of purchases with value > {CROSTON_THR}.

    Both SES folds are IDENTICAL sequential float recursions on the two
    engines: DuckDB list_reduce seeds with the FIRST element, so the
    Spark aggregate() seeds with element_at(.., 1) and folds the slice
    from 2 (the documented mirror); each step is acc + {_CROSTON_ALPHA}
    * (x - acc) -- same literals, same order, bit-equal.  The two folds
    have scalar state each (NO cross-field references), so list_reduce
    is safe here; multi-component folds use the recursive-CTE pattern.
    First interval convention: p_1 = the first demand day's index.
    Shape: one events scan -> calendar-sized spine -> two <=|demand
    days| arrays folded on the driver-free 1-row frame.
    """
    ev = load_table(spark, sf_dir, "events")
    spine = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > CROSTON_THR),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("d")
    ).localCheckpoint(eager=True)  # idx/demand chain + n_days consumer
    idx = spine.withColumn(
        "i", F.row_number().over(Window.orderBy("day")).cast("bigint")
    )
    w_lag = Window.orderBy("day")
    demand = idx.filter(F.col("d") > 0).select(
        "day",
        "d",
        "i",
        (F.col("i") - F.coalesce(F.lag("i").over(w_lag), F.lit(0))).alias(
            "p"
        ),
    )
    lists = demand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_demand"),
        F.sum("d").cast("bigint").alias("total_demand"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, CAST(d AS DOUBLE)"
            " AS z))), s -> s.z)"
        ).alias("zs"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, CAST(p AS DOUBLE)"
            " AS pv))), s -> s.pv)"
        ).alias("ps"),
    )
    tot = spine.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    fold = (
        "aggregate(slice({arr}, 2, size({arr}) - 1),"
        " element_at({arr}, 1),"
        f" (acc, x) -> acc + {_CROSTON_ALPHA} * (x - acc))"
    )
    folded = lists.crossJoin(F.broadcast(tot)).select(
        "n_days",
        "n_demand",
        "total_demand",
        F.expr(fold.format(arr="zs")).alias("z_hat"),
        F.expr(fold.format(arr="ps")).alias("p_hat"),
    )
    return folded.select(
        "n_days",
        "n_demand",
        "total_demand",
        "z_hat",
        "p_hat",
        F.expr("z_hat / p_hat").alias("croston_per_day"),
        F.expr(
            "CAST(total_demand AS DOUBLE) / CAST(n_days AS DOUBLE)"
        ).alias("mean_demand_per_day"),
    )


@declared(
    "cvm_two_sample_value",
    oracle="""
    WITH pooled AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS v
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    ranked AS (
      SELECT event_type,
             CAST(row_number() OVER (ORDER BY v, event_id) AS BIGINT) AS r,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY v, event_id) AS BIGINT) AS i
      FROM pooled
    ),
    per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum((r - i) * (r - i)) AS BIGINT) AS s
      FROM ranked GROUP BY event_type
    ),
    wide AS (
      SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n_a,
             max(CASE WHEN event_type = 'purchase' THEN s END) AS s_a,
             max(CASE WHEN event_type = 'click' THEN n END) AS n_b,
             max(CASE WHEN event_type = 'click' THEN s END) AS s_b
      FROM per
    ),
    stat AS (
      SELECT n_a, n_b, s_a, s_b,
             CAST((1000000000 * (CAST(n_a AS HUGEINT) * s_a
                                 + CAST(n_b AS HUGEINT) * s_b))
                  // (CAST(n_a AS HUGEINT) * n_b * (n_a + n_b))
                  AS BIGINT) AS t1_ppb,
             CAST((1000000000 * (4 * n_a * n_b - 1))
                  // (6 * (n_a + n_b)) AS BIGINT) AS t2_ppb
      FROM wide
    )
    SELECT n_a, n_b, s_a, s_b,
           CAST(t1_ppb - t2_ppb AS BIGINT) AS cvm_t_ppb,
           CAST(t1_ppb - t2_ppb AS DOUBLE) / 1000000000e0 AS cvm_t
    FROM stat
    """,
)
def cvm_two_sample_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramer-von Mises test (Anderson 1962 rank form) on
    purchase vs click values: T = U/(n*m*(n+m)) - (4nm-1)/(6(n+m))
    with U = n * sum_i (r_i - i)^2 + m * sum_j (s_j - j)^2 over pooled
    ranks -- the INTEGRAL-distance counterpart of the KS sup-distance
    (`value_ks_drift`): KS reacts to the single worst ECDF gap, CvM to
    the accumulated gap everywhere, so a broad mild shift that KS
    under-weights lights CvM up.  Ties (discretized cents) break by
    event_id, the documented deterministic-tiebreak convention.

    U exceeds int64 at bench scale, so the rank-square sums multiply
    out in HUGEINT / DECIMAL(38,0) (the BM25 envelope) and the
    statistic is emitted as a ppb FLOOR difference of two integer
    divisions -- no >2^53 double cast whose rounding could differ
    cross-engine.  Shape: one events scan filtered to the two samples,
    one pooled-rank window (sample-pair-sized, not corpus-sized), a
    2-row rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    pooled = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    ranked = pooled.select(
        "event_type",
        F.row_number()
        .over(Window.orderBy("v", "event_id"))
        .cast("bigint")
        .alias("r"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("v", "event_id"))
        .cast("bigint")
        .alias("i"),
    )
    per = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("r") - F.col("i")) * (F.col("r") - F.col("i")))
        .cast("bigint")
        .alias("s"),
    )
    wide = per.agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("n"))).alias(
            "n_a"
        ),
        F.max(F.when(F.col("event_type") == "purchase", F.col("s"))).alias(
            "s_a"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("n"))).alias(
            "n_b"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("s"))).alias(
            "s_b"
        ),
    )
    stat = wide.select(
        "n_a",
        "n_b",
        "s_a",
        "s_b",
        F.expr(
            "CAST((1000000000 * (CAST(n_a AS DECIMAL(38,0)) * s_a"
            " + CAST(n_b AS DECIMAL(38,0)) * s_b))"
            " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * (n_a + n_b))"
            " AS BIGINT)"
        ).alias("t1_ppb"),
        F.expr(
            "CAST((1000000000 * (4 * n_a * n_b - 1))"
            " DIV (6 * (n_a + n_b)) AS BIGINT)"
        ).alias("t2_ppb"),
    )
    return stat.select(
        "n_a",
        "n_b",
        "s_a",
        "s_b",
        (F.col("t1_ppb") - F.col("t2_ppb")).cast("bigint").alias("cvm_t_ppb"),
        F.expr(
            "CAST(t1_ppb - t2_ppb AS DOUBLE) / 1000000000e0"
        ).alias("cvm_t"),
    )


@declared(
    "theil_u_forecast_compare",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1
    ),
    lagged AS MATERIALIZED (
      SELECT day, v,
             lag(v, 1) OVER (ORDER BY day) AS l1,
             lag(v, 2) OVER (ORDER BY day) AS l2,
             lag(v, 3) OVER (ORDER BY day) AS l3,
             lag(v, 7) OVER (ORDER BY day) AS l7
      FROM daily
    ),
    scored AS (
      SELECT day,
             (3 * v - 3 * l1) * (3 * v - 3 * l1) AS se_naive,
             (3 * v - (l1 + l2 + l3)) * (3 * v - (l1 + l2 + l3)) AS se_ma3,
             (3 * v - 3 * l7) * (3 * v - 3 * l7) AS se_snaive7
      FROM lagged WHERE l7 IS NOT NULL
    ),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(se_naive) AS BIGINT) AS sse_naive,
             CAST(sum(se_ma3) AS BIGINT) AS sse_ma3,
             CAST(sum(se_snaive7) AS BIGINT) AS sse_snaive7
      FROM scored
    )
    SELECT model, n_forecasts, sse_scaled, u2_ppm FROM (
      SELECT 'ma3' AS model, n AS n_forecasts, sse_ma3 AS sse_scaled,
             CAST((1000000 * CAST(sse_ma3 AS HUGEINT)) // sse_naive AS BIGINT)
               AS u2_ppm
      FROM sums
      UNION ALL
      SELECT 'snaive7', n, sse_snaive7,
             CAST((1000000 * CAST(sse_snaive7 AS HUGEINT)) // sse_naive
                  AS BIGINT)
      FROM sums
      UNION ALL
      SELECT 'naive', n, sse_naive, CAST(1000000 AS BIGINT)
      FROM sums
    )
    """,
)
def theil_u_forecast_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U^2 forecast comparison (Theil 1966): one-step-ahead SSE
    of each candidate model over the SAME target days, normalized by
    the naive last-value forecast -- u2 < 1 means the model beats
    persistence, the bar every published forecast must clear.  Models:
    3-day moving average and seasonal-naive-7, scored only on days
    where all lags exist so the comparison set is identical.  The
    model-SELECTION layer over the forecasting family (Holt /
    Holt-Winters / Croston produce forecasts; this says which baseline
    even deserves beating).

    All-integer: errors are computed at a common 3x scale (the MA3
    numerator is the 3-day sum, so 3*y - sum3 is exact; naive and
    seasonal errors carry the same factor, which cancels in every
    ratio), SSEs are int64 sums, and the U^2 ppm multiply runs in
    DECIMAL(38,0)/HUGEINT -- 1e6 * SSE exceeds int64 once daily deltas
    reach ~1e6 cents (sf0.1), an overflow a count()-only check never
    sees because Catalyst prunes the column; the full-materialization
    bench caught it.  Shape: one
    events scan -> calendar rollup -> one lag window over <= |days|
    rows -> 1-row sums exploded into the 3-row comparison table.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 2).over(w).alias("l2"),
        F.lag("v", 3).over(w).alias("l3"),
        F.lag("v", 7).over(w).alias("l7"),
    )
    scored = lagged.filter(F.col("l7").isNotNull()).select(
        F.expr("(3 * v - 3 * l1) * (3 * v - 3 * l1)").alias("se_naive"),
        F.expr(
            "(3 * v - (l1 + l2 + l3)) * (3 * v - (l1 + l2 + l3))"
        ).alias("se_ma3"),
        F.expr("(3 * v - 3 * l7) * (3 * v - 3 * l7)").alias("se_snaive7"),
    )
    sums = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("se_naive").cast("bigint").alias("sse_naive"),
        F.sum("se_ma3").cast("bigint").alias("sse_ma3"),
        F.sum("se_snaive7").cast("bigint").alias("sse_snaive7"),
    ).localCheckpoint(eager=True)  # three output legs
    ma3 = sums.select(
        F.lit("ma3").alias("model"),
        F.col("n").alias("n_forecasts"),
        F.col("sse_ma3").alias("sse_scaled"),
        F.expr(
            "CAST((1000000 * CAST(sse_ma3 AS DECIMAL(38,0)))"
            " DIV sse_naive AS BIGINT)"
        ).alias("u2_ppm"),
    )
    sn7 = sums.select(
        F.lit("snaive7").alias("model"),
        F.col("n").alias("n_forecasts"),
        F.col("sse_snaive7").alias("sse_scaled"),
        F.expr(
            "CAST((1000000 * CAST(sse_snaive7 AS DECIMAL(38,0)))"
            " DIV sse_naive AS BIGINT)"
        ).alias("u2_ppm"),
    )
    nv = sums.select(
        F.lit("naive").alias("model"),
        F.col("n").alias("n_forecasts"),
        F.col("sse_naive").alias("sse_scaled"),
        F.lit(1000000).cast("bigint").alias("u2_ppm"),
    )
    return ma3.unionByName(sn7).unionByName(nv)


# Split-conformal miscoverage level: alpha = 1/10 -> 90% intervals.
CONF_ALPHA_DEN = 10


@declared(
    "split_conformal_interval",
    oracle=f"""
    WITH base AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS v,
             event_id % 3 AS fold
      FROM events
    ),
    fit AS (
      SELECT event_type,
             CAST(sum(v) // count(*) AS BIGINT) AS mu
      FROM base WHERE fold = 0 GROUP BY event_type
    ),
    cal AS MATERIALIZED (
      SELECT b.event_type, abs(b.v - f.mu) AS r
      FROM base b JOIN fit f ON f.event_type = b.event_type
      WHERE b.fold = 1
    ),
    caln AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
      FROM cal GROUP BY event_type
    ),
    qhat AS (
      SELECT c.event_type, c.r AS q_hat, n.n_cal
      FROM (
        SELECT event_type, r,
               row_number() OVER (PARTITION BY event_type ORDER BY r)
                 AS rn
        FROM cal
      ) c
      JOIN caln n ON n.event_type = c.event_type
      WHERE c.rn = least(n.n_cal,
                         ((n.n_cal + 1) * ({CONF_ALPHA_DEN} - 1)
                          + {CONF_ALPHA_DEN} - 1) // {CONF_ALPHA_DEN})
    ),
    test AS (
      SELECT b.event_type,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN abs(b.v - f.mu) <= q.q_hat
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM base b
      JOIN fit f ON f.event_type = b.event_type
      JOIN qhat q ON q.event_type = b.event_type
      WHERE b.fold = 2
      GROUP BY b.event_type
    )
    SELECT t.event_type, f.mu AS mu_cents, q.n_cal, q.q_hat,
           t.n_test, t.n_covered,
           CAST((1000000 * t.n_covered) // t.n_test AS BIGINT)
             AS coverage_ppm
    FROM test t
    JOIN fit f ON f.event_type = t.event_type
    JOIN qhat q ON q.event_type = t.event_type
    """,
)
def split_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al. 2005; the
    distribution-free UQ recipe production ML actually ships): fit a
    point predictor on fold 0 (per-type floored mean), take q_hat = the
    ceil((n+1)(1-alpha))-th smallest absolute residual on the held-out
    calibration fold 1, and audit the guaranteed >= 1-alpha coverage of
    mu +- q_hat on fold 2.  alpha = 1/{CONF_ALPHA_DEN}.  The coverage
    guarantee holds for ANY predictor -- that's the point of
    conformal -- so the deliberately crude mean predictor makes the
    audit transparent.  Completes the uncertainty family:
    bootstrap_mean_ci bounds the MEAN, this bounds the next
    OBSERVATION.

    All-integer: residuals are cent ints, the conformal rank
    ceil((n+1)(1-alpha)) is an integer ceiling division (clamped to
    n_cal for tiny folds), coverage is a ppm floor.  Shape: one events
    scan -> three fold-filtered passes over a checkpointed projection
    (fit rollup, calibration rank window partitioned by type, test
    rollup) -- the rank window is calibration-fold-sized.
    """
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        (F.col("event_id") % 3).alias("fold"),
    ).localCheckpoint(eager=True)  # fit + calibration + test consumers
    fit = base.filter(F.col("fold") == 0).groupBy("event_type").agg(
        F.expr("CAST(sum(v) DIV count(*) AS BIGINT)").alias("mu")
    )
    cal = base.filter(F.col("fold") == 1).join(
        F.broadcast(fit), "event_type"
    ).select("event_type", F.abs(F.col("v") - F.col("mu")).alias("r"))
    caln = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cal")
    )
    w = Window.partitionBy("event_type").orderBy("r")
    qhat = (
        cal.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(caln), "event_type")
        .filter(
            F.expr(
                "rn = least(n_cal,"
                f" ((n_cal + 1) * ({CONF_ALPHA_DEN} - 1)"
                f" + {CONF_ALPHA_DEN} - 1) DIV {CONF_ALPHA_DEN})"
            )
        )
        .select("event_type", F.col("r").alias("q_hat"), "n_cal")
    )
    test = (
        base.filter(F.col("fold") == 2)
        .join(F.broadcast(fit), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("mu")) <= F.col("q_hat"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return (
        test.join(F.broadcast(fit), "event_type")
        .join(F.broadcast(qhat), "event_type")
        .select(
            "event_type",
            F.col("mu").alias("mu_cents"),
            "n_cal",
            "q_hat",
            "n_test",
            "n_covered",
            F.expr(
                "CAST((1000000 * n_covered) DIV n_test AS BIGINT)"
            ).alias("coverage_ppm"),
        )
    )


@declared(
    "quantile_treatment_effect",
    oracle="""
    WITH vals AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v,
             event_id
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    ranked AS (
      SELECT event_type, v,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY v, event_id) AS BIGINT)
               AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM vals
    ),
    dec AS (
      SELECT d.q, r.event_type, r.v
      FROM ranked r
      JOIN (SELECT unnest(generate_series(1, 9)) AS q) d
        ON r.rn = ((d.q * r.n + 9) // 10)
    )
    SELECT q AS decile,
           max(CASE WHEN event_type = 'purchase' THEN v END) AS q_purchase,
           max(CASE WHEN event_type = 'click' THEN v END) AS q_click,
           max(CASE WHEN event_type = 'purchase' THEN v END)
             - max(CASE WHEN event_type = 'click' THEN v END) AS qte_cents
    FROM dec GROUP BY q
    """,
)
def quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects (Doksum 1974): the per-decile
    difference between the purchase and click value distributions --
    the DISTRIBUTIONAL effect a mean test compresses into one number
    (`welch_t_value_test` can read ~0 while tails diverge wildly; the
    QTE curve shows WHERE the distributions differ).  Quantiles are
    type-7-free exact order statistics: the ceil(q*n/10)-th smallest
    value (ties broken by event_id for a deterministic rank), so every
    output is an exact cent integer on both engines.

    Shape: one events scan filtered to the two samples, one per-type
    rank window (sample-sized), a 9-row decile join, a 9-row pivot
    rollup.
    """
    ev = load_table(spark, sf_dir, "events")
    vals = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        "event_id",
    )
    w_rank = Window.partitionBy("event_type").orderBy("v", "event_id")
    w_all = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type",
        "v",
        F.row_number().over(w_rank).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    deciles = ranked.sparkSession.range(1, 10).select(
        F.col("id").cast("bigint").alias("q")
    )
    dec = ranked.join(
        F.broadcast(deciles),
        F.col("rn") == F.expr("((q * n + 9) DIV 10)"),
    )
    return dec.groupBy(F.col("q").alias("decile")).agg(
        F.max(F.when(F.col("event_type") == "purchase", F.col("v"))).alias(
            "q_purchase"
        ),
        F.max(F.when(F.col("event_type") == "click", F.col("v"))).alias(
            "q_click"
        ),
        (
            F.max(F.when(F.col("event_type") == "purchase", F.col("v")))
            - F.max(F.when(F.col("event_type") == "click", F.col("v")))
        ).alias("qte_cents"),
    )
