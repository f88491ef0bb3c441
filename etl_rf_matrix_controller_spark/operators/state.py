"""Keyed-state operators: last-write-wins routing state and as-of joins.

Reference semantics: the route map is a sparse ``Dict[int, int]`` where a
point write unconditionally overwrites (``etl_controller.py:2444``) and a
telemetry poll replaces state wholesale (``etl_controller.py:2535-2537``);
write-then-readback verification re-reads state after a command
(``etl_controller.py:2446-2448``).

Spark re-expression: latest-by-key via ``row_number() == 1`` over a
descending event-time window (W1 in SURVEY.md SS2.5) and an as-of join via
the union-merge pattern (J7/T5) -- both single-shuffle, key-partitioned,
linear at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "route_latest_state",
    oracle="""
    SELECT user_id, last_event_type, last_value, last_ts
    FROM (
      SELECT user_id,
             event_type AS last_event_type,
             round(value, 2) AS last_value,
             ts AS last_ts,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
)
def route_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins state table: newest event per key.

    Mirrors the route map's overwrite semantics (etl_controller.py:2444,
    2535-2537) with ``events.user_id`` as the output id and ``ts`` as the
    write time.  One shuffle on the state key; at scale the key partitioning
    is exactly the state-store layout a streaming upsert would use.
    ``event_id`` is the unique total-order tiebreaker (driver hash needs
    determinism under equal timestamps).
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round("value", 2).alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
    )


@declared(
    "dedup_event_ids",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM (
      SELECT event_id, user_id, event_type,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY ts, user_id) AS rn
      FROM (
        SELECT event_id, user_id, event_type, ts FROM events
        UNION ALL
        SELECT event_id, user_id, event_type, ts FROM events
        WHERE event_id % 7 = 0
      ) doubled
    ) t WHERE rn = 1
    """,
)
def dedup_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once ingestion dedup: drop redelivered events by id.

    At-least-once transports redeliver (synthesized here: every 7th event
    re-appended); the consumer keeps one row per event id.  Batch:
    window keep-first (== dropDuplicates with a deterministic survivor).
    Streaming: ``dropDuplicatesWithinWatermark`` bounds the id state by
    event time (tests/test_streaming.py asserts batch == stream).
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    doubled = events.unionByName(events.filter(F.col("event_id") % 7 == 0))
    w = Window.partitionBy("event_id").orderBy("ts", "user_id")
    return (
        doubled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


@declared(
    "asof_latest_order",
    oracle="""
    SELECT event_id, user_id, ts, asof_orderkey, asof_orderdate
    FROM (
      SELECT e.event_id, e.user_id, e.ts,
             o.o_orderkey AS asof_orderkey,
             o.o_orderdate AS asof_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e
      JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) t
    WHERE rn = 1
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order at-or-before its ts.

    Mirrors deferred write-verification (etl_controller.py:2446-2448): a
    command row is matched to the most recent observed state.  Implemented
    with the scalable union-merge pattern instead of an inequality join:
    tag both streams, sort once within each key partition, and carry the
    last seen order forward with ``last(..., ignorenulls=True)``.  This is
    ONE shuffle on the key and never materializes the (event x order)
    cross-range -- the naive ``o_orderdate <= ts`` theta-join the oracle
    uses would explode at 100 TB.

    Tie rule: an order dated exactly at the event ts is visible (kind 0
    sorts before kind 1); among equal dates the max orderkey wins (orderkey
    asc + ``last``), matching the oracle's ``ORDER BY o_orderdate DESC,
    o_orderkey DESC ... rn = 1``.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    order_rows = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("kind"),
        F.col("o_orderkey").alias("o_orderkey"),
        F.col("o_orderdate").alias("o_orderdate"),
        F.lit(None).cast("bigint").alias("event_id"),
    )
    event_rows = events.select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        "event_id",
    )
    merged = order_rows.unionByName(event_rows)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("asof_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("asof_orderdate", F.last("o_orderdate", ignorenulls=True).over(w))
        .filter((F.col("kind") == 1) & F.col("asof_orderkey").isNotNull())
        .select("event_id", "user_id", "ts", "asof_orderkey", "asof_orderdate")
    )


@declared(
    "state_diff_classify",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS half
      FROM events
    ),
    latest AS (
      SELECT user_id, half, event_type
      FROM (
        SELECT user_id, half, event_type,
               row_number() OVER (PARTITION BY user_id, half
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM marked
      ) r WHERE rn = 1
    ),
    diff AS (
      SELECT user_id,
             max(CASE WHEN half = 0 THEN event_type END) AS old_state,
             max(CASE WHEN half = 1 THEN event_type END) AS new_state
      FROM latest GROUP BY user_id
    )
    SELECT user_id, old_state, new_state,
           CASE WHEN old_state IS NULL THEN 'added'
                WHEN new_state IS NULL THEN 'removed'
                WHEN old_state <> new_state THEN 'changed'
                ELSE 'unchanged' END AS change_class
    FROM diff
    """,
)
def state_diff_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-snapshot state diff: latest value per key in each of
    two poll windows, classified added / removed / changed / unchanged --
    the relational form of the reference's delta-invalidation update
    (crosshair prev-vs-current recompute, etl_controller.py:1839-1906,
    and the wholesale poll replace at :2535-2537, which this turns into
    a keyed incremental diff).

    ONE scan: the window ranks within (key, half) so both snapshots come
    out of a single shuffle; the half-pivot is a max(CASE) aggregate on
    the same key (exchange reused).  Classification is pure CASE logic
    on equality of stored strings -- hash-exact.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    half = (F.col("ts") >= F.to_timestamp(F.lit("2024-01-15"))).cast("int")
    w = Window.partitionBy("user_id", "half").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("half", half)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    diff = latest.groupBy("user_id").agg(
        F.max(F.when(F.col("half") == 0, F.col("event_type"))).alias("old_state"),
        F.max(F.when(F.col("half") == 1, F.col("event_type"))).alias("new_state"),
    )
    return diff.select(
        "user_id",
        "old_state",
        "new_state",
        F.when(F.col("old_state").isNull(), "added")
        .when(F.col("new_state").isNull(), "removed")
        .when(F.col("old_state") != F.col("new_state"), "changed")
        .otherwise("unchanged")
        .alias("change_class"),
    )


@declared(
    "asof_next_order",
    oracle="""
    SELECT o_orderkey, user_id, o_orderdate, next_event_id, next_event_ts
    FROM (
      SELECT o.o_orderkey, o.o_custkey AS user_id, o.o_orderdate,
             e.event_id AS next_event_id,
             e.ts AS next_event_ts,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY e.ts ASC, e.event_id ASC
             ) AS rn
      FROM orders o
      JOIN events e
        ON e.user_id = o.o_custkey AND e.ts > o.o_orderdate
    ) t
    WHERE rn = 1
    """,
)
def asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each order, the EARLIEST event of its
    customer strictly after the order date -- the response-matching
    direction (a command matched to the next observed effect), the dual
    of asof_latest_order's state-at-command direction; together they
    complete the as-of family around the reference's verify loop
    (etl_controller.py:2446-2448 polls for the effect AFTER a write).

    Same scalable union-merge as the backward form, mirrored: one
    shuffle on the key, a [current row, unbounded following] window,
    ``first(..., ignorenulls=True)``.  Strictness encoded in the sort:
    events sort BEFORE orders at an equal timestamp (kind 0 < 1), so a
    same-instant event is NOT visible to the order's forward-looking
    window -- matching the oracle's ``e.ts > o.o_orderdate`` exactly;
    among equal later timestamps the min event_id wins (event_id asc +
    first).  Never materializes the order x event cross-range the
    oracle's theta-join implies.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    event_rows = events.select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("e_id"),
        F.col("ts").alias("e_ts"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    order_rows = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("bigint").alias("e_id"),
        F.lit(None).cast("timestamp").alias("e_ts"),
        "o_orderkey",
        "o_orderdate",
    )
    merged = event_rows.unionByName(order_rows)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), F.col("e_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.withColumn(
            "next_event_id", F.first("e_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "next_event_ts", F.first("e_ts", ignorenulls=True).over(w)
        )
        .filter((F.col("kind") == 1) & F.col("next_event_id").isNotNull())
        .select(
            "o_orderkey",
            "user_id",
            "o_orderdate",
            "next_event_id",
            "next_event_ts",
        )
    )


@declared(
    "route_flap_detection",
    oracle="""
    WITH ch AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CASE WHEN event_type <> lag(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS chg
      FROM events
    )
    SELECT user_id, day,
           CAST(sum(chg) AS BIGINT) AS n_changes,
           CAST(count(*) AS BIGINT) AS n_events
    FROM ch
    GROUP BY user_id, day
    HAVING sum(chg) >= 3
    """,
)
def route_flap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flap detection: keys whose state CHANGED >= 3 times within a day
    -- the oscillation alarm a routing controller needs on top of
    last-write-wins state (a route that keeps switching is a failing
    link, not a sequence of valid writes; the reference's 500 ms
    readback verification, etl_controller.py:2447-2448, exists exactly
    because a write may not stick).  The change flag compares each
    event to the key's PREVIOUS event across day boundaries (a flap at
    midnight is still a flap); only the grouping is daily.

    One shuffle on the key serves the lag window; the daily rollup is a
    partial-aggregable count.  The first event of a key counts as no
    change (lag NULL -> <> is NULL -> 0 on both engines).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = F.when(
        F.col("event_type") != F.lag("event_type").over(w), 1
    ).otherwise(0)
    return (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").alias("day"),
            chg.alias("chg"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.sum("chg").cast("bigint").alias("n_changes"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .filter(F.col("n_changes") >= 3)
    )


@declared(
    "nearest_event_join",
    oracle="""
    SELECT o_orderkey, user_id, nearest_event_id, gap_s
    FROM (
      SELECT o.o_orderkey, o.o_custkey AS user_id,
             e.event_id AS nearest_event_id,
             abs(CAST(floor(epoch(e.ts)) AS BIGINT)
                 - CAST(floor(epoch(CAST(o.o_orderdate AS TIMESTAMP)))
                        AS BIGINT)) AS gap_s,
             row_number() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY abs(CAST(floor(epoch(e.ts)) AS BIGINT)
                            - CAST(floor(epoch(CAST(o.o_orderdate AS TIMESTAMP)))
                                   AS BIGINT)),
                        e.ts, e.event_id
             ) AS rn
      FROM orders o
      JOIN events e ON e.user_id = o.o_custkey
    ) t
    WHERE rn = 1
    """,
)
def nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 1-D temporal join: for each order, the SAME
    user's event closest in time to the order date, in EITHER direction
    -- the bidirectional completion of the as-of pair
    (`asof_latest_order` looks only backward, `asof_next_order` only
    forward; sensor/trade alignment wants whichever is closer).

    Scalable shape: union-merge both streams once, per-user ordered
    window carries the last event BACKWARD (last ignorenulls) and the
    next event FORWARD (first ignorenulls over the mirrored frame) --
    one shuffle on user_id, two sorts, never the per-user cross range
    the oracle's theta-join builds.  The winner is pure integer CASE
    logic on the two candidate gaps, mirroring the oracle's ORDER BY
    (abs gap, ts, event_id): an exact-distance tie picks the EARLIER
    (backward) event, and within an equal event timestamp both carries
    keep the SMALLEST event_id (both windows order ev_id DESC, so the
    last row carried at a timestamp is its minimum id).  Events at
    exactly the probe timestamp are visible to both passes (event kind
    sorts before probe kind at equal ts) and resolve to the backward
    branch with gap 0.  Pinned by the crafted-frame pytest.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    ev = events.select(
        "user_id",
        F.expr("unix_timestamp(ts)").alias("t_s"),
        "event_id",
    )
    probes = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.expr("unix_timestamp(CAST(o_orderdate AS TIMESTAMP))").alias("t_s"),
        F.col("o_orderkey"),
    )
    ev_rows = ev.select(
        "user_id",
        "t_s",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.col("event_id").alias("ev_id"),
        F.col("t_s").alias("ev_t"),
    )
    probe_rows = probes.select(
        "user_id",
        "t_s",
        "o_orderkey",
        F.lit(None).cast("bigint").alias("ev_id"),
        F.lit(None).cast("bigint").alias("ev_t"),
    )
    merged = ev_rows.unionByName(probe_rows)
    # Backward pass: events sort BEFORE probes at equal ts (kind asc with
    # event kind 0), so an event at the probe's exact ts is visible to the
    # backward carry; among equal-ts events the SMALLEST event_id must win
    # the overall tie, so carry (t, -event_id) and order event_id DESC.
    kind = F.when(F.col("ev_id").isNotNull(), 0).otherwise(1)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_s").asc(), kind.asc(), F.col("ev_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_s").desc(), kind.asc(), F.col("ev_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        merged.withColumn("bwd_id", F.last("ev_id", ignorenulls=True).over(wb))
        .withColumn("bwd_t", F.last("ev_t", ignorenulls=True).over(wb))
        .withColumn("fwd_id", F.last("ev_id", ignorenulls=True).over(wf))
        .withColumn("fwd_t", F.last("ev_t", ignorenulls=True).over(wf))
    )
    probe_only = carried.filter(F.col("o_orderkey").isNotNull())
    bgap = F.col("t_s") - F.col("bwd_t")
    fgap = F.col("fwd_t") - F.col("t_s")
    pick_fwd = F.col("bwd_id").isNull() | (
        F.col("fwd_id").isNotNull() & (fgap < bgap)
    )
    return probe_only.filter(
        F.col("bwd_id").isNotNull() | F.col("fwd_id").isNotNull()
    ).select(
        "o_orderkey",
        "user_id",
        F.when(pick_fwd, F.col("fwd_id")).otherwise(F.col("bwd_id")).alias(
            "nearest_event_id"
        ),
        F.when(pick_fwd, fgap).otherwise(bgap).cast("bigint").alias("gap_s"),
    )
