"""CDC / SCD2: slowly-changing-dimension history without Delta.

Reference basis: config save is last-writer-wins whole-file
(etl_controller.py:3303-3309) -- no history.  The engine adds the
standard SCD2 emulation (MERGE INTO stand-in): close changed rows, insert
new versions, via join + union + flags.  With Delta/Iceberg on the
classpath this collapses to a real `MERGE INTO` (connectors stubbed
behind import-try per the environment contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Deterministic change feed: every 5th customer gets a new balance.
_CHANGES_SQL = """
      SELECT c_custkey, round(c_acctbal + 100.0, 2) AS new_bal
      FROM customer WHERE c_custkey % 5 = 0
"""


@declared(
    "scd2_customer_history",
    oracle=f"""
    WITH changes AS ({_CHANGES_SQL})
    SELECT c.c_custkey,
           round(c.c_acctbal, 2) AS acctbal,
           1 AS version,
           ch.c_custkey IS NULL AS is_current
    FROM customer c
    LEFT JOIN changes ch ON ch.c_custkey = c.c_custkey
    UNION ALL
    SELECT c_custkey, new_bal AS acctbal, 2 AS version, true AS is_current
    FROM changes
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 apply: version-1 rows flagged non-current where a change
    arrived; version-2 rows appended for the change feed.

    One broadcast-able join (change feeds are small vs the dim) + an
    exchange-free union: the no-Delta MERGE.  History grows append-only,
    the natural layout for a partitioned-by-version parquet dim.
    """
    customer = load_table(spark, sf_dir, "customer")
    # The change feed is consumed twice (close-out join + version-2
    # append); checkpoint it so the dim is scanned once for v1 and once
    # for the feed, not three times.  Change feeds stay small vs the dim,
    # so the broadcast below remains the honest 100 TB plan.
    changes = (
        customer.filter(F.col("c_custkey") % 5 == 0)
        .select(
            F.col("c_custkey").alias("ch_key"),
            F.round(F.col("c_acctbal") + 100.0, 2).alias("new_bal"),
        )
        .localCheckpoint(eager=False)
    )
    v1 = customer.join(
        F.broadcast(changes), customer.c_custkey == changes.ch_key, "left"
    ).select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit(1).alias("version"),
        F.col("ch_key").isNull().alias("is_current"),
    )
    v2 = changes.select(
        F.col("ch_key").alias("c_custkey"),
        F.col("new_bal").alias("acctbal"),
        F.lit(2).alias("version"),
        F.lit(True).alias("is_current"),
    )
    return v1.unionByName(v2)


# Deterministic SCD2 validity windows: customers with key % 5 == 0 change
# balance at the fixed cutover instant; everyone else has one open version.
_CUTOVER = "1995-07-01 00:00:00"

_WINDOWS_SQL = f"""
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal, 1 AS version,
             TIMESTAMP '1990-01-01 00:00:00' AS valid_from,
             CASE WHEN c_custkey % 5 = 0
                  THEN TIMESTAMP '{_CUTOVER}'
                  ELSE TIMESTAMP '2099-01-01 00:00:00' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, round(c_acctbal + 100.0, 2) AS acctbal, 2 AS version,
             TIMESTAMP '{_CUTOVER}' AS valid_from,
             TIMESTAMP '2099-01-01 00:00:00' AS valid_to
      FROM customer WHERE c_custkey % 5 = 0
"""


@declared(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH win AS ({_WINDOWS_SQL})
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           w.version AS dim_version,
           w.acctbal AS acctbal_asof_order
    FROM orders o
    JOIN win w
      ON w.c_custkey = o.o_custkey
     AND o.o_orderdate >= w.valid_from
     AND o.o_orderdate < w.valid_to
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: each order is enriched with the
    dimension version that was valid AT its order date -- the warehouse
    query SCD2 history exists to serve, and the one a latest-only join
    silently gets wrong for historical facts.

    The join is equi-keyed on the customer key with the validity-window
    range as a residual predicate, so it stays a hash join (range checked
    per matched key-group, never a range-only join).  At 100 TB the dim's
    window table is version-count x keys (small, often broadcastable);
    when it isn't, co-partitioning both sides on the key keeps the range
    residual local to each partition.
    """
    customer = load_table(spark, sf_dir, "customer")
    cutover = F.lit(_CUTOVER).cast("timestamp")
    far = F.lit("2099-01-01 00:00:00").cast("timestamp")
    epoch = F.lit("1990-01-01 00:00:00").cast("timestamp")
    v1 = customer.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit(1).alias("version"),
        epoch.alias("valid_from"),
        F.when(F.col("c_custkey") % 5 == 0, cutover).otherwise(far).alias(
            "valid_to"
        ),
    )
    v2 = customer.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100.0, 2).alias("acctbal"),
        F.lit(2).alias("version"),
        cutover.alias("valid_from"),
        far.alias("valid_to"),
    )
    win = v1.unionByName(v2)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return orders.join(
        F.broadcast(win),
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("o_orderdate") < F.col("valid_to")),
    ).select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("version").alias("dim_version"),
        F.col("acctbal").alias("acctbal_asof_order"),
    )


@declared(
    "survivorship_merge",
    oracle="""
    WITH versions AS (
      SELECT c_custkey, 1 AS src_priority, c_name,
             CAST(NULL AS VARCHAR) AS mktsegment, round(c_acctbal, 2) AS bal
      FROM customer
      UNION ALL
      SELECT c_custkey, 2 AS src_priority, CAST(NULL AS VARCHAR) AS c_name,
             c_mktsegment, CASE WHEN c_custkey % 3 = 0
                                THEN round(c_acctbal + 50.0, 2)
                                ELSE NULL END AS bal
      FROM customer WHERE c_custkey % 2 = 0
    ),
    ranked AS (
      SELECT c_custkey,
             max(src_priority) AS best_src,
             arg_max(c_name, CASE WHEN c_name IS NOT NULL
                                  THEN src_priority ELSE -1 END) AS name,
             arg_max(mktsegment, CASE WHEN mktsegment IS NOT NULL
                                      THEN src_priority ELSE -1 END) AS segment,
             arg_max(bal, CASE WHEN bal IS NOT NULL
                               THEN src_priority ELSE -1 END) AS bal
      FROM versions GROUP BY c_custkey
    )
    SELECT c_custkey, name, segment, bal,
           CAST(best_src AS BIGINT) AS n_sources_seen
    FROM ranked
    """,
)
def survivorship_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MDM golden-record survivorship: duplicate customer records from two
    sources (source 2 synthesized with a sparser column set and partial
    balance updates) merge COLUMN-WISE -- each field independently takes
    its highest-priority NON-NULL value, unlike row-level dedup where one
    whole record wins and its nulls erase better data from losers.

    One groupBy on the key with per-column max_by over a null-demoting
    priority (null values rank -1, so they never survive a non-null from
    any source) -- column-level survivorship costs the same single
    shuffle as row-level keep-first.  The standard MERGE policy table
    (per-column priority orders) drops in by swapping the priority
    expression per field.
    """
    cust = load_table(spark, sf_dir, "customer")
    v1 = cust.select(
        "c_custkey",
        F.lit(1).alias("src_priority"),
        "c_name",
        F.lit(None).cast("string").alias("mktsegment"),
        F.round("c_acctbal", 2).alias("bal"),
    )
    v2 = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey",
        F.lit(2).alias("src_priority"),
        F.lit(None).cast("string").alias("c_name"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.round(F.col("c_acctbal") + 50.0, 2)
        ).alias("bal"),
    )
    versions = v1.unionByName(v2)
    prio = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), F.col("src_priority")
    ).otherwise(F.lit(-1))
    return versions.groupBy("c_custkey").agg(
        F.max_by("c_name", prio("c_name")).alias("name"),
        F.max_by("mktsegment", prio("mktsegment")).alias("segment"),
        F.max_by("bal", prio("bal")).alias("bal"),
        F.max("src_priority").cast("bigint").alias("n_sources_seen"),
    ).select("c_custkey", "name", "segment", "bal", "n_sources_seen")


# ---------------------------------------------------------------------------
# CDC log apply with delete tombstones (round 7b)
# ---------------------------------------------------------------------------

@declared(
    "cdc_apply_tombstones",
    oracle="""
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             event_type, value
      FROM events
    ),
    ordered AS (
      SELECT user_id, op, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
               AS n_changes,
             CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id) AS BIGINT) AS n_tombstones
      FROM log
    )
    SELECT user_id, event_type AS last_type, value AS last_value,
           n_changes, n_tombstones
    FROM ordered
    WHERE rn = 1 AND op <> 'D'
    """,
)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change-data-capture log WITH delete tombstones to produce
    the final keyed state: the events stream is read as a change feed
    (op = D for 'error' events -- the tombstone marker -- else U), and a
    key survives only if its LAST change by (ts, event_id) is an upsert;
    a key whose latest op is a tombstone is absent from the final state
    even though older upserts exist (and a key deleted mid-stream then
    re-upserted RESURRECTS -- the semantics `route_latest_state` /
    `survivorship_merge` lack, completing the CDC family alongside SCD2
    history and point-in-time reads).  Per-key change and tombstone
    counts ride along for the audit trail.

    One window over the log keyed by user (single shuffle; rank,
    count and tombstone-count share the partition), filter rn = 1 AND
    op <> 'D' -- the standard compact-the-changelog plan, identical in
    shape to a log-compaction job at 100 TB (shuffle by key once, no
    joins).  Raw column passthrough for last_value (no computed floats).
    """
    log = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        "event_type",
        "value",
    )
    from pyspark.sql.window import Window

    wk = Window.partitionBy("user_id")
    wo = wk.orderBy(F.desc("ts"), F.desc("event_id"))
    ordered = log.select(
        "user_id",
        "op",
        "event_type",
        "value",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wk).cast("bigint").alias("n_changes"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0))
        .over(wk)
        .cast("bigint")
        .alias("n_tombstones"),
    )
    return ordered.filter((F.col("rn") == 1) & (F.col("op") != "D")).select(
        "user_id",
        F.col("event_type").alias("last_type"),
        F.col("value").alias("last_value"),
        "n_changes",
        "n_tombstones",
    )
