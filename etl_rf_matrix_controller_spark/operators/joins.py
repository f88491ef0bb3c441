"""Join operators: denormalizing export, broadcast dims, semi/anti joins.

Reference semantics: every reference "join" is an O(1) dict probe --
``input_names.get(inp, default)`` during CSV export
(``etl_controller.py:3293-3298``), the ``output_to_group`` index
(``etl_controller.py:1984-1996``), group-membership checks
(``etl_controller.py:3222-3223``), and ungrouped-singleton synthesis
(``etl_controller.py:318-324``).  Re-expressed as real relational joins
(J1-J4 in SURVEY.md SS2.3): broadcast hash joins for dims, left-semi /
left-anti for membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "routes_csv_denorm",
    oracle="""
    SELECT o.o_orderkey AS output_id,
           o.o_custkey AS input_id,
           concat('Output ', CAST(o.o_orderkey AS VARCHAR)) AS output_name,
           coalesce(c.c_name, concat('Input ', CAST(o.o_custkey AS VARCHAR)))
             AS input_name,
           coalesce(n.n_name, 'UNKNOWN') AS nation_name,
           round(o.o_totalprice, 2) AS total_price
    FROM orders o
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    """,
)
def routes_csv_denorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: denormalizing routes export (scan -> join -> join -> project).

    Mirrors the CSV export (etl_controller.py:3283-3301): each route row is
    decorated with display names via dict probes with defaults; here,
    ``orders`` plays the route table (output=o_orderkey, input=o_custkey),
    ``customer`` the input-name map, ``nation`` a second-level dim.  Missing
    names fall back to synthesized defaults exactly like
    ``input_names.get(inp, f"Input {inp}")`` (etl_controller.py:3293-3298).

    Scale: nation is broadcast (25 rows, fixed); customer is dim-vs-fact so
    we hint broadcast too -- at a scale where customer outgrows the
    broadcast threshold, AQE falls back to shuffled hash join on the
    equi-key.  No global sort here (hash compare is order-insensitive);
    the CSV sink helper sorts within partitions instead.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")

    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            F.col("o_orderkey").alias("output_id"),
            F.col("o_custkey").alias("input_id"),
            F.concat(F.lit("Output "), F.col("o_orderkey").cast("string")).alias(
                "output_name"
            ),
            F.coalesce(
                F.col("c_name"),
                F.concat(F.lit("Input "), F.col("o_custkey").cast("string")),
            ).alias("input_name"),
            F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("nation_name"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


def export_routes_csv(df: DataFrame, path: str) -> None:
    """CSV sink for the denormalized routes (etl_controller.py:3283-3301).

    ``sortWithinPartitions`` gives the reference's sorted-by-output order
    per file without a global sort -- at 100 TB a total order on a CSV
    export is wasted work; per-file order plus filename ordering suffices.
    """
    df.sortWithinPartitions("output_id").write.mode("overwrite").option(
        "header", True
    ).csv(path)


@declared(
    "join_broadcast_dim",
    oracle="""
    SELECT n.n_name AS nation_name,
           count(*) AS order_cnt,
           round(sum(o.o_totalprice), 2) AS sum_price
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dim broadcast hash join + grouped aggregate (J1).

    Mirrors the output->group index probe (etl_controller.py:1984-1996):
    build side is the small dim, probe side streams the fact.  Broadcasting
    customer+nation means the fact table never shuffles for the join; the
    only shuffle is the final (tiny) groupBy on nation name, and Catalyst
    runs it partial->final so the map side pre-aggregates.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@declared(
    "group_membership_semi",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total_price
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    """,
)
def group_membership_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi membership join (P1/J3).

    Mirrors the preset scope filter ``out in group.outputs``
    (etl_controller.py:3222-3223): keep fact rows whose key appears in the
    member set.  Semi join never widens rows and the member side is
    deduplicated by the join itself; broadcast keeps the fact unshuffled.
    """
    orders = load_table(spark, sf_dir, "orders")
    members = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    return orders.join(
        F.broadcast(members), orders.o_custkey == members.c_custkey, "left_semi"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("total_price"),
    )


@declared(
    "ungroup_anti",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           concat('Group ', CAST(c.c_custkey AS VARCHAR)) AS synth_group
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def ungroup_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join + singleton synthesis (J4).

    Mirrors ungrouped-output synthesis (etl_controller.py:318-324): keys
    covered by no group each get a synthesized singleton group.  Here the
    "group cover" is urgent orders: customers with none get a singleton.
    Anti join on the equi-key; the probe side (orders keys) is reduced to
    distinct keys map-side by the semi/anti join machinery.
    """
    customer = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select(
        "c_custkey",
        "c_name",
        F.concat(F.lit("Group "), F.col("c_custkey").cast("string")).alias(
            "synth_group"
        ),
    )


@declared(
    "record_linkage_scores",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey + 500000 AS d_id,
             substring(c_name, 1, length(c_name) - 2) AS d_name,
             c_nationkey AS d_nation,
             round(c_acctbal + 0.5, 2) AS d_bal
      FROM customer WHERE c_custkey % 7 = 0
    ),
    cand AS (
      SELECT c.c_custkey AS clean_id, d.d_id AS dirty_id,
             CASE WHEN substring(c.c_name, 1, length(d.d_name)) = d.d_name
                  THEN 60 ELSE 0 END
             + CASE WHEN CAST(round(d.d_bal * 100) AS BIGINT)
                         - CAST(round(c.c_acctbal * 100) AS BIGINT) = 50
                    THEN 30 ELSE 0 END
             + 10 AS score
      FROM customer c
      JOIN dirty d
        ON d.d_nation = c.c_nationkey
       AND substring(d.d_name, 13, 3) = substring(c.c_name, 13, 3)
    )
    SELECT clean_id, dirty_id, CAST(score AS BIGINT) AS score,
           score >= 70 AS is_match
    FROM cand
    """,
)
def record_linkage_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage (Fellegi-Sunter shape): match a dirty external
    customer feed (names truncated, balances shifted -- synthesized
    deterministically) back to the clean dimension via BLOCKING + weighted
    field agreement.

    Blocking on (nation, name-digit prefix) is the scale move: candidate
    pairs are per-block products, never clean x dirty -- the same
    inverted-index discipline as the dedup family, applied across TWO
    tables.  Agreement weights are integers (name-prefix containment 60,
    balance-delta-exactly-50-cents 30, block agreement 10; threshold 70),
    so scores hash-match cross-engine; balance proximity compares
    round-scaled integer cents, never raw doubles.  At 100 TB both sides
    hash-partition on the block key and the scorer is a map-side
    projection.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(F.col("c_custkey") % 7 == 0).select(
        (F.col("c_custkey") + 500000).alias("d_id"),
        F.expr("substring(c_name, 1, length(c_name) - 2)").alias("d_name"),
        F.col("c_nationkey").alias("d_nation"),
        F.round(F.col("c_acctbal") + 0.5, 2).alias("d_bal"),
    )
    name_agree = (
        F.expr("substring(c_name, 1, length(d_name))") == F.col("d_name")
    ).cast("int") * 60
    bal_agree = (
        (
            F.round(F.col("d_bal") * 100).cast("bigint")
            - F.round(F.col("c_acctbal") * 100).cast("bigint")
        )
        == 50
    ).cast("int") * 30
    cand = cust.join(
        F.broadcast(dirty),
        (F.col("d_nation") == F.col("c_nationkey"))
        & (
            F.expr("substring(d_name, 13, 3)")
            == F.expr("substring(c_name, 13, 3)")
        ),
    ).select(
        F.col("c_custkey").alias("clean_id"),
        F.col("d_id").alias("dirty_id"),
        (name_agree + bal_agree + F.lit(10)).cast("bigint").alias("score"),
    )
    return cand.select(
        "clean_id", "dirty_id", "score", (F.col("score") >= 70).alias("is_match")
    )


BAND_S = 30  # half-width of the temporal band, seconds
_BUCKET_S = 2 * BAND_S  # bucket width >= band guarantees 3-bucket cover


@declared(
    "error_click_band_join",
    oracle=f"""
    WITH errs AS (
      SELECT event_id AS error_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS t_s
      FROM events WHERE event_type = 'error'
    ),
    clicks AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t_s
      FROM events WHERE event_type = 'click'
    )
    SELECT e.error_id, e.user_id,
           CAST(count(c.t_s) AS BIGINT) AS n_clicks_within_band
    FROM errs e
    LEFT JOIN clicks c
      ON c.user_id = e.user_id AND abs(c.t_s - e.t_s) <= {BAND_S}
    GROUP BY e.error_id, e.user_id
    """,
)
def error_click_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal band join: for every error event, how many clicks the
    same user produced within +/-30 s -- the error-impact correlation
    a reliability pipeline runs (did the failure interrupt activity?).
    The general shape is the point-in-band range join, the batch
    sibling of the watermarked stream-stream interval join
    (`interval_join_clicks`).

    Scalable form: both sides bucket into 60-s epoch buckets and the
    PROBE side alone fans out to its 3 adjacent buckets (a click's
    bucket is unique, so each true pair matches exactly once -- no
    dedup pass), turning the oracle's per-user theta join into an
    equi-join on (user, bucket) + a residual |dt| filter.  Cost: 3x the
    error rows, never errors x clicks per user; at 100 TB the join
    shuffles on a uniform composite key.  LEFT + count(matched) keeps
    zero-click errors with an exact 0.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("unix_timestamp(ts)").alias("t_s"),
    ).localCheckpoint(eager=True)  # error and click sides share one scan
    errs = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "t_s"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("t_s").alias("c_t"),
        F.expr(f"t_s DIV {_BUCKET_S}").alias("bkt"),
    )
    probes = errs.select(
        "error_id",
        "user_id",
        "t_s",
        F.explode(
            F.expr(f"array(t_s DIV {_BUCKET_S} - 1, t_s DIV {_BUCKET_S},"
                   f" t_s DIV {_BUCKET_S} + 1)")
        ).alias("bkt"),
    )
    matched = probes.join(
        clicks.hint("shuffle_hash"),
        ["user_id", "bkt"],
        "left",
    ).select(
        "error_id",
        "user_id",
        "t_s",
        F.when(
            F.abs(F.col("c_t") - F.col("t_s")) <= BAND_S, F.col("c_t")
        ).alias("hit"),
    )
    return matched.groupBy("error_id", "user_id").agg(
        F.count("hit").cast("bigint").alias("n_clicks_within_band")
    )
