"""Preset snapshot / scoped restore: merge-with-priority over keyed state.

Reference semantics: ``RoutePreset`` (etl_controller.py:153-173) is a named
snapshot of the route map, optionally scoped to a subset of outputs
(``outputs=None`` means all, :157).  Applying a preset loops its entries
and overwrites the live state (``_load_preset``, :3241-3270); saving
filters by group membership first (:3218-3239).

Spark re-expression: priority-tagged UNION folded into the latest-state
window -- preset rows win inside scope, state rows survive elsewhere,
preset-only keys are created.  One shuffle on the key and no join at all
(a full-outer merge can't broadcast-hash-join, so the join form costs a
sort-merge); at scale this is exactly a Delta/Iceberg MERGE keyed by
output id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

_STATE_SQL = """
      SELECT user_id, event_type, round(value, 2) AS value
      FROM (
        SELECT user_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) s WHERE rn = 1
"""

# Deterministic synthesized preset: every 3rd key, scoped like a
# RoutePreset with an explicit outputs list.
_PRESET_SQL = """
      SELECT user_id,
             'restored' AS p_type,
             CAST(100.0 + user_id AS DOUBLE) AS p_value
      FROM (SELECT DISTINCT user_id FROM events) u
      WHERE user_id % 3 = 0
"""


@declared(
    "preset_apply_merge",
    oracle=f"""
    WITH state AS ({_STATE_SQL}),
    preset AS ({_PRESET_SQL})
    SELECT coalesce(s.user_id, p.user_id) AS user_id,
           CASE WHEN p.user_id IS NOT NULL THEN p.p_type
                ELSE s.event_type END AS final_type,
           round(CASE WHEN p.user_id IS NOT NULL THEN p.p_value
                      ELSE s.value END, 2) AS final_value,
           p.user_id IS NOT NULL AS from_preset
    FROM state s
    FULL OUTER JOIN preset p ON s.user_id = p.user_id
    """,
)
def preset_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SS3.3: apply a scoped preset over live state, preset wins.

    The preset snapshot (etl_controller.py:3199-3216) is synthesized
    deterministically from the key space; applying mirrors _load_preset's
    per-entry overwrite (:3258-3262).  The oracle states it as FULL OUTER
    JOIN + priority coalesce, but Spark cannot broadcast a full-outer
    (BroadcastHashJoin supports no full side), so that form forces the
    suite's only sort-merge join.  Instead: tag preset rows with priority
    1, union them into the event stream BEFORE the latest-state window,
    and let the same row_number pick preset-over-latest-event per key.
    One shuffle on user_id total, zero joins; preset-only keys fall out
    of the window for free (their only row is the preset row).  At 100 TB
    this folds the merge into the shuffle the state scan already pays.
    """
    events = load_table(spark, sf_dir, "events")
    cand = events.select(
        "user_id",
        F.col("event_type").alias("typ"),
        F.col("value").cast("double").alias("val"),
        "ts",
        "event_id",
        F.lit(0).alias("prio"),
    )
    preset = (
        events.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 3 == 0)
        .select(
            "user_id",
            F.lit("restored").alias("typ"),
            (F.lit(100.0) + F.col("user_id")).cast("double").alias("val"),
            F.lit(None).cast(dict(events.dtypes)["ts"]).alias("ts"),
            F.lit(None).cast(dict(events.dtypes)["event_id"]).alias("event_id"),
            F.lit(1).alias("prio"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("prio").desc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        cand.unionByName(preset)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("typ").alias("final_type"),
            F.round("val", 2).alias("final_value"),
            (F.col("prio") == 1).alias("from_preset"),
        )
    )


@declared(
    "preset_save_scoped",
    oracle=f"""
    WITH state AS ({_STATE_SQL})
    SELECT user_id, event_type AS saved_type, value AS saved_value
    FROM state
    WHERE user_id % 2 = 0
    """,
)
def preset_save_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SS3.3 save side: snapshot current state restricted to a group scope
    (_save_preset_for_group, etl_controller.py:3218-3239): filter by
    membership, then persist.  Pure filter over the latest-state view."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("user_id") % 2 == 0))
        .select(
            "user_id",
            F.col("event_type").alias("saved_type"),
            F.round("value", 2).alias("saved_value"),
        )
    )
