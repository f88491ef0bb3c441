"""Preset snapshot / scoped restore: merge-with-priority over keyed state.

Reference semantics: ``RoutePreset`` (etl_controller.py:153-173) is a named
snapshot of the route map, optionally scoped to a subset of outputs
(``outputs=None`` means all, :157).  Applying a preset loops its entries
and overwrites the live state (``_load_preset``, :3241-3270); saving
filters by group membership first (:3218-3239).

Spark re-expression: FULL OUTER JOIN of state and preset on the key with
priority-coalesce -- preset rows win inside scope, state rows survive
elsewhere, preset-only keys are created.  One co-partitioned shuffle on the
key; at scale this is exactly a Delta/Iceberg MERGE keyed by output id.
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
    per-entry overwrite (:3258-3262) as a single merge: full outer join +
    priority coalesce.  Keys only in the preset are (re)created, exactly
    like routing an output the device had no state for.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    state = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.round("value", 2).alias("value"))
    )
    preset = (
        events.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 3 == 0)
        .select(
            "user_id",
            F.lit("restored").alias("p_type"),
            (F.lit(100.0) + F.col("user_id")).cast("double").alias("p_value"),
        )
    )
    s = state.alias("s")
    p = preset.alias("p")
    in_preset = F.col("p.user_id").isNotNull()
    return s.join(p, F.col("s.user_id") == F.col("p.user_id"), "full_outer").select(
        F.coalesce(F.col("s.user_id"), F.col("p.user_id")).alias("user_id"),
        F.when(in_preset, F.col("p.p_type"))
        .otherwise(F.col("s.event_type"))
        .alias("final_type"),
        F.round(
            F.when(in_preset, F.col("p.p_value")).otherwise(F.col("s.value")), 2
        ).alias("final_value"),
        in_preset.alias("from_preset"),
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
