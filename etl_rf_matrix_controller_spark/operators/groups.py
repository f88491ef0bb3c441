"""Group/island operators: consecutive-run grouping over keyed partitions.

Reference semantics: the display merges *consecutive* outputs that share
(name, color) into one group cell, breaking on value change or id gap
(``etl_controller.py:286-330``, core loop :306-328); the same run-merge
algorithm drives ``format_range_string`` (:102-125).

Spark re-expression (W2): gaps-and-islands -- a ``lag`` change flag, a
running sum to number islands, then a groupBy per island.  Partitioned by a
real key (event_type) so every partition computes its islands independently:
the window shuffle is one exchange on the partition key and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_rf_matrix_controller_spark.functions.ranges import islands
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table


@declared(
    "display_group_islands",
    oracle="""
    WITH keys AS (SELECT DISTINCT event_type, user_id FROM events),
    flags AS (
      SELECT event_type, user_id,
             CASE WHEN user_id - lag(user_id) OVER (
                    PARTITION BY event_type ORDER BY user_id) = 1
                  THEN 0 ELSE 1 END AS brk
      FROM keys
    ),
    isl AS (
      SELECT event_type, user_id,
             sum(brk) OVER (PARTITION BY event_type ORDER BY user_id
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM flags
    )
    SELECT event_type,
           CAST(min(user_id) AS BIGINT) AS island_start,
           CAST(max(user_id) AS BIGINT) AS island_end,
           count(*) AS island_size
    FROM isl
    GROUP BY event_type, island
    """,
)
def display_group_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: consecutive-key islands per group key.

    Each event_type plays a (name, color) display group; its distinct
    member keys are merged into consecutive runs exactly like the
    reference's group-cell merge (etl_controller.py:306-328).
    """
    keys = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    spans = islands(keys, "event_type", "user_id")
    return spans.select("event_type", "island_start", "island_end", "island_size")
