"""Range-string codec: parse "1,3,5-10" <-> expand <-> re-format (RLE).

Reference semantics: ``parse_range_string`` (etl_controller.py:73-99)
expands "1,3,5-10" to [1,3,5..10], tolerating whitespace, empty segments,
and DESCENDING ranges ("10-6" -> [10..6]); ``format_range_string``
(etl_controller.py:102-125) run-length-compresses ints back to "1-3, 7".
They are mutual inverses on order-preserved lists (property-tested in
tests/test_properties.py).

Spark re-expression: split/explode + ``sequence`` (which natively steps
-1 for descending bounds) for parse; gaps-and-islands + ordered string
aggregation for format.  Parsing is embarrassingly parallel; formatting is
a presentation op whose output is ONE string, so its final single-partition
gather is inherent, not a scale bug -- the islands computation before it
stays partition-parallel per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Fixture strings pin the reference's edge cases: descending ranges,
# empty string, stray whitespace (etl_controller.py:73-99; FIXTURES.md).
RANGE_FIXTURE = ["1-16", "1,3,5-10", "10-6", "", " 7 ", "2-2, 4 , 9-11"]


def parse_ranges(df: DataFrame, col: str = "range_str") -> DataFrame:
    """Expand a range-string column to (range_str, n) rows.

    Malformed segments ("abc", "5-", "-3") are skipped, not errors --
    the reference wraps each segment in try/except and continues
    (etl_controller.py:96-98); the rlike gate is the declarative version
    (and keeps Spark 4's ANSI cast from throwing on garbage).
    """
    parts = df.select(
        col, F.explode(F.split(F.trim(F.col(col)), ",")).alias("part")
    ).select(col, F.trim("part").alias("part"))
    parts = parts.filter(F.col("part").rlike(r"^\d+(-\d+)?$"))
    start = F.regexp_extract("part", r"^(\d+)", 1).cast("int")
    end_s = F.regexp_extract("part", r"-(\d+)$", 1)
    end = F.when(end_s == "", start).otherwise(end_s.cast("int"))
    return parts.select(
        col,
        F.explode(F.sequence(start, end)).alias("n"),
    )


@declared(
    "parse_range_expand",
    oracle="""
    WITH t(range_str) AS (
      VALUES ('1-16'), ('1,3,5-10'), ('10-6'), (''), (' 7 '), ('2-2, 4 , 9-11')
    ),
    parts AS (
      SELECT range_str, trim(p) AS part
      FROM t, unnest(string_split(trim(range_str), ',')) AS u(p)
      WHERE regexp_matches(trim(p), '^[0-9]+(-[0-9]+)?$')
    ),
    bounds AS (
      SELECT range_str,
             CAST(regexp_extract(part, '^([0-9]+)', 1) AS INT) AS s,
             CASE WHEN regexp_extract(part, '-([0-9]+)$', 1) = ''
                  THEN CAST(regexp_extract(part, '^([0-9]+)', 1) AS INT)
                  ELSE CAST(regexp_extract(part, '-([0-9]+)$', 1) AS INT)
             END AS e
      FROM parts
    )
    SELECT range_str, CAST(n AS INT) AS n
    FROM bounds,
         unnest(generate_series(s, e, CASE WHEN e >= s THEN 1 ELSE -1 END)) AS g(n)
    """,
)
def parse_range_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/F1: range-string expansion over the edge-case fixture."""
    # NB: do NOT coalesce(1) here -- coalescing a parallelized local
    # collection costs ~5 s/action in local mode (measured); the plain
    # 32-slice form runs in ~0.3 s.
    df = spark.createDataFrame([(s,) for s in RANGE_FIXTURE], "range_str string")
    return parse_ranges(df)


def islands(df: DataFrame, part_col: str | None, order_col: str) -> DataFrame:
    """Gaps-and-islands: group consecutive ints into (island, min, max, size).

    The reference's consecutive-run merge (etl_controller.py:102-125,
    286-330): a run breaks on a gap > 1.  ``part_col=None`` means a single
    global sequence (one-partition window -- only for presentation-sized
    data); with a partition key the computation is fully parallel.
    """
    w = (
        Window.partitionBy(part_col).orderBy(order_col)
        if part_col
        else Window.orderBy(order_col)
    )
    brk = F.when(
        F.col(order_col) - F.lag(order_col).over(w) == 1, F.lit(0)
    ).otherwise(F.lit(1))
    df = df.withColumn("brk", brk)
    df = df.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    keys = [part_col, "island"] if part_col else ["island"]
    return df.groupBy(*keys).agg(
        F.min(order_col).alias("island_start"),
        F.max(order_col).alias("island_end"),
        F.count(F.lit(1)).alias("island_size"),
    )


@declared(
    "format_range_rle",
    oracle="""
    WITH keys AS (SELECT DISTINCT user_id FROM events),
    flags AS (
      SELECT user_id,
             CASE WHEN user_id - lag(user_id) OVER (ORDER BY user_id) = 1
                  THEN 0 ELSE 1 END AS brk
      FROM keys
    ),
    isl AS (
      SELECT user_id,
             sum(brk) OVER (ORDER BY user_id ROWS UNBOUNDED PRECEDING) AS island
      FROM flags
    ),
    spans AS (
      SELECT island, min(user_id) AS s, max(user_id) AS e
      FROM isl GROUP BY island
    )
    SELECT string_agg(
             CASE WHEN s = e THEN CAST(s AS VARCHAR)
                  ELSE CAST(s AS VARCHAR) || '-' || CAST(e AS VARCHAR) END,
             ', ' ORDER BY s
           ) AS range_str
    FROM spans
    """,
)
def format_range_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/W2/O4: RLE-format the distinct key set back to "1-3, 7" form.

    ``sorted(set(...))`` + run merge (etl_controller.py:102-125, 2193) over
    the distinct event keys.  distinct -> islands -> one-row ordered
    string_agg; the first two stages shuffle by key, only the final
    presentation gather is single-partition (output IS one string).
    """
    keys = load_table(spark, sf_dir, "events").select("user_id").distinct()
    spans = islands(keys, None, "user_id")
    part = F.when(
        F.col("island_start") == F.col("island_end"),
        F.col("island_start").cast("string"),
    ).otherwise(
        F.concat_ws("-", F.col("island_start").cast("string"),
                    F.col("island_end").cast("string"))
    )
    return spans.select(F.col("island_start").alias("s"), part.alias("p")).agg(
        F.concat_ws(
            ", ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "p"))), lambda x: x["p"]
            ),
        ).alias("range_str")
    )
