"""Color math: hex codec, contrast selection, luminance adjustment.

Reference semantics: hex ``#rrggbb`` <-> channel codec
(etl_controller.py:1689-1698, 1977-1979), WCAG-ish contrast text choice
``0.299r+0.587g+0.114b > 0.5 -> black else white``
(etl_controller.py:1975-1982), and per-channel luminance shift
``int(c * (1 + shift/100))`` clamped to 0..255
(etl_controller.py:1686-1700).

Spark re-expression: pure projections (format_string / conv for the codec,
when/otherwise + least/greatest for the math) -- zero shuffles, whole-stage
codegen, scan-bandwidth bound at any scale.  Channels are derived
deterministically from part keys (the reference seeds pastel colors
randomly, etl_controller.py:127-143; randomness is removed for oracle
determinism, per SURVEY SS2.8 F5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

# Deterministic channel synthesis shared by both declared queries.
_CHANNELS_SQL = """
      SELECT p_partkey,
             CAST(p_partkey % 256 AS INT) AS r,
             CAST((p_partkey * 7 + p_size) % 256 AS INT) AS g,
             CAST((p_size * 13 + 29) % 256 AS INT) AS b,
             CAST((p_size % 41) - 20 AS INT) AS shift
      FROM part
"""


def _channels(df: DataFrame) -> DataFrame:
    return df.select(
        "p_partkey",
        (F.col("p_partkey") % 256).cast("int").alias("r"),
        ((F.col("p_partkey") * 7 + F.col("p_size")) % 256).cast("int").alias("g"),
        ((F.col("p_size") * 13 + 29) % 256).cast("int").alias("b"),
        ((F.col("p_size") % 41) - 20).cast("int").alias("shift"),
    )


@declared(
    "contrast_color",
    oracle=f"""
    WITH ch AS ({_CHANNELS_SQL})
    SELECT p_partkey,
           printf('#%02x%02x%02x', r, g, b) AS hex_color,
           CASE WHEN 0.299 * r + 0.587 * g + 0.114 * b > 127.5
                THEN 'black' ELSE 'white' END AS text_color
    FROM ch
    """,
)
def contrast_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/F8: hex encode + perceived-luminance contrast choice.

    The reference normalizes luminance to 0..1 and tests > 0.5
    (etl_controller.py:1975-1982); comparing the unnormalized sum to 127.5
    is the same predicate without a division.
    """
    part = load_table(spark, sf_dir, "part")
    ch = _channels(part)
    return ch.select(
        "p_partkey",
        F.format_string("#%02x%02x%02x", "r", "g", "b").alias("hex_color"),
        F.when(
            F.col("r") * 0.299 + F.col("g") * 0.587 + F.col("b") * 0.114 > 127.5,
            F.lit("black"),
        )
        .otherwise(F.lit("white"))
        .alias("text_color"),
    )


@declared(
    "luminance_shift",
    oracle=f"""
    WITH ch AS ({_CHANNELS_SQL})
    SELECT p_partkey,
           shift,
           CAST(least(255, greatest(0, floor(r * (1 + shift / 100.0)))) AS INT) AS r2,
           CAST(least(255, greatest(0, floor(g * (1 + shift / 100.0)))) AS INT) AS g2,
           CAST(least(255, greatest(0, floor(b * (1 + shift / 100.0)))) AS INT) AS b2
    FROM ch
    """,
)
def luminance_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/F6: per-channel brightness shift with 0..255 clamp.

    ``int(...)`` in the reference truncates; channels are non-negative so
    ``floor`` is exact parity (and, unlike a bare int cast, DuckDB's
    round-on-cast can't diverge from Spark's truncate-on-cast).
    """
    part = load_table(spark, sf_dir, "part")
    ch = _channels(part)

    def adj(c: str):
        scaled = F.floor(F.col(c) * (1 + F.col("shift") / 100.0))
        return F.least(F.lit(255), F.greatest(F.lit(0), scaled)).cast("int")

    return ch.select(
        "p_partkey",
        "shift",
        adj("r").alias("r2"),
        adj("g").alias("g2"),
        adj("b").alias("b2"),
    )
