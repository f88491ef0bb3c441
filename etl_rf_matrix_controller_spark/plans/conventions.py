"""Determinism conventions shared by queries and their DuckDB oracles.

Float sums: double addition is non-associative, so Spark's parallel
partial aggregation and DuckDB's sequential sum can differ in final ulps
and break the value hash.  The testdata's float columns are clean <=4
decimal values, so we sum SCALED INTEGERS instead: exact, order
independent, and Long-typed (primitive hash aggregate -- measured ~1.6x
faster than DECIMAL(28,8) sums, ~30% over raw doubles).

Overflow envelope: |value| <= ~1e5 scales to <= 1e9; int64 safely sums
~9e9 such rows PER GROUP.  Beyond that (extreme 100 TB groups), swap
SCALE_FACTOR sums for DECIMAL(28,8) -- same call sites, wider type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000  # 4 implied decimals


def exact_sum(col: Column, out_round: int = 2) -> Column:
    """Order-independent exact sum of a clean-decimal double column,
    reported as a rounded double."""
    return F.round(F.sum(F.round(col * SCALE).cast("bigint")) / float(SCALE), out_round)


def exact_sum_sql(expr: str, out_round: int = 2) -> str:
    """DuckDB mirror of exact_sum (same scaled-integer arithmetic)."""
    return (
        f"round(sum(CAST(round(({expr}) * {SCALE}) AS BIGINT)) / {SCALE}.0, "
        f"{out_round})"
    )


def exact_avg(col: Column, out_round: int = 2) -> Column:
    """Order-independent mean: exact scaled sum / count."""
    return F.round(
        F.sum(F.round(col * SCALE).cast("bigint")) / float(SCALE) / F.count(F.lit(1)),
        out_round,
    )


def exact_avg_sql(expr: str, out_round: int = 2) -> str:
    return (
        f"round(sum(CAST(round(({expr}) * {SCALE}) AS BIGINT)) / {SCALE}.0 "
        f"/ count(*), {out_round})"
    )
