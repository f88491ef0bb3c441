"""Determinism conventions shared by queries and their DuckDB oracles.

Two cross-engine hazards, both defused here:

1. Float sums: double addition is non-associative, so Spark's parallel
   partial aggregation and DuckDB's sequential sum can differ in final
   ulps.  Fix: sum SCALED INTEGERS (the testdata floats are clean <=4
   decimal values) -- exact, order-independent, primitive-typed (measured
   ~1.6x faster than DECIMAL(28,8) sums).

2. Final rounding: ``round(double, 2)`` itself diverges across engines on
   half-boundary values -- Spark rounds the EXACT binary expansion
   (232192.104999... -> .10) while DuckDB rounds the shortest decimal
   repr ("232192.105" -> .11).  Fix: round in INTEGER space, half-up on
   the scaled value, using only +, %, and exact divisions so every
   intermediate is an integer representable in a double.

Numeric envelope: scaled sums (and 2x+n for the avg path) must stay below
2^53 for the mod-division to be exact -- |value| <= ~1e5 gives headroom to
~4.5e8 rows per group at 4 implied decimals.  Beyond that, swap for
DECIMAL(28,8) sums (same call sites, wider type).  Inputs are assumed
non-negative (true of every summed testdata column); half-up == half-away
there.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10000  # 4 implied decimals on the scaled integers


def _scaled(col: Column) -> Column:
    return F.sum(F.round(col * SCALE).cast("bigint"))


def _idiv(x: Column, den: Column | int) -> Column:
    """Exact integer division for non-negative integer-valued columns:
    (x - x % den) is divisible by den, so the float division is exact."""
    return (x - x % den) / den


def exact_sum(col: Column, out_round: int = 2) -> Column:
    """Order-independent exact sum of a clean-decimal double column,
    reported as a double rounded half-up to ``out_round`` decimals via
    integer arithmetic."""
    den = SCALE // (10**out_round)
    s = _scaled(col)
    if den <= 1:
        return s / float(SCALE)
    return _idiv(s + den // 2, den) / float(10**out_round)


def exact_sum_sql(expr: str, out_round: int = 2) -> str:
    """DuckDB mirror of exact_sum (same integer arithmetic)."""
    s = f"sum(CAST(round(({expr}) * {SCALE}) AS BIGINT))"
    den = SCALE // (10**out_round)
    if den <= 1:
        return f"({s} / {SCALE}.0)"
    x = f"({s} + {den // 2})"
    return f"((({x} - {x} % {den}) / {den}) / {10**out_round}.0)"


def int_round_scaled(scaled: Column, out_round: int = 2) -> Column:
    """Round an integer-valued scaled (4-dec) column -- e.g. a window sum
    of scaled ints -- to ``out_round`` decimals, half-up, integer-exactly."""
    den = SCALE // (10**out_round)
    if den <= 1:
        return scaled / float(SCALE)
    y = scaled + den // 2
    return _idiv(y, den) / float(10**out_round)


def int_round_scaled_sql(expr: str, out_round: int = 2) -> str:
    den = SCALE // (10**out_round)
    if den <= 1:
        return f"(({expr}) / {SCALE}.0)"
    y = f"(({expr}) + {den // 2})"
    return f"((({y} - {y} % {den}) / {den}) / {10**out_round}.0)"


def ratio4(num: Column, den: Column) -> Column:
    """Integer-exact ratio of two non-negative int columns rounded half-up
    to 4 decimals (cross-engine-safe alternative to round(a/b, 4))."""
    x = 2 * num * SCALE + den
    return _idiv(x, 2 * den) / float(SCALE)


def ratio4_sql(num: str, den: str) -> str:
    x = f"(2 * ({num}) * {SCALE} + ({den}))"
    return f"((({x} - {x} % (2 * ({den}))) / (2 * ({den}))) / {SCALE}.0)"


def exact_avg(col: Column, out_round: int = 2) -> Column:
    """Order-independent mean rounded half-up to ``out_round`` decimals.

    Two integer-rounding steps (scaled avg at 4 decimals, then down to
    ``out_round``); the oracle performs the identical two steps, so the
    engines agree bit-for-bit even in double-rounding corner cases.
    """
    x = 2 * _scaled(col) + F.count(F.lit(1))
    den2 = 2 * F.count(F.lit(1))
    a4 = _idiv(x, den2)  # scaled (4-dec) avg, half-up
    den = SCALE // (10**out_round)
    if den <= 1:
        return a4 / float(SCALE)
    return _idiv(a4 + den // 2, den) / float(10**out_round)


def exact_avg_sql(expr: str, out_round: int = 2) -> str:
    s = f"sum(CAST(round(({expr}) * {SCALE}) AS BIGINT))"
    x = f"(2 * {s} + count(*))"
    a4 = f"(({x} - {x} % (2 * count(*))) / (2 * count(*)))"
    den = SCALE // (10**out_round)
    if den <= 1:
        return f"({a4} / {SCALE}.0)"
    y = f"({a4} + {den // 2})"
    return f"((({y} - {y} % {den}) / {den}) / {10**out_round}.0)"
