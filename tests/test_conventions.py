"""Property tests for the determinism conventions: the integer-space
rounding helpers must agree with exact Decimal arithmetic (half-up) for
any clean-decimal inputs."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.plans.conventions import (
    exact_avg,
    exact_sum,
    ratio4,
)

# clean <=4-decimal non-negative values in the testdata's magnitude range
clean_vals = st.lists(
    st.integers(min_value=0, max_value=10**9).map(lambda n: n / 10000.0),
    min_size=1,
    max_size=20,
)

SETTINGS = settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _dec(vals):
    return [Decimal(v).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP) for v in vals]


@given(vals=clean_vals)
@SETTINGS
def test_exact_sum_matches_decimal(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(exact_sum(F.col("v")).alias("s")).collect()[0].s
    want = float(
        sum(_dec(vals)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    )
    assert got == want, f"{vals}: {got} != {want}"


@given(vals=clean_vals)
@SETTINGS
def test_exact_avg_matches_decimal(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(exact_avg(F.col("v")).alias("a")).collect()[0].a
    # two-step: 4-dec rounded average, then 2-dec
    a4 = (sum(_dec(vals)) / len(vals)).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP
    )
    want = float(a4.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))
    assert got == want, f"{vals}: {got} != {want}"


@given(
    num=st.integers(min_value=0, max_value=10**6),
    den=st.integers(min_value=1, max_value=10**6),
)
@SETTINGS
def test_ratio4_matches_decimal(spark, num, den):
    df = spark.createDataFrame([(num, den)], "n long, d long")
    got = df.select(ratio4(F.col("n"), F.col("d")).alias("r")).collect()[0].r
    want = float(
        (Decimal(num) / Decimal(den)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert got == want, f"{num}/{den}: {got} != {want}"
