"""Property-based tests (hypothesis): the range codec and islands
invariants from SURVEY.md SS5.4.

``format_range_rle . parse_range_expand == identity`` mirrors the
reference's parse/format being mutual inverses (etl_controller.py:73-125);
islands partition invariants pin the gaps-and-islands core.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.functions.ranges import islands, parse_ranges

key_sets = st.sets(st.integers(min_value=1, max_value=120), min_size=1, max_size=25)

SETTINGS = settings(
    max_examples=12,  # each example runs Spark jobs; keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _format_rle(sorted_keys: list[int]) -> str:
    """Reference-semantics RLE (etl_controller.py:102-125), Python mirror."""
    parts, start, prev = [], None, None
    for n in sorted_keys:
        if start is None:
            start = prev = n
        elif n == prev + 1:
            prev = n
        else:
            parts.append(str(start) if start == prev else f"{start}-{prev}")
            start = prev = n
    parts.append(str(start) if start == prev else f"{start}-{prev}")
    return ", ".join(parts)


@given(keys=key_sets)
@SETTINGS
def test_parse_format_roundtrip(spark, keys):
    """parse(format(keys)) == keys for any key set."""
    s = _format_rle(sorted(keys))
    df = spark.createDataFrame([(s,)], "range_str string")
    out = {r.n for r in parse_ranges(df).collect()}
    assert out == keys, f"{s}: {out} != {keys}"


@given(keys=key_sets)
@SETTINGS
def test_islands_partition_invariants(spark, keys):
    """Islands cover the input exactly, are disjoint, and each island is a
    maximal consecutive run."""
    df = spark.createDataFrame([(k,) for k in keys], "n int")
    spans = islands(df, None, "n").collect()
    covered = set()
    for r in spans:
        run = set(range(r.island_start, r.island_end + 1))
        assert r.island_size == len(run)
        assert not (covered & run), "islands overlap"
        assert run <= keys, f"island {run} not subset of input"
        covered |= run
        # maximality: neighbors just outside the island are absent
        assert r.island_start - 1 not in keys
        assert r.island_end + 1 not in keys
    assert covered == keys


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999),
            st.integers(min_value=0, max_value=999),
        ),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_digit_sum_checksum_reference_semantics(spark, pairs):
    """The SQL digit-sum checksum equals the reference algorithm
    (etl_controller.py:479-501) computed in Python."""
    df = spark.createDataFrame(pairs, "o int, i int")
    out = df.select(
        "o",
        "i",
        F.expr(
            "(o % 1000) div 100 % 10 + (o % 1000) div 10 % 10 + (o % 1000) % 10"
            " + (i % 1000) div 100 % 10 + (i % 1000) div 10 % 10 + (i % 1000) % 10"
            " + 106"
        ).alias("raw"),
    ).collect()
    for r in out:
        expect = sum(int(c) for c in f"{r.o % 1000:03d}{r.i % 1000:03d}") + 106
        assert r.raw == expect
        wrapped = expect - 95 if expect > 126 else expect
        assert wrapped <= 126


@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=2,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_integer_percentile_interpolation_matches_numpy(cents):
    """percentile_cont_prices' integer-space interpolation is exactly
    numpy's 'linear' method on the same data (scaled-cent values)."""
    import numpy as np

    v = sorted(cents)
    n = len(v)
    for p in (1, 2, 3):
        pos = p * (n - 1)
        lo = pos // 4
        rem = pos % 4
        hi = lo + (1 if rem > 0 else 0)
        ours = (v[lo] * (4 - rem) + v[hi] * rem) / 4.0 / 100.0
        ref = float(np.percentile(np.array(v) / 100.0, p * 25, method="linear"))
        assert abs(ours - ref) < 1e-9 * max(1.0, ref)
