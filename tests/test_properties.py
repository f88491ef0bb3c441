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


# -- round-4 operators ----------------------------------------------------

doc_texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=60), min_size=2, max_size=4
)


def _ref_spans(docs: list[tuple[int, str]], k: int) -> set[tuple]:
    """Brute-force maximal shared-span reference (definitionally: matching
    k-gram positions grouped by (pair, diagonal), consecutive runs
    merged)."""
    pg = []
    for did, text in docs:
        t = text.strip()
        for i in range(1, max(len(t) - k + 1, 0) + 1):
            pg.append((did, i, t[i - 1: i - 1 + k]))
    out = set()
    matches: dict[tuple[int, int, int], set[int]] = {}
    for da, pa, ga in pg:
        for db, pb, gb in pg:
            if da < db and ga == gb:
                matches.setdefault((da, db, pa - pb), set()).add(pa)
    for (da, db, diag), poss in matches.items():
        for p in sorted(poss):
            if p - 1 not in poss:  # island start
                end = p
                while end + 1 in poss:
                    end += 1
                out.add((da, db, p, p - diag, end - p + k))
    return out


@given(texts=doc_texts)
@SETTINGS
def test_substring_spans_match_bruteforce(spark, texts):
    """substring_span_pairs_df == the brute-force positional-gram
    reference for any small corpus (tiny 'ab ' alphabet forces heavy
    overlap, repeated grams, and multi-diagonal matches)."""
    from etl_rf_matrix_controller_spark.operators.dedup import (
        substring_span_pairs_df,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id bigint, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_chars)
        for r in substring_span_pairs_df(df, k=8).collect()
    }
    assert got == _ref_spans(docs, 8), (texts, got)


word_tables = st.dictionaries(
    st.text(alphabet="abc", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=6,
)


@given(words=word_tables)
@SETTINGS
def test_bpe_merge_loop_matches_reference_random(spark, words):
    """bpe_merge_loop == the plain-Python Sennrich reference for any
    small word-frequency table (3 merges; ties and overlap runs arise
    naturally from the tiny alphabet)."""
    from etl_rf_matrix_controller_spark.operators.text import bpe_merge_loop
    from tests.test_round4_ops import _ref_bpe

    ref_merges, ref_vocab = _ref_bpe(dict(words), 3)
    df = spark.createDataFrame(list(words.items()), "token string, cnt bigint")
    merges, vocab = bpe_merge_loop(df, n_merges=3)
    assert merges == ref_merges, (words, merges, ref_merges)
    got = {r.token: list(r.syms) for r in vocab.collect()}
    assert got == ref_vocab, (words, got, ref_vocab)
