"""Round-4 operator edge semantics: the iterated BPE merge loop against a
plain-Python reference, and substring-span dedup on crafted overlap cases.
"""

from __future__ import annotations

from etl_rf_matrix_controller_spark.operators.dedup import (
    substring_span_pairs_df,
)
from etl_rf_matrix_controller_spark.operators.text import bpe_merge_loop


def _ref_bpe(word_counts: dict[str, int], n: int):
    """Reference BPE (Sennrich et al. 2016): most-frequent adjacent pair,
    lexicographic tiebreak, greedy left-to-right non-overlapping merge."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n):
        pc: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + cnt
        if not pc:
            break
        (left, right), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, c))
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def test_bpe_merge_loop_matches_reference(spark):
    # Corpus chosen to force: a clear first merge, a tie broken
    # lexicographically, and a later merge whose left symbol is itself a
    # merged token (multi-char), plus an overlap run ("aaaa").
    word_counts = {
        "aaaa": 3,
        "abab": 2,
        "banana": 4,
        "bandana": 1,
        "na": 5,
    }
    ref_merges, ref_vocab = _ref_bpe(word_counts, 6)

    words = spark.createDataFrame(
        list(word_counts.items()), "token string, cnt bigint"
    )
    merges, vocab = bpe_merge_loop(words, n_merges=6)
    assert merges == ref_merges, (merges, ref_merges)
    got = {r.token: list(r.syms) for r in vocab.collect()}
    assert got == ref_vocab, (got, ref_vocab)


def test_bpe_merge_loop_overlap_greedy(spark):
    # "xxxx" under merge (x, x) must become [xx, xx] (non-overlapping
    # left-to-right), never [x, xx, x] or a chained [xxx, x].
    words = spark.createDataFrame([("xxxx", 1)], "token string, cnt bigint")
    merges, vocab = bpe_merge_loop(words, n_merges=1)
    assert merges == [("x", "x", 3)]  # 3 adjacent pairs counted pre-merge
    assert [list(r.syms) for r in vocab.collect()] == [["xx", "xx"]]


def test_bpe_merge_loop_stops_when_dry(spark):
    # Single-char words have no pairs: the loop must stop early, not spin.
    words = spark.createDataFrame([("a", 9), ("b", 4)], "token string, cnt bigint")
    merges, vocab = bpe_merge_loop(words, n_merges=5)
    assert merges == []
    assert {r.token for r in vocab.collect()} == {"a", "b"}


def _spans(df):
    return {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_chars)
        for r in df.collect()
    }


def test_substring_spans_basic_and_offsets(spark):
    # A 45-char span shared at DIFFERENT offsets in the two docs must
    # yield exactly one maximal span row with the right starts/length.
    # The characters flanking the shared span differ in the two docs so
    # the maximal span is exactly the 45 chars (no accidental extension).
    shared = "The quick brown fox jumps over the lazy dog!!"  # 45 chars
    assert len(shared) == 45
    d1 = "XXXX " + shared + "YYYYYYYYYYYYYYYYYYYYYYYYYYYYYYYYYYY"
    d2 = shared + "ZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZZ"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id bigint, text string"
    )
    assert _spans(substring_span_pairs_df(docs)) == {(1, 2, 6, 1, 45)}


def test_substring_spans_two_islands(spark):
    # Two shared spans separated by unshared gaps (on different
    # diagonals) must come out as two rows, not one merged span.
    s1 = "alpha bravo charlie delta echo foxtrot golf!!!"  # 46 chars
    s2 = "hotel india juliet kilo lima mike november oo!"  # 46 chars
    assert len(s1) == 46 and len(s2) == 46
    d1 = s1 + " 123456789012345678901234567890 " + s2
    d2 = s2 + " abcdefghijabcdefghijabcdefghij " + s1
    docs = spark.createDataFrame(
        [(10, d1), (20, d2)], "doc_id bigint, text string"
    )
    got = _spans(substring_span_pairs_df(docs))
    assert got == {
        (10, 20, 1, 79, 46),   # s1: starts d1@1, d2@79
        (10, 20, 79, 1, 46),   # s2: starts d1@79, d2@1
    }, got


def test_substring_spans_below_k_invisible(spark):
    # A shared run shorter than K (40) chars must produce no rows: the
    # docs share a 30-char prefix, then diverge immediately.
    shared = "thirty shared characters aa bb"
    assert len(shared) == 30
    d1 = shared + "A tail one is distinct here with filler"
    d2 = shared + "B completely different second tail text"
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id bigint, text string"
    )
    assert _spans(substring_span_pairs_df(docs)) == set()


def test_survey_211_ids_resolve_in_registry():
    """Contract-text auditability: every backticked snake_case id in
    SURVEY SS2.11/2.11b must be a declared-query registry key, unless the
    surrounding text explicitly marks it pytest-covered (the round-3
    check-type drift the round-3 verdict flagged)."""
    import re

    from etl_rf_matrix_controller_spark.plans import registry

    registry.load_all()
    text = open("SURVEY.md").read()
    start = text.index("### 2.11 Extension operators")
    end = text.index("### 2.12")
    section = text[start:end]
    ids = re.findall(r"`([a-z][a-z0-9]*(?:_[a-z0-9]+)+)`", section)
    unresolved = []
    duckdb_builtins = {"list_reduce"}  # DuckDB-side names cited in prose
    import pyspark.sql.functions as SF

    for qid in set(ids):
        if qid in registry.QUERIES:
            continue
        if hasattr(SF, qid) or qid in duckdb_builtins:
            continue  # engine function name cited in prose, not a query id
        # pytest-marked ids carry a "pytest" note within the sentence.
        idx = section.index(f"`{qid}`")
        window = section[idx: idx + 400]
        if "pytest" in window:
            continue
        unresolved.append(qid)
    assert not unresolved, (
        f"SURVEY SS2.11/2.11b ids neither declared nor pytest-marked: "
        f"{sorted(unresolved)}"
    )
