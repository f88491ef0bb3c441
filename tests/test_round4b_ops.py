"""Round-4 (cont.) operator edge semantics: SimHash band-blocking
losslessness against brute force, and the two-step Lloyd loop against a
plain-Python reference on a crafted 1-D-in-64-D embedding table.
"""

from __future__ import annotations

import math

from tests.conftest import SF_DIR
from tests.test_round4_ops import _write_events

from etl_rf_matrix_controller_spark.operators.dedup import (
    SIMHASH_MAX_HAMMING,
    simhash_docs,
    simhash_near_dup_pairs,
)
from etl_rf_matrix_controller_spark.operators.clustering import (
    N_CLUSTERS,
    kmeans_lloyd_two_step,
)


def test_simhash_band_blocking_is_lossless(spark):
    """4 disjoint 8-bit bands over a 32-bit signature: any pair within
    Hamming <= 3 shares a band (pigeonhole), so the banded join must
    equal brute-force all-pairs -- checked on the real sf0.001 corpus."""
    sigs = {r.doc_id: r.simhash for r in simhash_docs(spark, SF_DIR).collect()}
    ids = sorted(sigs)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= SIMHASH_MAX_HAMMING:
                brute.add((a, b, h))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(spark, SF_DIR).collect()
    }
    assert got == brute
    assert len(got) > 0  # planted exact dups guarantee non-vacuity


def _ref_lloyd_two_step(vecs: list[list[float]]):
    """Plain-Python mirror of kmeans_lloyd_two_step: 1e4-grid quantize,
    integer-L2 assign to vec_id<k seeds (tie -> lower cid), floor-mean
    centroid update, reassign, per-cluster (n, inertia, n_moved)."""
    q = [[int(round(x * 10000)) for x in v] for v in vecs]

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign(cents: dict[int, list[int]]):
        out = []
        for v in q:
            best = min(sorted(cents), key=lambda c: (d2(v, cents[c]), c))
            out.append((best, d2(v, cents[best])))
        return out

    seeds = {i: q[i] for i in range(N_CLUSTERS)}
    a1 = assign(seeds)
    cents2: dict[int, list[int]] = {}
    for c in {cid for cid, _ in a1}:
        members = [q[i] for i in range(len(q)) if a1[i][0] == c]
        cents2[c] = [
            math.floor(sum(col) / len(members)) for col in zip(*members)
        ]
    a2 = assign(cents2)
    out: dict[int, list[int]] = {}
    for i, (cid, d) in enumerate(a2):
        n, inertia, moved = out.get(cid, [0, 0, 0])
        out[cid] = [n + 1, inertia + d, moved + (cid != a1[i][0])]
    return {c: tuple(v) for c, v in out.items()}


def test_kmeans_two_step_reassignment_matches_reference(spark, tmp_path):
    """Crafted 1-D layout where the M-step moves a tie-broken point to
    the other cluster in iteration 2 (vec 11: tie -> c0 in round 1, then
    c0's centroid is pulled away by its mass at 0 while c1's moves
    toward it).  All component values are float32-exact multiples of
    2^-4 so quantization is exact on every engine."""
    comp0 = [0.0, 1.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0,  # seeds 0..7
             0.0, 0.0, 0.6875, 0.5]                   # members 8..11
    vecs = [[c] + [0.0] * 63 for c in comp0]
    rows = [(i, v, i % 3) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    ref = _ref_lloyd_two_step(vecs)
    got = {
        r.cluster_id: (r.n_members, r.inertia, r.n_moved)
        for r in kmeans_lloyd_two_step(spark, str(tmp_path)).collect()
    }
    assert got == ref
    # the engineered mover actually moved: cluster 1 gained exactly one.
    assert got[1][2] == 1 and got[1][0] == 3


def test_markov_stationary_fixed_point_mirror(spark, tmp_path):
    """Crafted 2-user timeline with self-loops and an asymmetric A/B
    exchange; the engine's ppm fixed-point iteration must equal a plain
    Python mirror including the per-term floors."""
    from datetime import datetime, timedelta

    from etl_rf_matrix_controller_spark.operators.behavior import (
        event_markov_stationary,
    )

    t0 = datetime(2024, 1, 5, 12, 0, 0)
    # user 1: A A A B A  (A->A x2, A->B, B->A); user 2: B B A B
    types = {1: ["a", "a", "a", "b", "a"], 2: ["b", "b", "a", "b"]}
    rows = []
    eid = 0
    for uid, seq in types.items():
        for i, et in enumerate(seq):
            rows.append((eid, t0 + timedelta(minutes=i), uid, et, 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)

    # python mirror: counts -> two floored ppm iterations
    trans: dict[tuple[str, str], int] = {}
    for seq in types.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    states = sorted({s for s, _ in trans})
    rsum = {s: sum(c for (a, _), c in trans.items() if a == s) for s in states}
    x = {s: 1000000 // len(states) for s in states}
    for _ in range(2):
        nx: dict[str, int] = {}
        for (s, d), c in trans.items():
            nx[d] = nx.get(d, 0) + (x.get(s, 0) * c) // rsum[s]
        x = nx
    expect = {
        s: (ppm, r + 1)
        for r, (s, ppm) in enumerate(
            sorted(x.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    got = {
        r.state: (r.stationary_ppm, r.rnk)
        for r in event_markov_stationary(spark, sf).collect()
    }
    assert got == expect


def test_simhash_wide_band_blocking_lossless_and_sparse(spark):
    """The production-width (60-bit, 4x15-bit-band) simhash path: banded
    join == brute force at Hamming <= 3 on the real sf0.001 corpus, and
    the widened bands actually buy sparsity (per-(band,bkey) bucket
    population collapses vs the 32-bit setting's n/256)."""
    from pyspark.sql import functions as F

    from etl_rf_matrix_controller_spark.operators.dedup import (
        dup_corpus,
        simhash_wide_pairs_df,
        simhash_wide_sig_df,
    )

    sig_df = simhash_wide_sig_df(dup_corpus(spark, SF_DIR)).localCheckpoint()
    sigs = {r.doc_id: r.simhash for r in sig_df.collect()}
    ids = sorted(sigs)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                brute.add((a, b, h))
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_wide_pairs_df(sig_df).collect()
    }
    assert got == brute
    assert len(got) > 0  # planted exact dups guarantee non-vacuity
    # sparsity: the worst 15-bit band bucket holds little beyond the
    # planted exact-dup groups; measure directly against the 8-bit
    # bucketing of the SAME signatures (the 32-bit query's band width).
    def worst_bucket(band_bits: int) -> int:
        mask = (1 << band_bits) - 1
        bands = sig_df.select(
            "doc_id",
            F.explode(F.array(*[F.lit(j) for j in range(4)])).alias("band"),
            F.col("simhash"),
        ).withColumn(
            "bkey", F.expr(f"shiftright(simhash, {band_bits} * band) & {mask}")
        )
        return (
            bands.groupBy("band", "bkey")
            .count()
            .agg(F.max("count"))
            .collect()[0][0]
        )

    worst15, worst8 = worst_bucket(15), worst_bucket(8)
    assert worst15 <= 10, worst15
    assert worst15 < worst8, (worst15, worst8)


def test_span_excision_merges_overlapping_regions(spark, tmp_path):
    """Two source docs (3 and 4) cover OVERLAPPING regions of copier doc
    9 ([1..50] and [31..80]); the excision union must be one 80-char
    region, not 100 double-counted chars.  Doc ids avoid the dup_corpus
    synthesis strides (doc_id % 10 not in {0, 1}); the 2-char-token
    alphabet makes every 40-gram unique so no accidental matches."""
    from etl_rf_matrix_controller_spark.operators.dedup import (
        span_excision_stats,
    )

    p = "".join(f"{letter}{d}" for letter in "abcd" for d in "0123456789")
    assert len(p) == 80
    rows = [
        (3, p[0:50], "en", "src1", 50),
        (4, p[30:80], "en", "src1", 50),
        (9, p, "en", "src2", 80),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: (r.n_regions, r.excisable_chars, r.doc_chars)
        for r in span_excision_stats(spark, str(tmp_path)).collect()
    }
    assert out == {9: (1, 80, 80)}, out
