"""Streaming ingest unified with the persistent bucketed index
(streaming/ingest.py, round 9): the persistent index IS the streaming
admission state.  Pins the round-9 verdict contract:

  1. stream-ingested index state ≡ batch-appended state over >= 3 real
     micro-batches (union of stream-written delta legs == the one-shot
     retention twin minus the base);
  2. the next morning's batch probe serves base ∪ stream-written deltas
     (a planted near-dup of a STREAMED doc matches via a delta leg,
     with the index side a bucketed scan);
  3. the compact-at-K policy runs inside the ingest loop: a mid-stream
     fold flips the manifest and later batches probe the new
     generation, final served state unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.test_plans import plan_of

CAP = 3


def _nights(spark):
    """Three ingest nights with doc_ids increasing across nights (the
    arrival-order == doc_id-order contract): near-dups (+4M), reversed
    low-quality decoys (+5M), verbatim exact copies (+6M)."""
    from etl_rf_matrix_controller_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n1 = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 4000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zznew")).alias("text"),
    )
    n2 = docs.filter(F.col("doc_id") % 10 == 4).select(
        (F.col("doc_id") + 5000000).alias("doc_id"),
        F.reverse(F.trim("text")).alias("text"),
    )
    n3 = docs.filter(F.col("doc_id") % 10 == 6).select(
        (F.col("doc_id") + 6000000).alias("doc_id"),
        F.col("text").alias("text"),
    )
    return docs, [n1, n2, n3]


def _stage_stream_files(spark, nights, src: str):
    os.makedirs(src)
    now = 1700000000
    for i, night in enumerate(nights):
        staging = f"{src}_b{i}"
        night.repartition(1).write.parquet(staging)
        part = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        dst = os.path.join(src, f"night_{i}.parquet")
        os.rename(os.path.join(staging, part), dst)
        os.utime(dst, (now + i * 100, now + i * 100))


def _run_ingest(spark, tmp_path, kind: str, max_deltas=None):
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        stream_ingest_to_index,
    )

    docs, nights = _nights(spark)
    src = str(tmp_path / f"stream_{kind}")
    _stage_stream_files(spark, nights, src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    records_path = str(tmp_path / f"records_{kind}")
    stream_ingest_to_index(
        stream,
        spark,
        SF_DIR,
        kind=kind,
        version="v1",
        cap=CAP,
        records_path=records_path,
        checkpoint_path=str(tmp_path / f"ckpt_{kind}"),
        max_deltas=max_deltas,
    )
    return docs, nights, records_path


def test_stream_ingest_state_equals_batch_append(spark, monkeypatch, tmp_path):
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        index_delta_frames,
    )
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        ADMBAND_N_BUCKETS,
    )
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        admission_index_base,
        one_shot_retained,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    kind = "r9ing"
    docs, nights, records_path = _run_ingest(spark, tmp_path, kind)

    # (1) union of the three stream-written delta legs == the one-shot
    # batch-append twin (retention over corpus ∪ nights, minus base)
    legs = index_delta_frames(
        spark, SF_DIR, kind, version="v1", n_buckets=ADMBAND_N_BUCKETS
    )
    assert len(legs) == 3
    base = admission_index_base(
        spark, SF_DIR, kind=kind, version="v1", cap=CAP
    )
    streamed = None
    for leg in legs:
        streamed = leg if streamed is None else streamed.unionByName(leg)
    all_docs = docs
    for n in nights:
        all_docs = all_docs.unionByName(n)
    twin = one_shot_retained(all_docs, CAP)
    base_rows = {tuple(r) for r in base.collect()}
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in twin.collect()} - base_rows
    assert got and got == want, (len(got), len(want))
    # the streamed legs never duplicate base rows, and base ∪ deltas is
    # exactly the one-shot state
    assert not (got & base_rows)
    assert (got | base_rows) == {tuple(r) for r in twin.collect()}

    # (2) collision/quality records carry every planted class:
    # night-3 verbatim copies -> exact records against the original,
    # night-1 near-dups -> m records, night-2 reversed decoys -> q
    rec = spark.read.parquet(records_path)
    kinds = {
        r["kind"]: r["n"]
        for r in rec.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert kinds.get("q", 0) > 0 and kinds.get("m", 0) > 0
    x_pairs = {
        (r.doc_a, r.doc_b)
        for r in rec.filter(F.col("kind") == "x").collect()
    }
    # every night-3 exact copy collides with exactly its original
    sample = docs.filter(F.col("doc_id") % 10 == 6).filter(
        F.length(F.trim("text")) > 0
    )
    for r in sample.limit(5).collect():
        assert (r.doc_id, r.doc_id + 6000000) in x_pairs

    # (3) next morning's batch probe serves base ∪ stream deltas: a
    # near-dup of a STREAMED night-1 doc matches via a delta leg
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        admission_rows,
    )

    morning = docs.filter(F.col("doc_id") % 10 == 3).select(
        (F.col("doc_id") + 9000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zznew")).alias("text"),
    )
    mb = admission_rows(morning).localCheckpoint(eager=True)

    def probe(leg):
        return (
            mb.alias("n")
            .hint("shuffle_hash")
            .join(
                leg.alias("i"),
                (F.col("n.band") == F.col("i.band"))
                & (F.col("n.bkey") == F.col("i.bkey")),
            )
            .select(
                F.col("n.doc_id").alias("new_doc_id"),
                F.col("i.doc_id").alias("matched_doc_id"),
            )
        )

    matched = probe(base)
    for leg in legs:
        matched = matched.unionByName(probe(leg))
    hits = matched.distinct()
    # the ' zznew' morning dup of doc d must match night-1's streamed
    # d+4M exemplar (delta leg) as well as the original d (base)
    pairs = {(r.new_doc_id, r.matched_doc_id) for r in hits.collect()}
    assert any(b >= 4000000 for (_a, b) in pairs), "delta leg not served"
    assert any(b < 4000000 for (_a, b) in pairs), "base leg not served"
    # the index side of each leg probe is a bucketed scan
    plan = plan_of(probe(legs[0]))
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_stream_rerun_is_idempotent(spark, monkeypatch, tmp_path):
    """Re-draining the same nights (fresh checkpoint, same batch ids)
    re-REGISTERS the existing delta legs instead of re-writing or
    duplicating: on-disk state is unchanged and still equals the
    one-shot twin.  Pins the 'atomic idempotent publish' contract the
    declared query's docstring claims."""
    import glob

    from etl_rf_matrix_controller_spark.plans.gram_index import (
        index_delta_frames,
    )
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        ADMBAND_N_BUCKETS,
        admission_index_base,
        one_shot_retained,
        stream_ingest_to_index,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    kind = "r9idem"
    docs, nights, _ = _run_ingest(spark, tmp_path, kind)
    files_before = sorted(glob.glob(str(tmp_path / "*") + "/**", recursive=True))

    # second drain: same staged files, fresh checkpoint + records sink
    src = str(tmp_path / f"stream_{kind}")
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_ingest_to_index(
        stream,
        spark,
        SF_DIR,
        kind=kind,
        version="v1",
        cap=CAP,
        records_path=str(tmp_path / "records_rerun"),
        checkpoint_path=str(tmp_path / "ckpt_rerun"),
    )
    files_after = sorted(glob.glob(str(tmp_path / "*") + "/**", recursive=True))
    index_before = [f for f in files_before if f"_{kind}_" in f]
    index_after = [f for f in files_after if f"_{kind}_" in f]
    assert index_before == index_after, "re-run touched the index"

    legs = index_delta_frames(
        spark, SF_DIR, kind, version="v1", n_buckets=ADMBAND_N_BUCKETS
    )
    assert len(legs) == 3
    base = admission_index_base(
        spark, SF_DIR, kind=kind, version="v1", cap=CAP
    )
    served = base
    for leg in legs:
        served = served.unionByName(leg)
    all_docs = docs
    for n in nights:
        all_docs = all_docs.unionByName(n)
    assert {tuple(r) for r in served.collect()} == {
        tuple(r) for r in one_shot_retained(all_docs, CAP).collect()
    }


def test_stream_postings_and_ivf_legs_equal_batch_append(
    spark, monkeypatch, tmp_path
):
    """Round-10 verdict task #3: a streamed corpus feeds the SEARCH and
    ANN indexes, not just admission.  Three micro-batch nights drain
    through stream_append_to_index twice -- once as token postings, once
    as IVF assignments -- and the stream-written delta legs hold exactly
    the rows batch append_index_delta calls over the same nights write
    (same layout, same batch-id namespace).  Morning probes serve
    base ∪ stream legs: a query term / query vector finds streamed docs
    through bucketed-scan legs."""
    from etl_rf_matrix_controller_spark.operators.similarity import _sq_dist
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        append_index_delta,
        ensure_bucketed_index,
        index_delta_frames,
    )
    from etl_rf_matrix_controller_spark.sources.tables import load_table
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        batch_postings_rows,
        make_ivf_batch_encoder,
        stream_append_to_index,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    docs, nights = _nights(spark)

    # ---- postings: stream drain ----
    kind_s, kind_b, ver = "r10postS", "r10postB", "v1"
    kwp = dict(
        version=ver, sort_cols=["token", "doc_id"], n_buckets=8
    )
    ensure_bucketed_index(
        spark, SF_DIR, kind_s,
        lambda s, d: batch_postings_rows(docs), ["token"], **kwp,
    )
    src = str(tmp_path / "poststream")
    _stage_stream_files(spark, nights, src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_append_to_index(
        stream, spark, SF_DIR, kind=kind_s, bucket_cols=["token"],
        batch_rows=batch_postings_rows,
        checkpoint_path=str(tmp_path / "ckpt_post"), **kwp,
    )
    # ---- postings: batch twin under a sibling kind ----
    ensure_bucketed_index(
        spark, SF_DIR, kind_b,
        lambda s, d: batch_postings_rows(docs), ["token"], **kwp,
    )
    for i, night in enumerate(nights):
        append_index_delta(
            spark, SF_DIR, kind_b,
            lambda s, d, n=night: batch_postings_rows(n), ["token"],
            batch_id=f"s{i:03d}", **kwp,
        )
    legs_s = index_delta_frames(
        spark, SF_DIR, kind_s, version=ver, n_buckets=8
    )
    legs_b = index_delta_frames(
        spark, SF_DIR, kind_b, version=ver, n_buckets=8
    )
    assert len(legs_s) == 3 and len(legs_b) == 3
    for ls, lb in zip(legs_s, legs_b):  # per-leg, not just in union
        assert {tuple(r) for r in ls.collect()} == {
            tuple(r) for r in lb.collect()
        }

    # morning probe: a night-1 token ('zznew') resolves through a
    # stream-written bucketed leg
    term_hits = None
    base_post = ensure_bucketed_index(
        spark, SF_DIR, kind_s,
        lambda s, d: batch_postings_rows(docs), ["token"], **kwp,
    )
    for leg in [base_post] + legs_s:
        h = leg.filter(F.col("token") == "zznew")
        term_hits = h if term_hits is None else term_hits.unionByName(h)
    hit_ids = {r.doc_id for r in term_hits.collect()}
    assert hit_ids and all(i >= 4000000 for i in hit_ids)
    # the leg side of a morning probe JOIN is a bucketed scan (a pure
    # filter scan legitimately drops bucketing -- no join to feed)
    probe = spark.createDataFrame([("zznew",)], "token string")
    plan = plan_of(
        probe.alias("q")
        .hint("shuffle_hash")
        .join(legs_s[0].alias("i"), "token")
    )
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" not in plan, plan

    # ---- IVF: stream drain over embedding nights ----
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    cents = (
        emb.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce")
        )
        .localCheckpoint(eager=True)
    )
    enights = [
        emb.filter(F.col("vec_id") % 25 == m).select(
            (F.col("vec_id") + (m + 1) * 100000).alias("vec_id"),
            "embedding",
        )
        for m in (7, 8, 9)
    ]
    kind_vs, kind_vb = "r10ivfS", "r10ivfB"
    kwv = dict(
        version=ver, sort_cols=["cent_id", "vec_id"], n_buckets=8,
        source_table="embeddings",
    )
    encode = make_ivf_batch_encoder(cents)
    ensure_bucketed_index(
        spark, SF_DIR, kind_vs, lambda s, d: encode(emb), ["cent_id"],
        **kwv,
    )
    vsrc = str(tmp_path / "ivfstream")
    _stage_stream_files(spark, enights, vsrc)
    vstream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(vsrc)
    )
    stream_append_to_index(
        vstream, spark, SF_DIR, kind=kind_vs, bucket_cols=["cent_id"],
        batch_rows=encode, checkpoint_path=str(tmp_path / "ckpt_ivf"),
        **kwv,
    )
    ensure_bucketed_index(
        spark, SF_DIR, kind_vb, lambda s, d: encode(emb), ["cent_id"],
        **kwv,
    )
    for i, night in enumerate(enights):
        append_index_delta(
            spark, SF_DIR, kind_vb,
            lambda s, d, n=night: encode(n), ["cent_id"],
            batch_id=f"s{i:03d}", **kwv,
        )
    vlegs_s = index_delta_frames(
        spark, SF_DIR, kind_vs, version=ver, n_buckets=8,
        source_table="embeddings",
    )
    vlegs_b = index_delta_frames(
        spark, SF_DIR, kind_vb, version=ver, n_buckets=8,
        source_table="embeddings",
    )
    assert len(vlegs_s) == 3 and len(vlegs_b) == 3
    key = lambda r: (r["cent_id"], r["vec_id"])  # noqa: E731
    for ls, lb in zip(vlegs_s, vlegs_b):
        assert sorted(map(key, ls.collect())) == sorted(
            map(key, lb.collect())
        )

    # morning ANN probe: a streamed vector's verbatim copy is found in
    # its centroid's list through a stream-written leg
    q = emb.filter(F.col("vec_id") % 25 == 7).limit(1).collect()[0]
    qcent = (
        cents.select(
            "cent_id", _sq_dist(F.lit(q.embedding), F.col("ce")).alias("d")
        )
        .orderBy("d", "cent_id")
        .limit(1)
        .collect()[0]
        .cent_id
    )
    found = set()
    for leg in vlegs_s:
        found |= {
            r.vec_id
            for r in leg.filter(F.col("cent_id") == qcent).collect()
        }
    assert q.vec_id + 800000 in found, (q.vec_id, qcent, sorted(found)[:5])


def test_stream_ingest_compacts_mid_stream(spark, monkeypatch, tmp_path):
    """compact-at-K wired into the ingest loop: with max_deltas=2 the
    fold happens mid-stream (manifest flip to __g1), the next batch
    probes the new generation, and the final served state still equals
    the one-shot twin."""
    from etl_rf_matrix_controller_spark.plans.gram_index import (
        index_delta_frames,
    )
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        ADMBAND_N_BUCKETS,
    )
    from etl_rf_matrix_controller_spark.streaming.ingest import (
        admission_index_base,
        one_shot_retained,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    kind = "r9ingk"
    docs, nights, _ = _run_ingest(spark, tmp_path, kind, max_deltas=2)

    manifests = [
        n for n in os.listdir(str(tmp_path)) if n.endswith(".manifest.json")
    ]
    assert any(f"_{kind}_" in n for n in manifests), manifests
    serving = admission_index_base(
        spark, SF_DIR, kind=kind, version="v1", cap=CAP
    )
    legs = index_delta_frames(
        spark, SF_DIR, kind, version="v1", n_buckets=ADMBAND_N_BUCKETS
    )
    # batches 0+1 folded into __g1 at the batch-1 trigger; batch 2's
    # delta attached to the new generation afterwards
    assert len(legs) == 1
    served = serving
    for leg in legs:
        served = served.unionByName(leg)
    all_docs = docs
    for n in nights:
        all_docs = all_docs.unionByName(n)
    assert {tuple(r) for r in served.collect()} == {
        tuple(r) for r in one_shot_retained(all_docs, CAP).collect()
    }
