"""Streaming near-duplicate admission control: the production ingest tier.

Exact-dup streaming already exists (dropDuplicatesWithinWatermark); this
module adds the NEAR-dup tier: MinHash-banded LSH admission as a real
Structured Streaming operator.  Reference: the incremental batch form is
operators/dedup.py::incremental_near_dup_check (band index probed by the
nightly batch); here the band index IS keyed streaming state, so admission
runs continuously instead of nightly.

Design (scale story first):
  * Signatures are computed PER ROW with array expressions -- no streaming
    aggregation, no shuffle before the keyed state op.  A document's
    MinHash is array_min over its (distinct-gram, permutation) transform,
    identical values to the batch groupBy(doc).min spelling.
  * The stream is keyed by (band, bkey); applyInPandasWithState holds, per
    band bucket, the FIRST ``cap`` arrival doc_ids (the df-cap discipline
    from winnow_overlap_pairs): state is bounded at n_bucket_keys x cap
    rows at ANY throughput, and a viral boilerplate bucket degrades
    gracefully (later members still PROBE and get flagged against the
    first ``cap`` exemplars; they just stop growing the index).
  * Candidate pairs stream out in update mode; the exact-Jaccard
    verification is a batch join against the (tiny, candidate-scaled)
    pair set -- the same two-tier LSH/verify split as the batch family.

batch == stream by construction: the retained set per bucket is "first
``cap`` docs in arrival order", which the batch twin spells as
row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id) <= cap (the
declared query feeds a single ordered source, so arrival order == doc_id
order).  Pinned across >= 3 real micro-batches in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_rf_matrix_controller_spark.operators.dedup import (
    BAND_ROWS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
    N_BANDS,
    doc_tokset_col,
    per_row_band_rows,
)
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.plans.scale import adaptive_state_shards

# First-`cap` docs retained per (band, bkey): the near-dup ingest df-cap.
NEARDUP_DF_CAP = 50
# State keys are SHARDED: hash(band, bkey) % NEARDUP_STATE_SHARDS is the
# applyInPandasWithState group key, each shard's state holding a map of
# its bucket keys -> retained ids.  Keying state by raw bkey made one
# Python/pandas group per bucket: ~140k singleton groups at sf0.1 cost
# ~0.2 ms of per-group overhead each (30.8 s measured, vs 2 s sharded).
# Sharding bounds group count at any corpus size; per-bucket semantics
# are untouched (buckets are processed independently inside the shard).
# Superseded by plans/scale.py::adaptive_state_shards (round 11); kept
# as the documented historical constant for the round-8 measurement.
NEARDUP_STATE_SHARDS = 1024

_PAIR_SCHEMA = StructType(
    [StructField("doc_a", LongType()), StructField("doc_b", LongType())]
)
_BUCKET_STATE_SCHEMA = StructType(
    [
        StructField("bkeys", ArrayType(StringType())),
        StructField("retained", ArrayType(ArrayType(LongType()))),
    ]
)


# _toks_col / per_row_band_rows moved to operators/dedup.py in round 7
# (the persistent incremental band index builds from the same machinery);
# re-exported here for the streaming twin's callers.
_toks_col = doc_tokset_col


def _make_band_admitter(cap: int):
    def _admit(key, pdf_iter, state: GroupState):
        """One SHARD of the band index: state is (bkeys, retained-lists)
        parallel arrays -- a map of this shard's bucket keys to their
        first-``cap`` arrival doc_ids.  Buckets are independent; rows are
        processed in doc_id order per bucket (the batch twin's ORDER BY
        doc_id contract)."""
        import pandas as pd

        if state.exists:
            bkeys, lists = state.get
            index = {k: list(v) for k, v in zip(bkeys, lists)}
        else:
            index = {}
        out_a: list[int] = []
        out_b: list[int] = []
        batch = [pdf for pdf in pdf_iter if not pdf.empty]
        if batch:
            rows = pd.concat(batch).sort_values("doc_id")
            for bk, grp in rows.groupby("skey", sort=False):
                retained = index.setdefault(bk, [])
                for doc in grp["doc_id"].astype("int64"):
                    doc = int(doc)
                    out_a.extend(retained)
                    out_b.extend([doc] * len(retained))
                    if len(retained) < cap:
                        retained.append(doc)
        state.update((list(index.keys()), list(index.values())))
        yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return _admit


def stream_band_candidates(
    docs_stream: DataFrame,
    spark: SparkSession,
    cap: int,
    name: str,
    progress_holder: list | None = None,
) -> DataFrame:
    """Run the banded admission state op over a streaming (doc_id, text)
    frame to completion (availableNow); returns the DISTINCT candidate
    pair set as a batch frame (a pair colliding in both bands emits
    twice across band keys -- dedup is batch-side after the sink, which
    keeps the streaming query single-stateful-operator).  Pass
    ``progress_holder`` to receive the per-batch StreamingQueryProgress
    dicts (the state-bound assertion reads numRowsTotal from them)."""
    pairs = (
        per_row_band_rows(docs_stream)
        .select(
            "doc_id",
            F.concat_ws("|", F.col("band").cast("string"), "bkey").alias(
                "skey"
            ),
        )
        .withColumn(
            # scale-adaptive shard count (round 11): results are shard-
            # invariant; see plans/scale.py::adaptive_state_shards
            "shard",
            F.pmod(
                F.xxhash64("skey"), F.lit(adaptive_state_shards(spark))
            ),
        )
        .groupBy("shard")
        .applyInPandasWithState(
            _make_band_admitter(cap),
            outputStructType=_PAIR_SCHEMA,
            stateStructType=_BUCKET_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        pairs.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if progress_holder is not None:
        progress_holder.extend(q.recentProgress)
    return spark.table(name).distinct()


def batch_band_candidates(docs: DataFrame, cap: int) -> DataFrame:
    """Batch twin of the streaming admission: first-``cap``-per-bucket
    retained set via row_number, candidates = retained x later arrivals.
    Used by the stream==batch pytest across real micro-batches."""
    from pyspark.sql.window import Window

    bands = per_row_band_rows(docs).localCheckpoint(eager=False)
    w = Window.partitionBy("band", "bkey").orderBy("doc_id")
    retained = (
        bands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
    a, b = retained.alias("a"), bands.alias("b")
    return (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def _mh_sql() -> str:
    fp = "(('0x' || substring(md5(g), 1, 8))::BIGINT)"
    cols = ", ".join(
        f"CAST(list_min(list_transform(toks, g -> ({a} * {fp} + {b}) "
        f"% {MINHASH_PRIME})) AS BIGINT) AS mh{j}"
        for j, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    )
    return cols


def _bands_union_sql() -> str:
    selects = []
    for band in range(N_BANDS):
        lo = BAND_ROWS * band
        key = " || '_' || ".join(
            f"CAST(mh{j} AS VARCHAR)" for j in range(lo, lo + BAND_ROWS)
        )
        selects.append(f"SELECT doc_id, {band} AS band, {key} AS bkey FROM sig")
    return "\n      UNION ALL\n      ".join(selects)


_NEARDUP_CORPUS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 4000000, text || ' zznew'
      FROM documents WHERE doc_id % 10 = 3
      UNION ALL
      SELECT doc_id + 5000000, reverse(trim(text))
      FROM documents WHERE doc_id % 10 = 4
"""


@declared(
    "stream_near_dup_admission",
    oracle=f"""
    WITH corpus AS ({_NEARDUP_CORPUS_SQL}),
    toksets AS MATERIALIZED (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(length(trim(text)) - 7, 1)),
               i -> substring(trim(text), CAST(i AS INT), 8))) AS toks
      FROM corpus
    ),
    sig AS (SELECT doc_id, {_mh_sql()} FROM toksets),
    bands AS MATERIALIZED (
      {_bands_union_sql()}
    ),
    retained AS (
      SELECT doc_id, band, bkey,
             row_number() OVER (PARTITION BY band, bkey ORDER BY doc_id)
               AS rn
      FROM bands
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM retained a
      JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                  AND a.doc_id < b.doc_id
      WHERE a.rn <= {NEARDUP_DF_CAP}
    )
    SELECT c.doc_a, c.doc_b,
           len(list_intersect(ta.toks, tb.toks)) * 1.0
             / len(list_distinct(list_concat(ta.toks, tb.toks))) AS jaccard
    FROM cand c
    JOIN toksets ta ON ta.doc_id = c.doc_a
    JOIN toksets tb ON tb.doc_id = c.doc_b
    WHERE len(list_intersect(ta.toks, tb.toks)) * 1.0
          / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.6
    """,
)
def stream_near_dup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup admission control as a STREAM: documents flow through the
    per-row band computation into the keyed (band, bkey) state op, which
    flags each arrival against the first-{NEARDUP_DF_CAP} retained
    exemplars of its buckets; flagged candidates are then
    exact-Jaccard-verified batch-side (candidate-scaled).  The corpus
    synthesizes one near-dup (+4M, ' zznew') per doc_id%10==3 and one
    scrambled decoy (+5M, reversed) per %10==4 -- the same ingest shapes
    incremental_near_dup_check certifies nightly, now admitted
    continuously.

    100 TB posture: state is bounded at n_bucket_keys x cap doc_ids
    (bucket keys are hashes -- uniform), signatures need zero shuffle
    (per-row array fold), and verification touches only flagged pairs.
    Stream == batch pinned across >= 3 real micro-batches (including a
    hot bucket past the cap) in tests/test_streaming.py.
    """
    batch_docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    variants = F.filter(
        F.array(
            F.struct(F.col("doc_id"), F.col("text")),
            F.when(
                F.col("doc_id") % 10 == 3,
                F.struct(
                    (F.col("doc_id") + 4000000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zznew")).alias("text"),
                ),
            ),
            F.when(
                F.col("doc_id") % 10 == 4,
                F.struct(
                    (F.col("doc_id") + 5000000).alias("doc_id"),
                    F.reverse(F.trim("text")).alias("text"),
                ),
            ),
        ),
        lambda x: x.isNotNull(),
    )

    def fan_out(docs: DataFrame) -> DataFrame:
        return docs.select(F.explode(variants).alias("r")).select("r.*")

    stream = fan_out(
        spark.readStream.schema(batch_docs.schema).parquet(
            sf_dir, pathGlobFilter="documents.parquet"
        )
    )
    cand = stream_band_candidates(
        stream, spark, NEARDUP_DF_CAP, "near_dup_admission_stream"
    )
    # batch-side verification over the candidate-scaled pair set: only
    # docs that appear in a candidate pair need token sets, so semi-join
    # the fan-out down to the candidate ids (collision-scaled,
    # broadcastable) BEFORE the O(len) shingling fan-out (rebalanced
    # before the per-row expansion, same rule as the stream)
    pair_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    toksets = (
        fan_out(batch_docs)
        .join(F.broadcast(pair_ids), "doc_id", "left_semi")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", _toks_col().alias("toks"))
        .localCheckpoint(eager=False)
    )
    ta, tb = toksets.alias("ta"), toksets.alias("tb")
    jacc = F.size(
        F.array_intersect(F.col("ta.toks"), F.col("tb.toks"))
    ) / F.size(F.array_union(F.col("ta.toks"), F.col("tb.toks")))
    return (
        cand.join(ta, F.col("ta.doc_id") == F.col("doc_a"))
        .join(tb, F.col("tb.doc_id") == F.col("doc_b"))
        .filter(jacc >= 0.6)
        .select("doc_a", "doc_b", jacc.alias("jaccard"))
    )
