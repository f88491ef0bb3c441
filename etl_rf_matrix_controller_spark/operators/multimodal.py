"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched pandas (mapInPandas).

Extension operators (build contract): image/audio/video travel as opaque
``binary`` columns with a typed metadata struct; decode / resize /
frame-sample run as pandas functions over Arrow batches.  The real codecs
(PIL/ffmpeg/librosa) are NOT in this container, so the decode step is
stubbed two ways, per the contract:

  * ``decode_real(...)`` raises ``NotImplementedError`` (clearly marked);
  * the default path computes a DETERMINISTIC FAKE feature set from the
    raw bytes, so the Spark-side plumbing -- schema, Arrow batch shape,
    partition-parallel UDF execution -- is real and oracle-testable
    (the fake features are pure byte arithmetic DuckDB can mirror).

Scale notes: mapInPandas streams Arrow batches (no per-row Python); binary
payloads never shuffle (the UDF runs on the scan partition); metadata-only
queries prune the binary column entirely at the parquet reader.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.operators.dedup import _CORPUS_SQL, dup_corpus
from etl_rf_matrix_controller_spark.plans.registry import declared
from etl_rf_matrix_controller_spark.sources.tables import load_table

if TYPE_CHECKING:
    import pandas as pd

FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_bytes int, first_byte int, "
    "byte_sum long, feature long"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the multimodal table: binary payload (md5 digest bytes of
    the text -- a stand-in for image bytes) + typed metadata struct."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("data"),
        F.struct(
            (1 + F.col("doc_id") % 64).cast("int").alias("width"),
            (1 + F.col("doc_id") % 48).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def decode_real(data: bytes, fmt: str) -> dict:
    """Real media decode -- requires codec libraries absent from this
    container. STUB: clearly marked, raises until PIL/ffmpeg are available."""
    raise NotImplementedError(
        "real media decode needs PIL/ffmpeg; use the deterministic fake path"
    )


def _decode_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Arrow-batched deterministic fake 'decode': pure byte arithmetic.

    Runs once per Arrow batch (not per row); the shape of this function --
    schema in, schema out, vectorized over the batch -- is exactly what a
    real PIL/ffmpeg decode would use.
    """
    import pandas as pd

    for pdf in batches:
        data = pdf["data"]
        n_bytes = data.map(len)
        byte_sum = data.map(lambda b: int(sum(b)))
        first_byte = data.map(lambda b: int(b[0]) if len(b) else -1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_bytes": n_bytes.astype("int32"),
                "first_byte": first_byte.astype("int32"),
                "byte_sum": byte_sum.astype("int64"),
                "feature": ((byte_sum * pdf["width"]) % 997).astype("int64"),
            }
        )


@declared(
    "multimodal_decode_features",
    oracle="""
    WITH m AS (
      SELECT doc_id, md5(text) AS h,
             CAST(1 + doc_id % 64 AS INT) AS width,
             CAST(1 + doc_id % 48 AS INT) AS height
      FROM documents
    ),
    s AS (
      SELECT doc_id, width, height,
             CAST(list_sum(list_transform(generate_series(0, 15),
               i -> ('0x' || substring(h, 1 + 2 * i, 2))::BIGINT))
               AS BIGINT) AS byte_sum,
             CAST(('0x' || substring(h, 1, 2))::BIGINT AS INT) AS first_byte
      FROM m
    )
    SELECT doc_id, width, height,
           CAST(16 AS INT) AS n_bytes,
           first_byte,
           byte_sum,
           CAST((byte_sum * width) % 997 AS BIGINT) AS feature
    FROM s
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode -> feature extraction through real mapInPandas plumbing.

    The binary column flows Spark -> Arrow -> pandas bytes; the fake
    decode's outputs are byte-exact mirrors of the oracle's hex arithmetic
    over the same md5 payload, proving schema, batch shape, and
    partition-parallel execution without the codec libs.
    """
    media = media_table(spark, sf_dir)
    flat = media.select(
        "doc_id",
        "data",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(_decode_batches, schema=FEATURE_SCHEMA)


@declared(
    "multimodal_meta_only",
    oracle="""
    SELECT CAST(1 + doc_id % 64 AS INT) AS width,
           count(*) AS n_items,
           CAST(sum(CAST(1 + doc_id % 48 AS INT)) AS BIGINT) AS sum_height
    FROM documents
    GROUP BY 1 + doc_id % 64
    """,
)
def multimodal_meta_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over the media table: the binary payload
    column must be pruned at the scan (verify via .explain ReadSchema --
    'data' absent), which is what makes metadata queries cheap at 100 TB."""
    media = media_table(spark, sf_dir)
    return (
        media.select(F.col("meta.width").alias("width"), F.col("meta.height").alias("height"))
        .groupBy("width")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("height").cast("bigint").alias("sum_height"),
        )
    )


RESIZE_TARGET = 32  # fit the longest side to 32, preserving aspect ratio
RESIZE_SCHEMA = (
    "doc_id long, width int, height int, new_width int, new_height int, "
    "resized_hash string"
)


def _resize_batches(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Arrow-batched deterministic fake 'resize': integer fit-to-box dims +
    an md5 over (payload hex, new dims) standing in for the resampled
    bytes.  A real implementation swaps the hash for PIL's resize over the
    decoded array; everything else (batch shape, schema, partition-local
    execution) is identical."""
    import hashlib

    import pandas as pd

    for pdf in batches:
        w = pdf["width"].astype("int64")
        h = pdf["height"].astype("int64")
        longest = w.where(w >= h, h)
        nw = (w * RESIZE_TARGET // longest).clip(lower=1).astype("int32")
        nh = (h * RESIZE_TARGET // longest).clip(lower=1).astype("int32")
        digest = [
            hashlib.md5(
                f"{d.hex()}_{a}x{b}".encode("ascii")
            ).hexdigest()
            for d, a, b in zip(pdf["data"], nw, nh)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "new_width": nw,
                "new_height": nh,
                "resized_hash": digest,
            }
        )


@declared(
    "multimodal_resize",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, md5(text) AS h,
             CAST(1 + doc_id % 64 AS INT) AS width,
             CAST(1 + doc_id % 48 AS INT) AS height
      FROM documents
    ),
    d AS (
      SELECT doc_id, h, width, height,
             greatest(width, height) AS longest
      FROM m
    )
    SELECT doc_id, width, height,
           CAST(greatest((width * {RESIZE_TARGET}) // longest, 1) AS INT)
             AS new_width,
           CAST(greatest((height * {RESIZE_TARGET}) // longest, 1) AS INT)
             AS new_height,
           md5(h || '_' ||
               CAST(greatest((width * {RESIZE_TARGET}) // longest, 1) AS VARCHAR)
               || 'x' ||
               CAST(greatest((height * {RESIZE_TARGET}) // longest, 1) AS VARCHAR))
             AS resized_hash
    FROM d
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: fit each image's metadata dims into a 32-box
    (longest side, integer-exact aspect preservation) and emit the
    deterministic stand-in for the resampled payload.  1 row in -> 1 row
    out through mapInPandas; the binary column never leaves the scan
    partition, so at 100 TB this is scan-transform-write with zero
    shuffle."""
    media = media_table(spark, sf_dir)
    flat = media.select(
        "doc_id",
        "data",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


FRAME_STRIDE = 4  # sample every 4th 'frame' (byte) of the fake video
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_byte int"


def _frame_sample_batches(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Arrow-batched deterministic fake 'frame sample': the 16-byte payload
    is a 16-frame video; emit every FRAME_STRIDE-th frame's byte.  The 1 ->
    N fan-out inside the pandas function is the shape a real ffmpeg frame
    extractor uses (one input row yields a variable number of frame rows,
    batched, never per-row Python calls)."""
    import pandas as pd

    for pdf in batches:
        ids, idxs, vals = [], [], []
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            for i in range(0, len(data), FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                vals.append(int(data[i]))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_byte": pd.Series(vals, dtype="int32"),
            }
        )


@declared(
    "multimodal_frame_sample",
    oracle=f"""
    WITH m AS (SELECT doc_id, md5(text) AS h FROM documents),
    f AS (
      SELECT doc_id, h,
             generate_series(0, 15, {FRAME_STRIDE}) AS frames
      FROM m
    )
    SELECT doc_id,
           CAST(i.i AS INT) AS frame_idx,
           CAST(('0x' || substring(h, 1 + 2 * i.i, 2))::BIGINT AS INT)
             AS frame_byte
    FROM f, unnest(frames) AS i(i)
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling plumbing: every FRAME_STRIDE-th frame of each
    payload, via a 1->N fan-out inside the Arrow batch.  Downstream
    (per-frame features, dedup, embedding) consumes the frame rows like
    any other table; the fan-out happens partition-local, so frame count
    scales with corpus bytes and never adds a shuffle."""
    media = media_table(spark, sf_dir)
    return media.select("doc_id", "data").mapInPandas(
        _frame_sample_batches, schema=FRAME_SCHEMA
    )


@declared(
    "multimodal_content_dedup",
    oracle=f"""
    WITH corpus AS ({_CORPUS_SQL}),
    media AS (
      SELECT doc_id, unhex(md5(text)) AS data FROM corpus
    ),
    groups AS (
      SELECT md5(hex(data)) AS content_hash,
             CAST(count(*) AS BIGINT) AS n_copies,
             CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
      FROM media GROUP BY md5(hex(data))
    )
    SELECT content_hash, n_copies, keeper_doc_id
    FROM groups WHERE n_copies >= 2
    """,
)
def multimodal_content_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content hash: fingerprint the opaque binary
    payload (md5 over its canonical hex rendering -- byte-identity that
    is format- and metadata-blind; DuckDB's md5 takes strings only, and
    hex() casing agrees across engines), group, and elect the lowest-id copy as
    keeper -- the first pass every multimodal ingest runs before any
    decode, since byte-identical assets are the bulk of media
    duplication (re-uploads, mirrors) and deduping them costs one hash
    per object instead of a decode.

    One map-side hash + one combinable aggregation on the 16-byte
    digest; the binary column itself never shuffles (only its hash
    does) -- at 100 TB of media that difference IS the job.  Output is
    bounded by duplicate groups.  The payload synthesis
    (media_table: digest bytes standing in for image bytes) guarantees
    the planted exact-dup documents collide, keeping the check
    non-vacuous: it runs over the dup-planted corpus (dup_corpus), whose
    +1M-id copies carry byte-identical payloads.
    """
    corpus = dup_corpus(spark, sf_dir)
    media = corpus.select("doc_id", F.unhex(F.md5("text")).alias("data"))
    groups = media.groupBy(F.md5(F.hex("data")).alias("content_hash")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
    )
    return groups.filter(F.col("n_copies") >= 2).select(
        "content_hash", "n_copies", "keeper_doc_id"
    )
