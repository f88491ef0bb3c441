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
