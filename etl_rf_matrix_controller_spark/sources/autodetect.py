"""S6 auto-detect analog: schema + shape inference over untyped input.

Reference semantics: the controller probes the device for its identity
(``get_device_info``, ``{*BI}`` -> parsed model string,
etl_controller.py:463-469) and its matrix dimensions
(``get_matrix_config``, ``{ABM?}`` -> ``(inputs, outputs)``,
etl_controller.py:471-477) instead of requiring the user to declare them.

Spark re-expression: the "device" is an untyped file drop (CSV with no
declared schema); probing is ``spark.read.option("inferSchema")``, which
samples the data to type every column, and the matrix-size probe is the
(n_rows, n_cols) of the inferred relation.  At 100 TB inference is a
bounded-sample scan (``samplingRatio``) -- never a full pass -- and the
detected schema is then pinned for the real read so the full scan runs
with zero inference cost and full predicate/prune support.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def detect_csv_schema(
    spark: SparkSession, path: str, sampling_ratio: float = 0.1
) -> DataFrame:
    """Probe an untyped CSV drop: infer column names + types from the data
    (header row + value sampling), mirroring get_matrix_config's parse of
    an untyped probe response into typed dimensions.

    Returns the inferred DataFrame; callers read ``.schema`` for the
    detected types and should re-read with that schema pinned for the
    full-scale scan (inference samples the file a second time otherwise).
    ``sampling_ratio`` bounds the inference scan at scale -- the default
    honors the module's bounded-sample contract (pass 1.0 explicitly for
    a small drop where exact inference is worth a full read).
    """
    return (
        spark.read.option("header", "true")
        .option("inferSchema", "true")
        .option("samplingRatio", str(sampling_ratio))
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )


def detect_matrix_config(df: DataFrame, exact: bool = True) -> tuple[int, int]:
    """The ``{ABM?}`` size probe (etl_controller.py:471-477): report the
    detected (rows, cols) of the relation.  Returns (0, n_cols) for an
    empty-but-typed source, like the reference returning a parsed size
    from a device with no routes yet.

    ``exact=False`` swaps the full count for a one-partition estimate
    scaled by partition count -- the bounded-scan variant for a 100 TB
    drop where the caller only needs the order of magnitude."""
    n_cols = len(df.schema.fields)
    if exact:
        return (df.count(), n_cols)
    parts = df.rdd.getNumPartitions() or 1
    first = df.rdd.mapPartitionsWithIndex(
        lambda i, it: [sum(1 for _ in it)] if i == 0 else []
    ).collect()
    est = (first[0] if first else 0) * parts
    return (est, n_cols)
