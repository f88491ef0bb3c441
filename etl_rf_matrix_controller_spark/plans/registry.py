"""Declared-query registry: the testable contract from SURVEY.md SS2.

Every operator module registers its queries here via the ``declared``
decorator.  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over these dicts, so the driver's DuckDB-oracle gate and our own pytest
parity suite exercise exactly the same surface.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def declared(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the implementation of declared query ``name``.

    ``oracle`` is the DuckDB-runnable ANSI SQL mirror; omit it only for
    genuinely non-SQL-expressible ops (the driver then records a weaker
    rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate declared query: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run."""
    # Imports are inside the function to avoid import cycles.
    from etl_rf_matrix_controller_spark.functions import (  # noqa: F401
        checksums,
        colors,
        ranges,
        regex_extract,
    )
    from etl_rf_matrix_controller_spark.operators import (  # noqa: F401
        aggregates,
        analytics_suite,
        analytics_suite2,
        behavior,
        cdc,
        cleaning,
        clustering,
        corpus,
        curation,
        dedup,
        graph,
        groups,
        joins,
        layout,
        multimodal,
        pipeline,
        presets,
        profiling,
        range_partition,
        reshape,
        search,
        setops,
        similarity,
        state,
        text,
        window_frames,
        windows,
    )
    from etl_rf_matrix_controller_spark.streaming import (  # noqa: F401
        anomaly as _san,
        curation as _scu,
        drift as _sdr,
        ingest as _sin,
        neardup as _snd,
        sampling as _ssa,
        transitions as _str,
        windows as _sw,
    )
