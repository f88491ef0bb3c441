"""PySpark-native analytics engine with the query and data-processing
capabilities of jibatsu/ETL-RF-Matrix-Controller, re-expressed Spark-first.

The reference is a desktop controller for ETL Systems RF crosspoint matrix
routers (``/root/reference/etl_controller.py``). Its capabilities -- stateful
last-write-wins key routing, run-length island grouping, range-partitioned
address spaces, periodic telemetry polling with regex extraction,
snapshot/restore presets, denormalizing exports, checksum math -- are
re-expressed here as distributed DataFrame operators, plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) mandated by the build contract.

Design tenets (see SURVEY.md SS4, SS7):
  * DataFrame/SQL only; no RDDs; no row-at-a-time Python UDFs in hot paths.
  * Let Catalyst do pushdown/pruning/join-selection; we only add broadcast
    hints for genuinely small dims and size shuffle partitions.
  * Every operator is key-partitionable and shuffle-bounded so it scales
    linearly with executors at 100 TB.
"""

__version__ = "0.1.0"

from etl_rf_matrix_controller_spark.api import MatrixEngine  # noqa: F401
from etl_rf_matrix_controller_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    declared,
)
