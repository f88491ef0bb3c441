from etl_rf_matrix_controller_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    declared,
)
