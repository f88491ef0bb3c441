from etl_rf_matrix_controller_spark.sources.tables import TABLES, load_table  # noqa: F401
