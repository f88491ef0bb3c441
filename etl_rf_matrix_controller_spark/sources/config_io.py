"""JSON config persistence: schema-on-read with per-field defaults.

Reference semantics: ``RouterConfig.to_dict/from_dict``
(etl_controller.py:227-231, 332-377) serialize the full app state to JSON;
every ``from_dict`` field uses ``.get(...)`` with a default, so old files
load into new versions (forward/backward compatible dynamic schema).
Profiles resolve to per-router files (:2590-2615, 3303-3309); JSON forces
string keys, re-cast on load (:163, 171, 341-342, 355).

Spark re-expression (S4): explicit ``StructType`` + ``coalesce`` defaults
on read -- never inferSchema in production (a schema drift would silently
retype columns); int-keyed maps round-trip through JSON string keys with
an explicit re-cast, exactly like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The reference RouterConfig distilled (etl_controller.py:177-225): scalars,
# string-keyed maps (JSON), arrays of structs.
CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("router_ip", T.StringType()),
        T.StructField("router_port", T.IntegerType()),
        T.StructField("num_inputs", T.IntegerType()),
        T.StructField("num_outputs", T.IntegerType()),
        T.StructField("input_names", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "output_groups",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("color", T.StringType()),
                        T.StructField("outputs", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
        T.StructField(
            "route_presets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField(
                            "routes", T.MapType(T.StringType(), T.IntegerType())
                        ),
                        T.StructField("outputs", T.ArrayType(T.IntegerType())),
                    ]
                )
            ),
        ),
    ]
)

DEFAULTS = {
    "router_ip": F.lit("192.168.1.100"),
    "router_port": F.lit(2000),
    "num_inputs": F.lit(16),
    "num_outputs": F.lit(16),
}


def load_config(spark: SparkSession, path: str) -> DataFrame:
    """Read config JSON with the explicit schema; missing fields land as
    NULL and are backfilled with the reference's defaults
    (etl_controller.py:332-377 pattern: .get(key, default))."""
    df = spark.read.schema(CONFIG_SCHEMA).json(path)
    for field, default in DEFAULTS.items():
        df = df.withColumn(field, F.coalesce(F.col(field), default))
    return df.withColumn(
        "input_names",
        F.coalesce(
            F.col("input_names"),
            F.create_map().cast("map<string,string>"),
        ),
    ).withColumn(
        "output_groups",
        F.coalesce(
            F.col("output_groups"), F.array().cast(CONFIG_SCHEMA["output_groups"].dataType)
        ),
    )


def int_keyed_names(config: DataFrame) -> DataFrame:
    """Re-cast JSON string map keys to ints (etl_controller.py:341-342):
    explode the map, cast, usable as a join dim."""
    return config.select(
        F.explode("input_names").alias("k", "input_name")
    ).select(F.col("k").cast("int").alias("input_id"), "input_name")


def save_config(config: DataFrame, path: str) -> None:
    """Whole-document JSON persistence (last-writer-wins full-file write,
    etl_controller.py:3303-3309)."""
    config.coalesce(1).write.mode("overwrite").json(path)
