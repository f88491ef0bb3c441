"""S6 auto-detect analog tests: schema inference over an untyped CSV drop
(sources/autodetect.py), mirroring the reference's device-probe pair
get_device_info / get_matrix_config (etl_controller.py:463-477)."""

from __future__ import annotations

from pyspark.sql.types import DoubleType, IntegerType, StringType, TimestampType

from etl_rf_matrix_controller_spark.sources.autodetect import (
    detect_csv_schema,
    detect_matrix_config,
)


CSV = """route_id,level,gain,label,seen_at
1,3,0.5,main,2024-01-01 10:00:00
2,7,1.25,backup,2024-01-01 11:30:00
3,2,2.0,aux,2024-01-02 09:15:00
"""


def test_infer_schema_types_and_dims(spark, tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "routes.csv").write_text(CSV)
    # Tiny drop: exact inference is worth the full read (the default 0.1
    # sampling ratio is the 100 TB posture, not the 3-row one).
    df = detect_csv_schema(spark, str(p), sampling_ratio=1.0)
    got = {f.name: type(f.dataType) for f in df.schema.fields}
    assert got == {
        "route_id": IntegerType,
        "level": IntegerType,
        "gain": DoubleType,
        "label": StringType,
        "seen_at": TimestampType,
    }
    assert detect_matrix_config(df) == (3, 5)
    # Bounded-scan estimate: single-partition source -> exact here, but
    # via the one-partition path (no full count job at scale).
    est_rows, est_cols = detect_matrix_config(df, exact=False)
    assert est_cols == 5 and est_rows >= 1


def test_pinned_schema_reread_skips_inference(spark, tmp_path):
    """The detected schema re-reads the source with inference OFF -- the
    full-scale scan must not pay the sampling pass; same rows, same types."""
    p = tmp_path / "drop"
    p.mkdir()
    (p / "routes.csv").write_text(CSV)
    probe = detect_csv_schema(spark, str(p), sampling_ratio=1.0)
    pinned = (
        spark.read.option("header", "true")
        .schema(probe.schema)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(str(p))
    )
    assert pinned.schema == probe.schema
    assert sorted(map(tuple, pinned.collect())) == sorted(map(tuple, probe.collect()))
