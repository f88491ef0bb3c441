"""S4: JSON config round-trip with schema-on-read defaults
(etl_controller.py:227-231, 332-377)."""

from __future__ import annotations

import json

import pytest


@pytest.fixture()
def config_dir(tmp_path):
    full = {
        "router_ip": "10.0.0.5",
        "router_port": 4000,
        "num_inputs": 32,
        "num_outputs": 64,
        "input_names": {"1": "CAM 1", "2": "CAM 2"},
        "output_groups": [
            {"name": "Studio", "color": "#ff0000", "outputs": [1, 2, 3]}
        ],
        "route_presets": [
            {"name": "Morning", "routes": {"1": 5, "2": 6}, "outputs": None}
        ],
    }
    old_version = {"router_ip": "10.0.0.9"}  # ancient file: most fields absent
    p = tmp_path / "configs"
    p.mkdir()
    (p / "full.json").write_text(json.dumps(full))
    (p / "old.json").write_text(json.dumps(old_version))
    return str(p)


def test_load_applies_defaults_for_old_files(spark, config_dir):
    from etl_rf_matrix_controller_spark.sources.config_io import load_config

    df = load_config(spark, config_dir)
    rows = {r.router_ip: r for r in df.collect()}
    old = rows["10.0.0.9"]
    assert old.router_port == 2000  # default backfilled
    assert old.num_inputs == 16
    assert old.input_names == {}
    assert old.output_groups == []
    full = rows["10.0.0.5"]
    assert full.router_port == 4000
    assert full.output_groups[0].outputs == [1, 2, 3]


def test_int_keyed_map_recast(spark, config_dir):
    from etl_rf_matrix_controller_spark.sources.config_io import (
        int_keyed_names,
        load_config,
    )

    dim = int_keyed_names(load_config(spark, config_dir))
    got = {(r.input_id, r.input_name) for r in dim.collect()}
    assert got == {(1, "CAM 1"), (2, "CAM 2")}


def test_roundtrip(spark, config_dir, tmp_path):
    from etl_rf_matrix_controller_spark.sources.config_io import (
        load_config,
        save_config,
    )

    df = load_config(spark, config_dir)
    out = str(tmp_path / "saved")
    save_config(df, out)
    back = load_config(spark, out)
    assert back.count() == df.count()
    a = {r.router_ip for r in df.collect()}
    b = {r.router_ip for r in back.collect()}
    assert a == b
