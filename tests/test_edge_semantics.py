"""Edge-semantics unit tests pinned to reference behavior (SURVEY.md SS5.3):
descending ranges, empty strings, overflow clamp, preset scope, frame
parsing details."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.functions.ranges import islands, parse_ranges
from etl_rf_matrix_controller_spark.operators.range_partition import (
    range_partition_outputs,
)
from tests.conftest import SF_DIR


def test_descending_range(spark):
    """'10-6' expands to [10, 9, 8, 7, 6] (etl_controller.py:89-90)."""
    df = spark.createDataFrame([("10-6",)], "range_str string")
    out = [r.n for r in parse_ranges(df).collect()]
    assert sorted(out, reverse=True) == [10, 9, 8, 7, 6]
    assert len(out) == 5


def test_empty_and_whitespace_ranges(spark):
    """'' yields nothing; ' 7 ' yields [7] (etl_controller.py:77, 84)."""
    df = spark.createDataFrame([("",), ("   ",), (" 7 ",)], "range_str string")
    rows = parse_ranges(df).collect()
    assert [(r.range_str.strip(), r.n) for r in rows] == [("7", 7)]


def test_overflow_clamps_to_last_router(spark):
    """Global ids beyond the total map to the LAST router with local ids
    continuing past its size (etl_controller.py:274-282)."""
    rows = {
        r.global_output: (r.router_id, r.local_output)
        for r in range_partition_outputs(spark, SF_DIR).collect()
    }
    assert rows[1] == (0, 1)
    assert rows[16] == (0, 16)
    assert rows[17] == (1, 1)
    assert rows[24] == (1, 8)
    assert rows[25] == (2, 1)
    assert rows[32] == (2, 8)
    # overflow: clamp to router 2, local ids run past its real size
    assert rows[33] == (2, 9)
    assert rows[40] == (2, 16)


def test_islands_breaks_on_gap_and_partition(spark):
    """Runs break on id gaps; separate partition keys never merge
    (etl_controller.py:306-328)."""
    df = spark.createDataFrame(
        [("g1", 1), ("g1", 2), ("g1", 4), ("g2", 5), ("g2", 6)],
        "grp string, n int",
    )
    spans = {
        (r.grp, r.island_start, r.island_end, r.island_size)
        for r in islands(df, "grp", "n").collect()
    }
    assert spans == {("g1", 1, 2, 2), ("g1", 4, 4, 1), ("g2", 5, 6, 2)}


def test_status_frame_digit_gate(spark):
    """Non-digit parts of a status frame are skipped before int cast
    (etl_controller.py:621); output index is 1-based (:619-622)."""
    frames = spark.createDataFrame(
        [("{BASTATUS,5,3,x,12}",)], "frame string"
    )
    parts = frames.select(
        F.posexplode(
            F.split(F.regexp_extract("frame", r"\{BASTATUS,(.*)\}", 1), ",")
        ).alias("idx", "part")
    )
    routes = parts.filter(F.col("part").rlike("^[0-9]+$")).select(
        (F.col("idx") + 1).alias("output"), F.col("part").cast("int").alias("input")
    )
    got = {(r.output, r.input) for r in routes.collect()}
    assert got == {(1, 5), (2, 3), (4, 12)}  # position 3 ('x') skipped


def test_preset_scope_none_vs_list(spark):
    """outputs=None applies everywhere; an explicit list restricts scope
    (etl_controller.py:157, 3222-3223)."""
    state = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "out int, inp int"
    )
    preset = spark.createDataFrame([(1, 99), (3, 77)], "out int, p_inp int")

    def apply_preset(scope):
        p = preset if scope is None else preset.filter(F.col("out").isin(scope))
        joined = state.alias("s").join(
            p.alias("p"), F.col("s.out") == F.col("p.out"), "left"
        )
        return {
            (r.out, r.final)
            for r in joined.select(
                F.col("s.out").alias("out"),
                F.coalesce(F.col("p.p_inp"), F.col("s.inp")).alias("final"),
            ).collect()
        }

    assert apply_preset(None) == {(1, 99), (2, 20), (3, 77)}
    assert apply_preset([3]) == {(1, 10), (2, 20), (3, 77)}
