"""Z-order as a WORKING index, not just a computed key: write events
z-clustered to parquet, read back with a two-dimensional (user-bucket,
time-bucket) predicate, and prove row-group skipping against an
unclustered layout using the actual parquet footer stats Spark wrote.

The skipping arithmetic a lakehouse reader runs is exactly "does this
row group's [min,max] box intersect the predicate box" -- we run it here
over the real footers (via pyarrow) so the assertion is on the physical
artifact, not on a simulation.  Reference analog: range-partitioned
address spaces (etl_controller.py:248-284) exist so the GUI can touch
one block instead of the whole table; this is the same contract for
parquet row groups.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.operators.layout import (
    write_zordered,
    zorder_projection,
)
from etl_rf_matrix_controller_spark.sources.tables import load_table
from tests.conftest import SF_DIR

# Predicate box: low user buckets AND early-week/early-hour time buckets.
UA_LO, UA_HI = 0, 31
TB_LO, TB_HI = 0, 23
N_FILES = 8


def _row_groups_overlapping(path_dir) -> tuple[int, int]:
    """(overlapping, total) row groups whose footer [min,max] stats on
    (ua, tb) intersect the predicate box -- the reader's skip decision."""
    total = overlap = 0
    for f in sorted(path_dir.glob("*.parquet")):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            g = meta.row_group(rg)
            ua_s = g.column(names["ua"]).statistics
            tb_s = g.column(names["tb"]).statistics
            assert ua_s is not None and tb_s is not None, "no footer stats"
            if ua_s.min <= UA_HI and ua_s.max >= UA_LO and (
                tb_s.min <= TB_HI and tb_s.max >= TB_LO
            ):
                overlap += 1
    return overlap, total


def test_zorder_layout_skips_row_groups(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "ts")

    zpath = tmp_path / "events_z"
    lpath = tmp_path / "events_linear"
    write_zordered(ev, str(zpath), n_files=N_FILES)
    # Unclustered control: same projection, same file count, but
    # clustered by insertion order (event_id) -- the layout a plain
    # append pipeline produces.
    (
        zorder_projection(ev)
        .repartitionByRange(N_FILES, "event_id")
        .sortWithinPartitions("event_id")
        .write.mode("overwrite")
        .parquet(str(lpath))
    )

    z_hit, z_total = _row_groups_overlapping(zpath)
    l_hit, l_total = _row_groups_overlapping(lpath)
    assert z_total >= N_FILES and l_total >= N_FILES

    # The insertion-ordered layout cannot skip: every row group spans the
    # full (ua, tb) range, so the whole table is read.
    assert l_hit == l_total, (l_hit, l_total)
    # The z-clustered layout must actually skip -- at most half the row
    # groups may intersect the box (measured: 1-2 of 8 at this box).
    assert z_hit <= z_total // 2, (z_hit, z_total)
    assert z_hit < l_hit

    # Both layouts must return identical rows for the predicate, and the
    # predicate must reach the scan (PushedFilters) so the footer-stats
    # skipping asserted above is what Spark's reader actually exercises.
    pred = (
        (F.col("ua") >= UA_LO)
        & (F.col("ua") <= UA_HI)
        & (F.col("tb") >= TB_LO)
        & (F.col("tb") <= TB_HI)
    )
    zdf = spark.read.parquet(str(zpath)).filter(pred)
    ldf = spark.read.parquet(str(lpath)).filter(pred)
    z_ids = {r.event_id for r in zdf.collect()}
    l_ids = {r.event_id for r in ldf.collect()}
    assert z_ids == l_ids and z_ids, (len(z_ids), len(l_ids))
    fmt = zdf._sc._jvm.PythonSQLUtils.explainString(
        zdf._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [" in fmt and "ua" in fmt.split("PushedFilters")[1][:200]


def _ref_hilbert_xy2d(n, x, y):
    """Classic iterative xy->d (Wikipedia 'Hilbert curve' pseudocode)."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_chain_matches_reference_and_is_bijective(spark):
    from etl_rf_matrix_controller_spark.operators.layout import hilbert_chain

    pts = [(i, x, y) for i, (x, y) in enumerate(
        (x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)
    )]
    df = spark.createDataFrame(pts, "event_id bigint, ua bigint, tb bigint")
    got = {(r.ua, r.tb): r.d for r in hilbert_chain(df).collect()}
    for _, x, y in pts:
        assert got[(x, y)] == _ref_hilbert_xy2d(256, x, y), (x, y)
    # distinct (x, y) -> distinct d (injective on the sample)
    assert len(set(got.values())) == len(got)


def test_hilbert_blocks_tighter_than_zorder(spark):
    """The layout claim the operator's docstring makes, measured: over
    equal-width blocks, the Hilbert curve's worst block bounding-box
    AREA is no worse than the Z-curve's (Z's diagonal jumps inflate
    block rectangles)."""
    from etl_rf_matrix_controller_spark.operators.layout import (
        hilbert_layout_blocks,
        zorder_key_events,
    )

    def worst_area(df, a_min, a_max, b_min, b_max):
        rows = df.collect()
        return max(
            (r[a_max] - r[a_min] + 1) * (r[b_max] - r[b_min] + 1) for r in rows
        )

    h = worst_area(
        hilbert_layout_blocks(spark, SF_DIR),
        "min_user_bucket", "max_user_bucket",
        "min_time_bucket", "max_time_bucket",
    )
    z = worst_area(
        zorder_key_events(spark, SF_DIR),
        "min_user_bucket", "max_user_bucket",
        "min_time_bucket", "max_time_bucket",
    )
    assert h <= z, (h, z)
