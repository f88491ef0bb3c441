"""Storage-layer scale features: partition pruning, schema evolution,
corrupt-record tolerance.

Partition pruning is distinct from predicate pushdown: pushdown filters
row groups INSIDE files; pruning skips whole directories before any I/O.
At 100 TB, a date-partitioned layout plus pruning is the difference
between scanning a day and scanning three years.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_partition_pruning_skips_directories(spark, tmp_path):
    events = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "events_by_day")
    events.withColumn("day", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "day"
    ).mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter(F.col("day") == "2024-01-05")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [" in plan
    assert "2024-01-05" in plan, plan
    # the pruned read must only touch the matching partition's rows
    expected = events.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05").count()
    assert df.count() == expected > 0


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """Old files lacking a column coexist with new files (SURVEY SS1.3:
    forgiving deserialization -> Parquet mergeSchema + null backfill)."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        out + "/batch=1"
    )
    spark.createDataFrame(
        [(2, "b", 99.0)], "id long, name string, score double"
    ).write.parquet(out + "/batch=2")

    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "name", "score", "batch"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None  # old file backfilled with NULL
    assert rows[2].score == 99.0


def test_corrupt_json_records_tolerated(spark, tmp_path):
    """PERMISSIVE JSON read: bad records land in _corrupt_record instead of
    failing the job (the forgiving-load posture of the reference's config
    reader, etl_controller.py:332-377)."""
    p = tmp_path / "mixed.json"
    p.write_text(
        "\n".join(
            [
                json.dumps({"id": 1, "v": 10}),
                "{this is not json",
                json.dumps({"id": 2, "v": 20}),
            ]
        )
    )
    df = spark.read.schema("id long, v long, _corrupt_record string").json(
        str(p)
    )
    rows = df.collect()
    good = [r for r in rows if r.id is not None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record


def test_compaction_preserves_rows_and_clustering(spark, tmp_path):
    """compact_parquet collapses a fragmented table into the computed
    file count, keeps every row, and (with sort_cols) leaves the output
    range-clustered so footer min/max skipping still works."""
    import os

    import pyarrow.parquet as pq

    from etl_rf_matrix_controller_spark.operators.layout import compact_parquet
    from etl_rf_matrix_controller_spark.sources.tables import load_table

    frag = str(tmp_path / "frag")
    compacted = str(tmp_path / "compacted")
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id")
    ev.repartition(60).write.parquet(frag)

    def parquet_files(d):
        return [
            os.path.join(r, f)
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        ]

    assert len(parquet_files(frag)) == 60
    frag_bytes = sum(os.path.getsize(f) for f in parquet_files(frag))
    target = frag_bytes // 4  # force ~5 output files from 60
    n = compact_parquet(spark, frag, compacted, target, sort_cols=["user_id"])
    files = parquet_files(compacted)
    assert len(files) == n <= 6

    # No row lost, none duplicated.
    a = spark.read.parquet(frag).collect()
    b = spark.read.parquet(compacted).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # Clustering survived: per-file user_id ranges are pairwise disjoint
    # (range partitioning), so a point predicate touches ONE file.
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges


def test_training_shard_export_manifest_is_verifiable(spark, tmp_path):
    """Shard export: partition layout matches (lang, pack_bin), manifest
    totals equal the source packing, and per-shard content fingerprints
    re-verify against an independent read-back."""
    import json
    import os

    from pyspark.sql import functions as F

    from etl_rf_matrix_controller_spark.operators.curation import (
        export_training_shards,
        token_budget_packing,
    )

    out = str(tmp_path / "shards")
    manifest = export_training_shards(spark, SF_DIR, out)
    with open(os.path.join(out, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk == manifest

    packs = token_budget_packing(spark, SF_DIR)
    assert manifest["total_docs"] == packs.count()
    assert (
        manifest["total_tokens"]
        == packs.agg(F.sum("n_tokens")).collect()[0][0]
    )
    # Partition directories exist per shard and fingerprints re-verify.
    back = spark.read.parquet(out)
    fp = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast(
        "bigint"
    )
    again = {
        (r.lang, int(r.shard_id)): (int(r.n), int(r.fp))
        for r in back.groupBy("lang", "shard_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(fp).alias("fp"))
        .collect()
    }
    for s in manifest["shards"]:
        shard_dir = os.path.join(
            out, f"lang={s['lang']}", f"shard_id={s['shard_id']}"
        )
        assert os.path.isdir(shard_dir)
        assert again[(s["lang"], s["shard_id"])] == (
            s["n_docs"],
            s["content_fp"],
        )
        # one task per shard dir -> exactly one parquet file per shard
        pq = [f for f in os.listdir(shard_dir) if f.endswith(".parquet")]
        assert len(pq) == 1, pq


def test_orc_roundtrip_and_pushdown(spark, tmp_path):
    """Format breadth beyond parquet: ORC round-trips byte-identically and
    takes predicate pushdown + column pruning at the scan, the same scale
    contract the parquet readers are held to."""
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = str(tmp_path / "events_orc")
    events.write.mode("overwrite").orc(out)

    back = spark.read.orc(out)
    assert back.count() == events.count()
    df = back.filter(F.col("user_id") == 7).select("event_id", "value")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)" in plan, plan
    assert "ReadSchema: struct<event_id:bigint,user_id:bigint,value:double>" in plan
    got = sorted(r.event_id for r in df.collect())
    want = sorted(
        r.event_id for r in events.filter(F.col("user_id") == 7).collect()
    )
    assert got == want and got, "ORC round-trip changed the row set"
