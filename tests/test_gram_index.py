"""Persistent bucketed gram index (plans/gram_index.py): the round-7 fix
for the one sub-linear x100 decade (per-query ~20 GB gram shuffle).

Pins the three properties that make the index the 100 TB answer:
  1. ZERO Exchange in the consuming joins -- the postings table is
     bucketed on the join keys, so self-joins and agg-joins run
     bucket-to-bucket (`Bucketed: true` scans, no shuffle).
  2. Write-once semantics -- a second query against the same corpus hits
     the catalog (and a fresh catalog re-registers over the on-disk files
     instead of rebuilding).
  3. Results are IDENTICAL to the ad-hoc (checkpoint-per-run) path the
     span family used through round 6.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_rf_matrix_controller_spark.operators.corpus import gram_novelty_curve
from etl_rf_matrix_controller_spark.operators.dedup import (
    dup_corpus,
    jac8_gram_index,
    span_char_gram_index,
    span_token_gram_index,
    substring_span_dups,
    substring_span_pairs_df,
    token_span_dups,
    token_span_pairs_df,
)
from etl_rf_matrix_controller_spark.plans.gram_index import (
    corpus_fingerprint,
    index_root,
)
from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def _span_self_join(pg):
    a, b = pg.alias("a"), pg.alias("b")
    return a.join(
        b.hint("shuffle_hash"),
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )


def test_span_char_join_zero_exchange(spark):
    """The char-span self-join must consume two Bucketed scans and plan
    NO Exchange of any kind -- this is the contract that kills the
    per-query gram shuffle."""
    plan = plan_of(_span_self_join(span_char_gram_index(spark, SF_DIR)))
    assert "Exchange" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_span_token_join_zero_exchange(spark):
    plan = plan_of(_span_self_join(span_token_gram_index(spark, SF_DIR)))
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_jaccard_pair_join_zero_exchange(spark):
    """(gram, source) self-join over the 2-key bucketed table: the pair
    counting up to the partial aggregate plans zero Exchange."""
    pg = jac8_gram_index(spark, SF_DIR)
    a, b = pg.alias("a"), pg.alias("b")
    j = a.join(
        b.hint("shuffle_hash"),
        (F.col("a.gram") == F.col("b.gram"))
        & (F.col("a.source") == F.col("b.source"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    plan = plan_of(j)
    assert "Exchange" not in plan, plan
    assert plan.count("Bucketed: true") == 2, plan


def test_full_span_query_single_small_exchange(spark):
    """The complete substring_span_dups plan: the ONLY exchange left is
    the post-match diagonal window/rollup (match-scaled, not
    corpus-scaled), and the gram join stays bucket-local."""
    plan = plan_of(substring_span_dups(spark, SF_DIR))
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, f"expected <=1 post-match shuffle:\n{plan}"


def test_novelty_first_seen_agg_zero_exchange(spark):
    """gram_novelty_curve: first-seen aggregation AND the join back both
    run inside buckets -- exactly one exchange total (the final per-doc
    rollup)."""
    plan = plan_of(gram_novelty_curve(spark, SF_DIR))
    assert "Bucketed: true" in plan, plan
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles == 1, f"expected only the per-doc rollup:\n{plan}"


def test_index_written_once_and_reregistered(spark):
    """Second access = catalog hit (no rebuild: on-disk meta mtime
    unchanged); dropping the catalog entry re-registers from disk via
    CREATE TABLE (cross-session reuse) instead of rebuilding."""
    pg = span_char_gram_index(spark, SF_DIR)
    n1 = pg.count()
    tag = corpus_fingerprint(SF_DIR)
    table = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("gram_idx_spanchar_v1_") and tag in t.name
    ]
    assert len(table) == 1, table
    meta = os.path.join(index_root(), table[0], "_graft_meta.json")
    mtime = os.stat(meta).st_mtime_ns
    assert span_char_gram_index(spark, SF_DIR).count() == n1
    assert os.stat(meta).st_mtime_ns == mtime, "index was rebuilt"
    # simulate a fresh session: drop the catalog entry, keep the files
    spark.sql(f"DROP TABLE {table[0]}")
    assert span_char_gram_index(spark, SF_DIR).count() == n1
    assert os.stat(meta).st_mtime_ns == mtime, "re-registration rebuilt"
    with open(meta) as fh:
        m = json.load(fh)
    assert m["bucket_cols"] == ["gram"]


def test_indexed_results_equal_adhoc_path(spark):
    """The persistent-index span queries return exactly the rows of the
    round-6 ad-hoc (localCheckpoint) path."""
    docs = dup_corpus(spark, SF_DIR)
    for indexed, adhoc in (
        (substring_span_dups(spark, SF_DIR), substring_span_pairs_df(docs)),
        (token_span_dups(spark, SF_DIR), token_span_pairs_df(docs)),
    ):
        got = {tuple(r) for r in indexed.collect()}
        want = {tuple(r) for r in adhoc.collect()}
        assert got == want


def test_winnow_selection_zero_exchange_zero_sort(spark):
    """The winnow family's selection windows read their distribution AND
    ordering straight off the bucketBy(doc_id).sortBy(doc_id, pos) index
    (one file per bucket + spark.sql.legacy.bucketedTableScan.
    outputOrdering): the whole selection plans NO Exchange and NO Sort."""
    from etl_rf_matrix_controller_spark.operators.dedup import (
        token_winnow_gram_index,
        winnow_gram_index,
        winnow_select_fps_df,
    )

    for idx in (
        winnow_gram_index(spark, SF_DIR),
        token_winnow_gram_index(spark, SF_DIR),
    ):
        plan = plan_of(winnow_select_fps_df(idx))
        assert "Exchange" not in plan, plan
        assert "Sort " not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert plan.count("Window") == 2, plan


def test_incremental_probe_shuffles_only_the_batch(spark):
    """incremental_near_dup_check's probe join: the corpus-scaled band
    index is a bucketed scan with NO exchange; the only exchange feeding
    the join is the batch's own bands (batch-scaled).  This is the
    structural 100 TB posture -- shuffle the batch, never the corpus."""
    from etl_rf_matrix_controller_spark.operators.dedup import (
        incremental_band_index,
        new_batch_docs,
        per_row_band_rows,
    )
    from etl_rf_matrix_controller_spark.sources.tables import load_table

    idx = incremental_band_index(spark, SF_DIR)
    nb = per_row_band_rows(
        new_batch_docs(
            load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        )
    )
    j = nb.alias("n").hint("shuffle_hash").join(
        idx.alias("i"),
        (F.col("n.band") == F.col("i.band"))
        & (F.col("n.bkey") == F.col("i.bkey")),
    )
    plan = plan_of(j)
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert plan.count("Bucketed: true") == 1, plan
    # exactly one hash exchange: the batch side being shuffled into the
    # index's bucketing
    assert plan.count("Exchange hashpartitioning") == 1, plan
