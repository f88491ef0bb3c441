"""Round-4 (cont. 4) operator edge semantics: Page-Hinkley excursion on
a crafted mean shift, McNemar cell counting with a hand-placed p99
threshold, and reciprocal-rank fusion cross-checked against the two
declared per-system rankings it fuses."""

from __future__ import annotations

import datetime as dt

from tests.conftest import SF_DIR
from tests.test_round4_ops import _write_events


def test_page_hinkley_rises_after_mean_shift(spark, tmp_path):
    """Daily totals 10,10,10,20,20 (dollars): PH stays 0 through the
    stable prefix and climbs once the mean shifts up -- hand-computed
    n*cumsum - t*S series and its running-min excursion."""
    from etl_rf_matrix_controller_spark.operators.profiling import (
        page_hinkley_drift,
    )

    rows = []
    eid = 0
    for day, total in enumerate([10.0, 10.0, 10.0, 20.0, 20.0]):
        ts = dt.datetime(2024, 3, 1) + dt.timedelta(days=day)
        rows.append((eid, ts, 1, "click", total, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r.t: (r.mt_n_c, r.ph_n_c) for r in page_hinkley_drift(spark, sf).collect()}
    # cents: v = [1000]*3 + [2000]*2, S=7000, n=5
    assert got == {
        1: (-2000, 0),
        2: (-4000, 0),
        3: (-6000, 0),
        4: (-3000, 3000),
        5: (0, 6000),
    }


def test_mcnemar_cells_and_statistic(spark, tmp_path):
    """100 events over 30 days; exactly two top-1% values (threshold =
    rank-99 value) both land in H1 for two distinct users -> b=2, c=0,
    statistic 1e6*4//2, continuity-corrected 1e6*1//2."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        mcnemar_activity_shift,
    )

    rows = []
    for eid in range(98):  # background: value 1.0 spread over all 30 days
        ts = dt.datetime(2024, 3, 1) + dt.timedelta(days=eid % 30, minutes=eid)
        rows.append((eid, ts, 10 + (eid % 5), "click", 1.0, "{}"))
    # two big events in H1 (days 2 and 3) for users 1 and 2
    rows.append((98, dt.datetime(2024, 3, 3), 1, "click", 100.0, "{}"))
    rows.append((99, dt.datetime(2024, 3, 4), 2, "click", 100.0, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    [r] = mcnemar_activity_shift(spark, sf).collect()
    assert (r.n_both, r.b_lost, r.c_gained) == (0, 2, 0)
    assert r.mcnemar_ppm == 2_000_000
    assert r.mcnemar_cc_ppm == 500_000


def test_mcnemar_null_when_no_discordance(spark, tmp_path):
    """All top-value activity concordant (same user hits the threshold in
    both halves) -> b=c=0 and both statistics NULL, not an error."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        mcnemar_activity_shift,
    )

    rows = []
    for eid in range(98):
        ts = dt.datetime(2024, 3, 1) + dt.timedelta(days=eid % 30, minutes=eid)
        rows.append((eid, ts, 10 + (eid % 5), "click", 1.0, "{}"))
    rows.append((98, dt.datetime(2024, 3, 3), 1, "click", 100.0, "{}"))   # H1
    rows.append((99, dt.datetime(2024, 3, 28), 1, "click", 100.0, "{}"))  # H2
    sf = _write_events(spark, tmp_path, rows)
    [r] = mcnemar_activity_shift(spark, sf).collect()
    assert (r.n_both, r.b_lost, r.c_gained) == (1, 0, 0)
    assert r.mcnemar_ppm is None and r.mcnemar_cc_ppm is None


def test_rrf_fusion_matches_per_system_rankings(spark):
    """The fused list must be exactly reproducible from the two declared
    per-system top-10s: same candidate set, rrf_ppm = sum of
    1e6//(60+rank) over the systems listing the doc, fused rank ordered
    by (rrf desc, doc_id)."""
    from etl_rf_matrix_controller_spark.operators.search import (
        bm25_retrieval_topk,
        rrf_fusion_topk,
        tfidf_retrieval_topk,
    )

    ta = {r.doc_id: r.rnk for r in tfidf_retrieval_topk(spark, SF_DIR).collect()}
    tb = {r.doc_id: r.rnk for r in bm25_retrieval_topk(spark, SF_DIR).collect()}
    expected = {}
    for system in (ta, tb):
        for doc, rnk in system.items():
            n, s = expected.get(doc, (0, 0))
            expected[doc] = (n + 1, s + 1_000_000 // (60 + rnk))
    order = sorted(expected, key=lambda d: (-expected[d][1], d))[:10]
    got = rrf_fusion_topk(spark, SF_DIR).collect()
    assert [r.doc_id for r in sorted(got, key=lambda r: r.fused_rnk)] == order
    for r in got:
        assert (r.n_systems, r.rrf_ppm) == expected[r.doc_id]
