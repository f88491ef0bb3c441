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


def _write_embeddings(spark, tmp_path, vecs):
    rows = [(i, v, i % 3) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_kcenter_greedy_trajectory(spark, tmp_path):
    """1-D layout 0, 1, 10, 11, 30, 31 (ids 0..5): greedy from vec 0
    picks 31 (farthest, d=961), then 11 (min-dist 121 beats 10's 100),
    then the three-way dmin=1 tie among {1, 10, 30} breaks to the
    smallest vec_id, 1 -- pins both the max-min argmax and its
    tie-break."""
    from etl_rf_matrix_controller_spark.operators.clustering import (
        kcenter_coreset_select,
    )

    comp0 = [0.0, 1.0, 10.0, 11.0, 30.0, 31.0]
    sf = _write_embeddings(spark, tmp_path, [[c] + [0.0] * 63 for c in comp0])
    got = {
        r.pick_order: (r.center_id, r.n_assigned, r.radius_q)
        for r in kcenter_coreset_select(spark, sf).collect()
    }
    # centers: vec0(0.0), vec5(31.0), vec3(11.0), vec1(1.0)
    assert [got[k][0] for k in sorted(got)] == [0, 5, 3, 1]
    # assignment (nearest, ties to smaller center id); grid 1e4 ->
    # unit sq dist quantizes to 1e8
    assert got[1] == (0, 1, 0)                     # vec0 alone, radius 0
    assert got[2] == (5, 2, 100000000)             # 30, 31
    assert got[3] == (3, 2, 100000000)             # 10, 11
    assert got[4] == (1, 1, 0)                     # vec1 exact


def test_cramers_v_perfect_and_independent(spark, tmp_path):
    """Perfect 2x2 association (returnflag determines linestatus) must
    yield V = 1.0 exactly -- this requires the ZERO cells of the
    contingency grid to contribute (o=0 terms are r*c*1e6/N each);
    dropping unobserved cells would give sqrt(0.5).  All rows share one
    shipdate, so the two weekday pairs are degenerate (min(r-1,c-1)=0)
    and must emit NULL V rather than raise ANSI DIVIDE_BY_ZERO."""
    import datetime as dt

    from etl_rf_matrix_controller_spark.operators.profiling import (
        cramers_v_profile,
    )

    rows = [("A", "X", dt.datetime(2024, 1, 1))] * 20 + [
        ("B", "Y", dt.datetime(2024, 1, 1))
    ] * 20
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {
        r.pair: r for r in cramers_v_profile(spark, str(tmp_path)).collect()
    }
    r = got["returnflag_linestatus"]
    assert (r.n, r.df) == (40, 1)
    assert r.chi2_micro == 40_000_000  # chi2 == n for perfect 2x2
    assert r.cramers_v == 1.0


def _ref_holt_winters(ys):
    """Plain-Python mirror of the declared fold (identical double ops)."""
    l = (ys[0] + ys[1] + ys[2] + ys[3] + ys[4] + ys[5] + ys[6]) / 7.0
    b = (
        (ys[7] + ys[8] + ys[9] + ys[10] + ys[11] + ys[12] + ys[13])
        - (ys[0] + ys[1] + ys[2] + ys[3] + ys[4] + ys[5] + ys[6])
    ) / 49.0
    s = [ys[j] - l for j in range(7)]
    for t in range(7, len(ys)):
        idx = t % 7
        lp = 0.3 * (ys[t] - s[idx]) + 0.7 * (l + b)
        bn = 0.1 * (lp - l) + 0.9 * b
        s[idx] = 0.2 * (ys[t] - lp) + 0.8 * s[idx]
        l, b = lp, bn
    fc = l + b + s[len(ys) % 7]
    return l / 10000.0, b / 10000.0, fc / 10000.0


def test_holt_winters_matches_python_reference(spark, tmp_path):
    """21-day series with trend + weekly shape, one event per day: the
    engine's struct-fold must equal the plain-Python reference
    bit-for-bit (identical IEEE operation sequence)."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        holt_winters_daily_value,
    )

    season = [0.0, 10.0, 20.0, 5.0, 0.0, 30.0, 50.0]
    vals = [100.0 + 5 * t + season[t % 7] for t in range(21)]
    rows = [
        (t, dt.datetime(2024, 3, 1) + dt.timedelta(days=t), 1, "click", v, "{}")
        for t, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = holt_winters_daily_value(spark, sf).collect()
    level, trend, fc = _ref_holt_winters([v * 10000 for v in vals])
    assert r.n_days == 21
    assert (r.level, r.trend, r.forecast_next) == (level, trend, fc)


def test_holt_winters_drops_short_series(spark, tmp_path):
    """A 14-day series (one day short of two seasons + 1) is excluded."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        holt_winters_daily_value,
    )

    rows = [
        (t, dt.datetime(2024, 3, 1) + dt.timedelta(days=t), 1, "click", 1.0, "{}")
        for t in range(14)
    ]
    sf = _write_events(spark, tmp_path, rows)
    assert holt_winters_daily_value(spark, sf).count() == 0


def test_cramers_v_degenerate_pairs_null(spark, tmp_path):
    """Single-weekday corpus: the two weekday pairs have df=0 and NULL V."""
    import datetime as dt

    from etl_rf_matrix_controller_spark.operators.profiling import (
        cramers_v_profile,
    )

    rows = [("A", "X", dt.datetime(2024, 1, 1))] * 5 + [
        ("B", "Y", dt.datetime(2024, 1, 1))
    ] * 5
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, l_shipdate timestamp"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = {r.pair: r for r in cramers_v_profile(spark, str(tmp_path)).collect()}
    for pr in ("returnflag_shipweekday", "linestatus_shipweekday"):
        assert got[pr].df == 0 and got[pr].cramers_v is None


def test_nelson_aalen_hand_computed(spark, tmp_path):
    """3 users: conversions at dur 2 and 5, one censored at 5 -- at-risk
    3 then 2, hazard 1/3 then 1/2 ppm-floored, cumulative sums pinned."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        nelson_aalen_hazard,
    )

    d0 = dt.datetime(2024, 3, 1)
    rows = [
        (0, d0, 1, "click", 1.0, "{}"),
        (1, d0 + dt.timedelta(days=2), 1, "purchase", 1.0, "{}"),
        (2, d0, 2, "click", 1.0, "{}"),
        (3, d0 + dt.timedelta(days=5), 2, "purchase", 1.0, "{}"),
        (4, d0, 3, "click", 1.0, "{}"),
        (5, d0 + dt.timedelta(days=5), 3, "click", 1.0, "{}"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.dur_day: (r.n_at_risk, r.n_conv, r.hazard_ppm, r.cumhaz_ppm,
                    r.cumvar_ppm)
        for r in nelson_aalen_hazard(spark, sf).collect()
    }
    assert got == {
        2: (3, 1, 333333, 333333, 111111),
        5: (2, 1, 500000, 833333, 361111),
    }


def test_cohens_kappa_consistent_with_confusion(spark):
    """kappa must equal the exact integer recomputation from the declared
    confusion matrix: (n*diag - sum r_i*c_i) / (n^2 - sum r_i*c_i)."""
    from etl_rf_matrix_controller_spark.operators.text import (
        cohens_kappa_lang,
        lang_confusion_matrix,
    )

    conf = lang_confusion_matrix(spark, SF_DIR).collect()
    n = sum(r.n_docs for r in conf)
    diag = sum(r.n_docs for r in conf if r.actual_lang == r.pred_lang)
    rm, cm = {}, {}
    for r in conf:
        rm[r.actual_lang] = rm.get(r.actual_lang, 0) + r.n_docs
        cm[r.pred_lang] = cm.get(r.pred_lang, 0) + r.n_docs
    pe = sum(rm[k] * cm.get(k, 0) for k in rm)
    [k] = cohens_kappa_lang(spark, SF_DIR).collect()
    assert (k.n, k.diag, k.pe_num) == (n, diag, pe)
    assert (k.kappa_num, k.kappa_den) == (n * diag - pe, n * n - pe)
    assert k.kappa == (n * diag - pe) / (n * n - pe)


def test_als_factors_closed_form(spark, tmp_path):
    """One user, 3 clicks + 2 purchases; item factors f(click)=(2,3),
    f(purchase)=(3,5) from the rank init -- hand-solved 2x2 ridge
    system (lambda=10): det=571, x=(129/571, 185/571)."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        als_user_factors_exact,
    )

    d0 = dt.datetime(2024, 3, 1)
    rows = [(i, d0 + dt.timedelta(minutes=i), 1, "click", 1.0, "{}")
            for i in range(3)]
    rows += [(3 + i, d0 + dt.timedelta(minutes=30 + i), 1, "purchase", 1.0,
              "{}") for i in range(2)]
    sf = _write_events(spark, tmp_path, rows)
    [r] = als_user_factors_exact(spark, sf).collect()
    assert (r.n_items, r.det) == (2, 571)
    assert (r.x1_num, r.x2_num) == (129, 185)
    assert (r.x1, r.x2) == (129 / 571, 185 / 571)


def test_isotonic_pools_decreasing_prefix(spark, tmp_path):
    """10 users with 1..10 events; only the LEAST active user purchases
    -> raw decile rates [1,0,...,0], whose monotone non-decreasing fit
    pools everything to the global mean 0.1.  A monotone case (only the
    MOST active purchases) must pass through unchanged."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        isotonic_purchase_rate_fit,
    )

    def mk(purchaser):
        rows, eid = [], 0
        for uid in range(1, 11):
            for k in range(uid):
                etype = "purchase" if (uid == purchaser and k == 0) else "click"
                rows.append(
                    (eid, dt.datetime(2024, 3, 1) + dt.timedelta(minutes=eid),
                     uid, etype, 1.0, "{}")
                )
                eid += 1
        return rows

    sf = _write_events(spark, tmp_path, mk(purchaser=1))
    got = {r.decile: r for r in isotonic_purchase_rate_fit(spark, sf).collect()}
    assert got[1].raw_rate_ppm == 1_000_000
    assert all(got[k].raw_rate_ppm == 0 for k in range(2, 11))
    for k in range(1, 11):
        assert got[k].iso_rate == 0.1

    sf2 = _write_events(spark, tmp_path / "b", mk(purchaser=10))
    got2 = {r.decile: r for r in isotonic_purchase_rate_fit(spark, sf2).collect()}
    for k in range(1, 10):
        assert got2[k].iso_rate == 0.0
    assert got2[10].iso_rate == 1.0


def test_two_pass_median_matches_direct_selection(spark, tmp_path):
    """Skewed 5-value set: the histogram pass must pick the right bin
    and the in-bin rank must land on the true rank-3 value (0.30)."""
    from etl_rf_matrix_controller_spark.operators.profiling import (
        two_pass_exact_median,
    )

    vals = [0.10, 0.20, 0.30, 0.40, 10.00]
    rows = [
        (i, dt.datetime(2024, 3, 1) + dt.timedelta(minutes=i), 1, "click", v,
         "{}")
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = two_pass_exact_median(spark, sf).collect()
    assert (r.n, r.target_rank, r.median_c) == (5, 3, 30)
    assert (r.lo_c, r.hi_c) == (10, 1000)


def test_two_pass_median_degenerate_constant(spark, tmp_path):
    """All-equal values: lo == hi, single bin 0, median is that value."""
    from etl_rf_matrix_controller_spark.operators.profiling import (
        two_pass_exact_median,
    )

    rows = [
        (i, dt.datetime(2024, 3, 1) + dt.timedelta(minutes=i), 1, "click", 7.0,
         "{}")
        for i in range(4)
    ]
    sf = _write_events(spark, tmp_path, rows)
    [r] = two_pass_exact_median(spark, sf).collect()
    assert (r.bin_id, r.median_c, r.lo_c, r.hi_c) == (0, 700, 700, 700)


def test_simpson_diversity_hand_counts(spark, tmp_path):
    """'a a b' -> lambda = 2/6 ppm-floored, inverse Simpson 3.0; an
    all-singleton source -> NULLs (no repeat mass)."""
    from etl_rf_matrix_controller_spark.operators.text import (
        simpson_token_diversity,
    )

    rows = [
        (1, "a a b", "en", "s1", 5),
        (2, "x y z", "en", "s2", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {r.source: r for r in
           simpson_token_diversity(spark, str(tmp_path)).collect()}
    assert (got["s1"].n_tokens, got["s1"].vocab) == (3, 2)
    assert got["s1"].simpson_ppm == 333333
    assert got["s1"].inv_simpson == 3.0
    assert got["s2"].simpson_ppm == 0
    assert got["s2"].inv_simpson is None
