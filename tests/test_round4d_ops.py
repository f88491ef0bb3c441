"""Round-4 (cont. 3) operator edge semantics: the clamped-balance fold,
weekly ACF, Spearman/Welch/Mann-Kendall statistics vs plain-Python
references on crafted inputs, Pareto share, blocked fuzzy linkage, BFS
depths on a crafted trade graph, and a perfectly-calibrated ECE corpus.
"""

from __future__ import annotations

import datetime as dt

from tests.test_round4_ops import _write_events


def _ev(eid, day, value, etype="click", uid=1, minute=None):
    ts = dt.datetime(2024, 1, 1) + dt.timedelta(
        days=day, minutes=(eid % 60) if minute is None else minute
    )
    return (eid, ts, uid, etype, float(value), "{}")


# ---------------------------------------------------------------- clamped fold


def _ref_clamped(deltas):
    bal, clamps = 0, 0
    for d in deltas:
        if bal + d < 0:
            bal, clamps = 0, clamps + 1
        else:
            bal += d
    return bal, clamps


def test_clamped_balance_matches_reference_fold(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.behavior import (
        clamped_running_balance,
    )

    # user 1: credit 10, debit 25 (clamp), credit 7, debit 3 -> 4.0
    # user 2: debit first (clamp at step 1), then credit 5 -> 5.0
    rows = [
        _ev(1, 0, 10.0, "purchase", uid=1),
        _ev(2, 1, 25.0, "error", uid=1),
        _ev(3, 2, 7.0, "purchase", uid=1),
        _ev(4, 3, 3.0, "error", uid=1),
        _ev(5, 0, 2.0, "error", uid=2),
        _ev(6, 1, 5.0, "purchase", uid=2),
        _ev(7, 0, 99.0, "view", uid=1),  # ignored type
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in clamped_running_balance(spark, sf).collect()}
    scale = 10000
    ref1 = _ref_clamped([100000, -250000, 70000, -30000])
    ref2 = _ref_clamped([-20000, 50000])
    assert (got[1].balance_s, got[1].n_clamps) == ref1
    assert (got[2].balance_s, got[2].n_clamps) == ref2
    assert got[1].balance == ref1[0] / scale == 4.0
    assert got[2].balance == 5.0


def test_clamped_balance_order_is_ts_then_event_id(spark, tmp_path):
    """Two same-timestamp deltas: event_id breaks the tie.  debit-then-
    credit clamps; credit-then-debit would not."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        clamped_running_balance,
    )

    rows = [
        _ev(1, 0, 5.0, "error", uid=1, minute=0),
        _ev(2, 0, 5.0, "purchase", uid=1, minute=0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = clamped_running_balance(spark, sf).collect()[0]
    assert (got.balance_s, got.n_clamps) == (50000, 1)


# ---------------------------------------------------------------------- ACF


def test_acf_matches_integer_reference(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.behavior import acf_daily_lags

    daily = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
    rows = [_ev(i, i, v) for i, v in enumerate(daily)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.lag: r for r in acf_daily_lags(spark, sf).collect()}
    xs = [round(v * 10000) for v in daily]
    n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
    for k in range(1, 8):
        pairs = list(zip(xs, xs[k:]))
        cnt = len(pairs)
        sab = sum(a * b for a, b in pairs)
        sa = sum(a for a, _ in pairs)
        sb = sum(b for _, b in pairs)
        num = n * n * sab - n * s * (sa + sb) + cnt * s * s
        den = n * n * q - n * s * s
        assert got[k].n_pairs == cnt
        assert got[k].acf == float(num) / float(den)


# ------------------------------------------------------------------ Spearman


def _doubled_midranks(values):
    """value -> doubled average rank (2*cum_less + ct + 1)."""
    from collections import Counter

    ct = Counter(values)
    out, cum = {}, 0
    for v in sorted(ct):
        out[v] = 2 * cum + ct[v] + 1
        cum += ct[v]
    return out


def test_spearman_reference_and_tie_handling(spark, tmp_path):
    """Crafted lineitem: y is a noisy monotone function of x with heavy
    ties; rho must equal the doubled-midrank Pearson exactly."""
    import math

    from etl_rf_matrix_controller_spark.operators.profiling import (
        spearman_quantity_price,
    )

    qty = [1, 1, 2, 2, 2, 3, 4, 5, 5, 6]
    price = [10.0, 11.0, 10.0, 13.0, 14.0, 15.0, 15.0, 15.0, 18.0, 20.0]
    rows = [
        (i, i, 1, 1, float(q), p, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1))
        for i, (q, p) in enumerate(zip(qty, price))
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    got = spearman_quantity_price(spark, str(tmp_path)).collect()[0]
    qx = [round(q * 100) for q in qty]
    px = [round(p * 100) for p in price]
    mrq, mrp = _doubled_midranks(qx), _doubled_midranks(px)
    rx = [mrq[v] for v in qx]
    ry = [mrp[v] for v in px]
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(a * a for a in rx)
    syy = sum(a * a for a in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    rho = float(n * sxy - sx * sy) / (
        math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    )
    assert got.n == n
    assert got.rho == rho
    assert 0.8 < got.rho < 1.0  # monotone-with-noise, not perfect


# ------------------------------------------------------------- Welch / MW-U


def test_welch_t_separated_samples_significant(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.pipeline import (
        welch_t_value_test,
    )

    rows = [_ev(i, i % 5, 100.0 + (i % 3), "purchase", uid=i) for i in range(30)]
    rows += [_ev(100 + i, i % 5, 1.0 + (i % 7), "click", uid=i) for i in range(40)]
    sf = _write_events(spark, tmp_path, rows)
    got = welch_t_value_test(spark, sf).collect()[0]
    assert (got.n1, got.n2) == (30, 40)
    assert got.significant and got.t_stat > 10
    # Welch df is bounded by n1+n2-2 and at least min(n1,n2)-1.
    assert 29 <= got.df_welch <= 68


def test_mann_whitney_identical_distributions_not_significant(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.pipeline import (
        mann_whitney_value_test,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 5.0] * 8
    rows = [
        _ev(i, i % 5, v, "purchase" if i % 2 else "click", uid=i)
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = mann_whitney_value_test(spark, sf).collect()[0]
    assert not got.significant
    # With identical value multisets, U1 is close to its null mean
    # n1*n2/2: doubled U within one rank unit of n1*n2.
    assert abs(got.u1_x2 - got.n1 * got.n2) <= 2 * max(got.n1, got.n2)


def test_mann_kendall_monotone_series_hits_max_s(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.behavior import (
        mann_kendall_trend,
    )

    rows = [_ev(i, i, 10.0 + i) for i in range(12)]
    sf = _write_events(spark, tmp_path, rows)
    got = mann_kendall_trend(spark, sf).collect()[0]
    n = 12
    assert got.s == n * (n - 1) // 2  # strictly increasing: every pair +1
    assert got.var18 == n * (n - 1) * (2 * n + 5)  # no ties
    assert got.significant and got.z > 0


# ------------------------------------------------------------------- Pareto


def test_pareto_share_hand_computed(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.behavior import (
        pareto_revenue_share,
    )

    revs = {1: 50.0, 2: 20.0, 3: 15.0, 4: 10.0, 5: 5.0}
    rows = [
        (k, k, "O", v, dt.datetime(2024, 1, 1), "1-URGENT")
        for k, v in revs.items()
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    got = pareto_revenue_share(spark, str(tmp_path)).collect()[0]
    # cum shares: 50, 70, 85 -> first crossing of 80% at 3 customers.
    assert (got.n_customers, got.n_top80, got.top80_ppm) == (5, 3, 600000)


# ------------------------------------------------------------- fuzzy linkage


def test_fuzzy_linkage_resolves_typos_within_blocks_only(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.dedup import (
        fuzzy_levenshtein_join,
    )

    names = ["alpha one", "alpha two", "xlpha one", "beta gear"]
    rows = [
        (i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)
    ]
    spark.createDataFrame(
        rows,
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    got = {r.src: r for r in fuzzy_levenshtein_join(spark, str(tmp_path)).collect()}
    # every probe resolves to its own source (distance 1, correct=True)
    for n in names:
        assert got[n].best_match == n and got[n].dist == 1 and got[n].correct
    # block soundness: "xlpha one" (distance 1 from "alpha one") is in
    # block 'xlp', so it is never a candidate for the 'alp' probes.
    assert got["alpha one"].best_match != "xlpha one"


# ----------------------------------------------------------------- BFS depth


def test_bfs_depths_on_crafted_top2_graph(spark, tmp_path):
    """Edges by weight: 0->1 (5), 0->2 (4), 0->3 (1, pruned by top-2),
    1->3 (3), 2->3 (2), 3->4 (1).  Depths: 1,2 at hop 1; 3 at hop 2
    (via 1 or 2, NOT the pruned direct edge); 4 at hop 3."""
    from etl_rf_matrix_controller_spark.operators.graph import (
        trade_graph_bfs_depths,
    )

    weights = {(0, 1): 5, (0, 2): 4, (0, 3): 1, (1, 3): 3, (2, 3): 2, (3, 4): 1}
    supp = [(10 + u, f"S{u}", u, 0.0) for u in range(5)]
    cust = [(20 + v, f"C{v}", v, 0.0, "SEG") for v in range(5)]
    nat = [(k, f"N{k}", 0) for k in range(5)]
    orders, lines = [], []
    for i, ((u, v), w) in enumerate(sorted(weights.items())):
        ok = 100 + i
        orders.append((ok, 20 + v, "O", 1.0, dt.datetime(2024, 1, 1), "P"))
        for j in range(w):
            lines.append((ok, 1, 10 + u, j, 1.0, 1.0, 0.0, 0.0, "N", "O",
                          dt.datetime(2024, 1, 1)))
    spark.createDataFrame(
        supp, "s_suppkey bigint, s_name string, s_nationkey bigint,"
        " s_acctbal double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    spark.createDataFrame(
        cust, "c_custkey bigint, c_name string, c_nationkey bigint,"
        " c_acctbal double, c_mktsegment string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        nat, "n_nationkey bigint, n_name string, n_regionkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    got = {r.nation: r.depth for r in trade_graph_bfs_depths(spark, str(tmp_path)).collect()}
    assert got == {"N0": 0, "N1": 1, "N2": 1, "N3": 2, "N4": 3}


# ------------------------------------------------------------------ ECE


def test_calibration_perfect_corpus_zero_ece(spark, tmp_path):
    """en docs emit only en marker tokens, fr docs only fr markers ->
    confidences land in bins 9 and 0, each perfectly accurate, ECE 0."""
    from etl_rf_matrix_controller_spark.operators.text import (
        lang_score_calibration,
    )

    docs = []
    for i in range(6):
        docs.append((i, "the of and to in", "en", "web", 16))
    for i in range(4):
        docs.append((10 + i, "le la et de un", "fr", "web", 14))
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.bin: r for r in lang_score_calibration(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 9}
    assert out[9].n_docs == 6 and out[9].conf_ppm == 1000000
    assert out[9].acc_ppm == 1000000 and out[9].gap_ppm == 0
    assert out[0].n_docs == 4 and out[0].conf_ppm == 0 and out[0].acc_ppm == 0
    assert out[0].ece_ppm == 0 and out[9].ece_ppm == 0
