"""Round-4 (cont. 2) operator edge semantics: Theil-Sen vs a plain-Python
median-of-slopes reference on crafted daily series, and the SRM chi-square
algebra against an independent md5-bucket reference.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from tests.test_round4_ops import _write_events


def _ev(eid, day, value, uid=1):
    ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=day, minutes=eid % 60)
    return (eid, ts, uid, "click", float(value), "{}")


def _ref_theil_sen(daily: dict[int, float]):
    """Median of pairwise slopes, lower-middle discrete median."""
    days = sorted(daily)
    slopes = []
    for i, a in enumerate(days):
        for b in days[i + 1 :]:
            slopes.append((daily[b] - daily[a]) / (b - a))
    slopes.sort()
    return slopes[(len(slopes) + 1) // 2 - 1], len(slopes)


def test_theil_sen_matches_reference_and_resists_outlier(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.behavior import (
        theil_sen_daily_trend,
    )

    # 7 days of clean slope-2 trend plus one wild outlier day.
    daily = {d: 10.0 + 2.0 * d for d in range(7)}
    daily[3] = 9999.0
    rows = [_ev(i, d, v) for i, (d, v) in enumerate(sorted(daily.items()))]
    sf = _write_events(spark, tmp_path, rows)
    got = theil_sen_daily_trend(spark, sf).collect()[0]
    ref_slope, ref_pairs = _ref_theil_sen(daily)
    assert got.n_days == 7
    assert got.n_pairs == ref_pairs == 21
    assert got.sen_slope == ref_slope
    # Robustness: the OLS slope would be dragged far from 2 by the
    # outlier; the Sen slope stays at the clean pairwise median.
    assert abs(got.sen_slope - 2.0) < 1.0


def test_theil_sen_two_days_single_pair(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.behavior import (
        theil_sen_daily_trend,
    )

    rows = [_ev(0, 0, 1.0), _ev(1, 2, 7.0)]  # one pair, gap 2 days
    sf = _write_events(spark, tmp_path, rows)
    got = theil_sen_daily_trend(spark, sf).collect()[0]
    assert got.n_pairs == 1
    assert got.sen_slope == 3.0


def _md5_bucket(uid: int, buckets: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % buckets


def test_srm_chi2_algebra(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.pipeline import srm_check

    # 40 distinct users, one event each (plus a dup event for user 0 --
    # distinct-users must dedup it).
    rows = [_ev(i, i % 5, 1.0, uid=i) for i in range(40)]
    rows.append(_ev(99, 6, 1.0, uid=0))
    sf = _write_events(spark, tmp_path, rows)
    got = srm_check(spark, sf).collect()[0]
    n_a = sum(1 for u in range(40) if _md5_bucket(u, 2) == 0)
    n_b = 40 - n_a
    assert (got.n_users, got.n_a, got.n_b) == (40, n_a, n_b)
    assert got.delta == n_a - n_b
    assert got.chi2 == (n_a - n_b) ** 2 / 40
    assert got.srm_flag == (got.chi2 > 3.841)


def _write_orders(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def test_nearest_event_join_tie_rules(spark, tmp_path):
    from etl_rf_matrix_controller_spark.operators.state import nearest_event_join

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ev_at(eid, uid, secs):
        return (eid, t0 + dt.timedelta(seconds=secs), uid, "click", 1.0, "{}")

    events = [
        # user 1: events 10s before and 10s after the probe -> equal gap,
        # earlier (backward) event must win.
        ev_at(1, 1, -10),
        ev_at(2, 1, +10),
        # user 2: two events at the exact probe ts -> gap 0, smaller id.
        ev_at(10, 2, 0),
        ev_at(9, 2, 0),
        # user 3: only a forward event.
        ev_at(20, 3, +3600),
        # user 4: two forward events at the same ts -> smaller id wins.
        ev_at(31, 4, +5),
        ev_at(30, 4, +5),
        # user 5: strictly nearer forward event beats farther backward.
        ev_at(40, 5, -100),
        ev_at(41, 5, +99),
    ]
    orders = [(100 + u, u, "O", 1.0, t0, "1-URGENT") for u in (1, 2, 3, 4, 5)]
    orders.append((999, 42, "O", 1.0, t0, "1-URGENT"))  # user with no events
    sf = _write_events(spark, tmp_path, events)
    _write_orders(spark, tmp_path, orders)
    got = {
        r.o_orderkey: (r.nearest_event_id, r.gap_s)
        for r in nearest_event_join(spark, sf).collect()
    }
    assert got == {
        101: (1, 10),   # backward wins the equal-gap tie
        102: (9, 0),    # exact-ts tie -> min event_id
        103: (20, 3600),
        104: (30, 5),   # forward same-ts tie -> min event_id
        105: (41, 99),  # strictly nearer forward
    }


def test_kaplan_meier_hand_example(spark, tmp_path):
    """Textbook KM: N=4; day1 sees 1 conversion + 1 censor (at-risk 4),
    day2 1 conversion (at-risk 2), day3 a censor only (no curve row).
    S(1)=3/4, S(2)=3/4 * 1/2."""
    from etl_rf_matrix_controller_spark.operators.behavior import (
        kaplan_meier_conversion,
    )

    day = 86400

    def ev(eid, uid, secs, etype):
        return (
            eid,
            dt.datetime(2024, 2, 1) + dt.timedelta(seconds=secs),
            uid,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 1, 0, "click"), ev(2, 1, day, "purchase"),
        ev(3, 2, 0, "click"), ev(4, 2, day, "click"),
        ev(5, 3, 0, "click"), ev(6, 3, 2 * day, "purchase"),
        ev(7, 4, 0, "click"), ev(8, 4, 3 * day, "view"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.dur_day: (r.n_at_risk, r.n_conv, r.hazard_ppm, r.survival)
        for r in kaplan_meier_conversion(spark, sf).collect()
    }
    assert got == {
        1: (4, 1, 250000, 0.75),
        2: (2, 1, 500000, 0.75 * 0.5),
    }


def test_kcore_matches_python_peel_and_fixpoint(spark):
    """The fixed 6-round unrolled peel equals a run-to-fixpoint Python
    peel on the real sf0.001 trade graph (so the unroll depth is an
    upper bound, not a semantic knob)."""
    from tests.conftest import SF_DIR
    from etl_rf_matrix_controller_spark.operators.graph import (
        KCORE_K,
        _trade_edges,
        kcore_membership,
    )

    raw = _trade_edges(spark, SF_DIR).collect()
    edges = {
        (min(r.u, r.v), max(r.u, r.v)) for r in raw if r.u != r.v
    }
    nodes = {x for e in edges for x in e}
    cur = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {x for x, c in deg.items() if c >= KCORE_K}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    fdeg: dict[int, int] = {}
    for a, b in cur:
        fdeg[a] = fdeg.get(a, 0) + 1
        fdeg[b] = fdeg.get(b, 0) + 1
    got = {
        r.node: (r.core_degree, r[f"in_{KCORE_K}core"])
        for r in kcore_membership(spark, SF_DIR).collect()
    }
    want = {x: (fdeg.get(x, 0), fdeg.get(x, 0) >= KCORE_K) for x in nodes}
    assert got == want
    assert any(f for _, f in got.values())  # non-vacuous core
