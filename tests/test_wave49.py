"""Round-12 wave-49 operator pins: sequence-gap audit, growth
accounting, activity heatmap, out-of-order audit — hand-built inputs
with independently derived values, plus plan shapes."""

from __future__ import annotations

import datetime as dt


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sequence_gaps_hand_ids(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        sequence_gap_audit,
    )

    # observed: 1,2,5,6,12,12(dup),40 -> gaps [3,4], [7,11], [13,39]
    df = spark.createDataFrame(
        [(i,) for i in (1, 2, 5, 6, 12, 12, 40)], "event_id long"
    )
    out = [
        (r.gap_start, r.gap_end, r.n_missing)
        for r in sequence_gap_audit(df, "event_id").collect()
    ]
    assert out == [(3, 4, 2), (7, 11, 5), (13, 39, 27)]


def test_sequence_gaps_bucketed_equals_global(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        sequence_gap_audit,
    )

    # ids straddling bucket boundaries (bucket_size=10): the cross-
    # bucket gap 18..31 must surface once, exactly, incl. an EMPTY
    # bucket (20-29) in between
    ids = [3, 9, 10, 17, 32, 35]
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    small = sequence_gap_audit(df, "event_id", bucket_size=10).collect()
    big = sequence_gap_audit(
        df, "event_id", bucket_size=1_000_000
    ).collect()
    key = lambda r: (r.gap_start, r.gap_end, r.n_missing)  # noqa: E731
    assert sorted(map(key, small)) == sorted(map(key, big))
    assert (18, 31, 14) in set(map(key, small))


def test_sequence_gaps_min_missing_filter(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        sequence_gap_audit,
    )

    df = spark.createDataFrame(
        [(i,) for i in (1, 3, 10)], "event_id long"
    )
    out = sequence_gap_audit(df, "event_id", min_missing=3).collect()
    assert [(r.gap_start, r.gap_end) for r in out] == [(4, 9)]


def test_growth_accounting_hand_days(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        growth_accounting,
    )

    d = lambda day: dt.datetime(2024, 1, day, 12)  # noqa: E731
    rows = [
        # u1: days 1,2,4  (new d1, retained d2, churn@d3, resurrected
        # d4, churn@d5)
        ("u1", d(1)), ("u1", d(2)), ("u1", d(4)),
        # u2: day 2 only (new d2, churn@d3)
        ("u2", d(2)),
        # duplicate same-day rows collapse
        ("u1", d(1)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {str(r.day): r for r in growth_accounting(df).collect()}
    a = out["2024-01-01"]
    assert (a.n_active, a.n_new, a.n_retained, a.n_resurrected,
            a.n_churned) == (1, 1, 0, 0, 0)
    b = out["2024-01-02"]
    assert (b.n_active, b.n_new, b.n_retained, b.n_resurrected,
            b.n_churned) == (2, 1, 1, 0, 0)
    c = out["2024-01-03"]  # churn-only day: u2 left for good AND u1
    # went silent (to resurrect on d4 — a resurrection implies an
    # earlier churn; the ledger counts both movements)
    assert (c.n_active, c.n_churned) == (0, 2)
    e = out["2024-01-04"]
    assert (e.n_active, e.n_new, e.n_retained, e.n_resurrected) == (
        1, 0, 0, 1,
    )
    f = out["2024-01-05"]  # horizon churn: u1's last day was d4
    assert (f.n_active, f.n_churned) == (0, 1)
    # identity holds on every row
    for r in out.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_activity_profile_hand_events(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        activity_profile,
    )

    rows = [
        # 2024-01-01 was a Monday -> dow 1 (0=Sunday)
        (1, dt.datetime(2024, 1, 1, 9, 30), "u1"),
        (2, dt.datetime(2024, 1, 1, 9, 45), "u1"),
        (3, dt.datetime(2024, 1, 1, 9, 50), "u2"),
        # Sunday 2024-01-07 -> dow 0
        (4, dt.datetime(2024, 1, 7, 23, 5), "u1"),
        (5, None, "u9"),  # dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string"
    )
    out = {
        (r.dow, r.hour): r for r in activity_profile(df).collect()
    }
    assert set(out) == {(1, 9), (0, 23)}
    m = out[(1, 9)]
    assert (m.n_events, m.n_users, m.share_ppm) == (3, 2, 750_000)
    s = out[(0, 23)]
    assert (s.n_events, s.n_users, s.share_ppm) == (1, 1, 250_000)


def test_out_of_order_audit_hand_sequence(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        out_of_order_audit,
    )

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)  # noqa: E731
    rows = [
        # key a by seq: ts 0, 10, 7 (regress 3s), 20 -> 3 pairs,
        # 1 inversion, max regression 3
        ("a", 1, s(0)), ("a", 2, s(10)), ("a", 3, s(7)), ("a", 4, s(20)),
        # key b perfectly ordered
        ("b", 1, s(0)), ("b", 2, s(5)),
        ("b", 3, None),  # dropped
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp"
    )
    out = {
        r.event_type: r
        for r in out_of_order_audit(
            df, "event_type", "event_id", "ts"
        ).collect()
    }
    a = out["a"]
    assert (a.n_pairs, a.n_inversions, a.max_regression_s) == (3, 1, 3)
    assert a.inversion_ppm == 333_333
    b = out["b"]
    assert (b.n_pairs, b.n_inversions, b.inversion_ppm,
            b.max_regression_s) == (1, 0, 0, 0)


def test_wave49_plans_stay_jvm_side(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    for fn in (
        S.pf_id_gaps,
        S.ev_growth_accounting,
        S.ev_activity_profile,
        S.ev_ooo_audit,
    ):
        plan = _executed(fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, fn.__name__
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "ArrowEvalPython" not in plan, fn.__name__
