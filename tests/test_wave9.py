"""Ninth-wave operators: session path mining, first-occurrence n-gram
novelty, chi-square independence audit, cluster survivor selection."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.dedup import (
    cluster_representatives,
)
from calp_cva_tracking_pipeline_spark.operators.funnel import session_paths
from calp_cva_tracking_pipeline_spark.operators.profiling import (
    chi2_independence,
)
from calp_cva_tracking_pipeline_spark.operators.textops import ngram_novelty

T0 = dt.datetime(2024, 1, 1, 8, 0)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# session_paths
# ---------------------------------------------------------------------------


def _ev(user, minutes, etype, eid):
    return (user, T0 + dt.timedelta(minutes=minutes), etype, eid)


def test_session_paths_hand_computed(spark):
    rows = [
        # user 1 day 1: view>click>purchase (twice as path across users)
        _ev(1, 0, "view", 1), _ev(1, 5, "click", 2), _ev(1, 9, "purchase", 3),
        _ev(2, 0, "view", 4), _ev(2, 5, "click", 5), _ev(2, 9, "purchase", 6),
        # user 1 day 2: view only
        (1, T0 + dt.timedelta(days=1), "view", 7),
        # user 3 day 1: click
        _ev(3, 30, "click", 8),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, event_id bigint"
    )
    out = session_paths(
        df, "user_id", "ts", "event_type", "event_id", top_k=10
    ).collect()
    got = [(r.path, r.n_sessions) for r in out]
    assert got == [
        ("view>click>purchase", 2),
        ("click", 1),
        ("view", 1),
    ]


def test_session_paths_caps_runaway_session_and_pushes_limit(spark):
    rows = [_ev(9, i, f"e{i:02d}", i) for i in range(50)]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, event_id bigint"
    )
    out = session_paths(
        df, "user_id", "ts", "event_type", "event_id", max_len=8, top_k=5
    )
    rowsc = out.collect()
    assert len(rowsc) == 1
    # first 8 events only, in time order
    assert rowsc[0].path == ">".join(f"e{i:02d}" for i in range(8))
    # the cap executes as WindowGroupLimit (per-partition top-N pushdown)
    assert "WindowGroupLimit" in _executed(out)


def test_session_paths_tie_break_and_layout_independent(spark):
    rows = [
        _ev(1, 0, "b", 1), _ev(2, 0, "a", 2), _ev(3, 0, "c", 3),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string, event_id bigint"
    )
    out = session_paths(
        df, "user_id", "ts", "event_type", "event_id", top_k=2
    ).collect()
    # counts all tie at 1 → path asc decides the cut
    assert [(r.path, r.n_sessions) for r in out] == [("a", 1), ("b", 1)]
    out2 = session_paths(
        df.repartition(5), "user_id", "ts", "event_type", "event_id", top_k=2
    ).collect()
    assert [(r.path, r.n_sessions) for r in out2] == [("a", 1), ("b", 1)]


# ---------------------------------------------------------------------------
# ngram_novelty
# ---------------------------------------------------------------------------


def test_ngram_novelty_hand_computed(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d"),        # shingles: abc, bcd
            Row(doc_id=2, text="a b c e"),        # abc (seen), bce (new)
            Row(doc_id=3, text="x y z"),          # xyz (new)
            Row(doc_id=4, text="a b c d"),        # abc, bcd both seen
        ]
    )
    out = {
        r.doc_id: (r.n_shingles, r.n_novel, r.novel_frac)
        for r in ngram_novelty(df, "doc_id", "text", k=3).collect()
    }
    assert out == {
        1: (2, 2, 1.0),
        2: (2, 1, 0.5),
        3: (1, 1, 1.0),
        4: (2, 0, 0.0),
    }


def test_ngram_novelty_layout_independent(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i % 3} w{(i + 1) % 3} common tail words")
         for i in range(30)]
    )
    a = {r.doc_id: r.novel_frac for r in ngram_novelty(df, "doc_id").collect()}
    b = {
        r.doc_id: r.novel_frac
        for r in ngram_novelty(df.repartition(7), "doc_id").collect()
    }
    assert a == b
    # the doc holding the global min id is fully novel by construction
    assert a[0] == 1.0


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------


def test_chi2_hand_computed_2x2(spark):
    # contingency [[20, 10], [10, 20]]: N=60, margins 30 each,
    # chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) = 60*(400-100)^2/30^4 = 6.666667
    rows = (
        [("x", "u")] * 20 + [("x", "v")] * 10
        + [("y", "u")] * 10 + [("y", "v")] * 20
    )
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi2_independence(df, "a", "b").collect()[0]
    assert (out.n, out.dof) == (60, 1)
    assert abs(out.chi2 - 6.666667) < 1e-6


def test_chi2_independent_columns_score_zero(spark):
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi2_independence(df, "a", "b").collect()[0]
    assert out.chi2 == 0.0 and out.n == 100 and out.dof == 1


def test_chi2_null_category_is_a_real_class(spark):
    rows = [("x", "u")] * 5 + [("x", None)] * 5 + [("y", "u")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    out = chi2_independence(df, "a", "b").collect()[0]
    # b has classes {u, NULL} → dof = (2-1)*(2-1) = 1, not 0
    assert out.dof == 1 and out.n == 15


# ---------------------------------------------------------------------------
# cluster_representatives
# ---------------------------------------------------------------------------


def test_cluster_pick_keeps_best_quality_then_min_id(spark):
    comp = spark.createDataFrame(
        [
            Row(node=1, component=1), Row(node=2, component=1),
            Row(node=3, component=1),
            Row(node=7, component=7), Row(node=9, component=7),
        ]
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, n_chars=100), Row(doc_id=2, n_chars=300),
            Row(doc_id=3, n_chars=300),   # quality tie with 2 → id asc
            Row(doc_id=7, n_chars=50), Row(doc_id=9, n_chars=60),
        ]
    )
    out = {
        r.node: (r.rep_id, r.keep)
        for r in cluster_representatives(
            comp, docs, "doc_id", "n_chars"
        ).collect()
    }
    assert out == {
        1: (2, False), 2: (2, True), 3: (2, False),
        7: (9, False), 9: (9, True),
    }


def test_cluster_pick_layout_independent(spark):
    comp = spark.createDataFrame(
        [Row(node=i, component=i % 4) for i in range(40)]
    )
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=(i * 7) % 11) for i in range(40)]
    )
    a = {
        r.node: r.rep_id
        for r in cluster_representatives(comp, docs, "doc_id", "n_chars").collect()
    }
    b = {
        r.node: r.rep_id
        for r in cluster_representatives(
            comp.repartition(9), docs.repartition(3), "doc_id", "n_chars"
        ).collect()
    }
    assert a == b
    # exactly one keeper per component
    keeps = {}
    for node, rep in a.items():
        keeps.setdefault(rep, 0)
    assert len(keeps) == 4
