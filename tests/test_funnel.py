"""Funnel / cohort-retention semantics the oracle hash can't pin alone:
strict ordering, null-prefix monotonicity, cohort-relative weeks, and
partition-independence."""

from __future__ import annotations

import datetime as dt

from calp_cva_tracking_pipeline_spark.operators.funnel import (
    cohort_retention,
    funnel_steps,
)

_SCHEMA = "user_id bigint, ts timestamp, event_type string"
_D = dt.datetime


def _events(spark):
    rows = [
        # user 1: clean view -> click -> purchase
        (1, _D(2024, 1, 1, 10), "view"),
        (1, _D(2024, 1, 1, 11), "click"),
        (1, _D(2024, 1, 1, 12), "purchase"),
        # user 2: purchase BEFORE any view — ordered funnel stops at view
        (2, _D(2024, 1, 1, 9), "purchase"),
        (2, _D(2024, 1, 1, 10), "view"),
        # user 3: click and view SIMULTANEOUS — strict '>' rejects the click
        (3, _D(2024, 1, 2, 8), "view"),
        (3, _D(2024, 1, 2, 8), "click"),
        # user 4: never viewed; later steps must stay null too
        (4, _D(2024, 1, 3, 9), "click"),
        (4, _D(2024, 1, 3, 10), "purchase"),
        # user 5: multiple candidates — earliest valid one wins each step
        (5, _D(2024, 1, 4, 8), "view"),
        (5, _D(2024, 1, 4, 9), "click"),
        (5, _D(2024, 1, 4, 7), "click"),   # before the view: invalid
        (5, _D(2024, 1, 4, 10), "click"),  # later than the 9:00 click
        (5, _D(2024, 1, 4, 11), "purchase"),
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_funnel_ordered_semantics(spark):
    out = funnel_steps(
        _events(spark), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.steps_completed)
        for r in out.collect()
    }
    assert got[1] == (
        _D(2024, 1, 1, 10), _D(2024, 1, 1, 11), _D(2024, 1, 1, 12), 3
    )
    assert got[2] == (_D(2024, 1, 1, 10), None, None, 1)
    assert got[3] == (_D(2024, 1, 2, 8), None, None, 1)
    assert got[4] == (None, None, None, 0)
    assert got[5] == (
        _D(2024, 1, 4, 8), _D(2024, 1, 4, 9), _D(2024, 1, 4, 11), 3
    )
    # one row per observed user, no fabricated users
    assert set(got) == {1, 2, 3, 4, 5}


def test_funnel_null_prefix_is_monotone(spark, sf_dir):
    """On real data: a null step implies every later step is null, and
    steps_completed equals the non-null prefix length."""
    from calp_cva_tracking_pipeline_spark.catalog.common import T

    out = funnel_steps(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        ["view", "click", "purchase"],
    )
    bad = out.filter(
        "(t_view IS NULL AND (t_click IS NOT NULL OR t_purchase IS NOT NULL))"
        " OR (t_click IS NULL AND t_purchase IS NOT NULL)"
        " OR steps_completed <> (CAST(t_view IS NOT NULL AS INT)"
        " + CAST(t_click IS NOT NULL AS INT)"
        " + CAST(t_purchase IS NOT NULL AS INT))"
        " OR t_click <= t_view OR t_purchase <= t_click"
    )
    assert bad.count() == 0


def test_funnel_partition_independent(spark):
    a = funnel_steps(
        _events(spark), "user_id", "ts", "event_type", ["view", "click"]
    )
    b = funnel_steps(
        _events(spark).repartition(7), "user_id", "ts", "event_type",
        ["view", "click"],
    )
    assert sorted(map(tuple, a.collect()), key=repr) == sorted(
        map(tuple, b.collect()), key=repr
    )


def test_cohort_retention_relative_weeks(spark):
    rows = [
        (1, _D(2024, 1, 1, 12), "x"),   # cohort 2024-01-01, week 0
        (1, _D(2024, 1, 8, 11), "x"),   # 6d23h later -> still week 0
        (1, _D(2024, 1, 8, 13), "x"),   # 7d1h later -> week 1
        (2, _D(2024, 1, 1, 12), "x"),   # same cohort day as user 1
        (2, _D(2024, 1, 20, 12), "x"),  # week 2
        (3, _D(2024, 1, 2, 0), "x"),    # its own cohort day
    ]
    out = cohort_retention(
        spark.createDataFrame(rows, _SCHEMA), "user_id", "ts"
    )
    got = {
        (r.cohort_day.isoformat(), r.week_offset): r.n_users
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # users 1 and 2 active in their week 0
        ("2024-01-01", 1): 1,  # user 1 only
        ("2024-01-01", 2): 1,  # user 2 only
        ("2024-01-02", 0): 1,
    }


def test_cohort_retention_week0_counts_every_user(spark, sf_dir):
    """Every user is by construction active in their own week 0, so the
    week-0 column sums to the distinct-user count, and no cell can
    exceed its cohort's week-0 size."""
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T

    ev = T(spark, sf_dir, "events")
    out = cohort_retention(ev, "user_id", "ts").cache()
    w0 = (
        out.filter("week_offset = 0")
        .agg(F.sum("n_users").alias("s"))
        .first()
        .s
    )
    assert w0 == ev.select("user_id").distinct().count()
    caps = out.filter("week_offset = 0").select(
        F.col("cohort_day").alias("cd"), F.col("n_users").alias("cap")
    )
    over = out.join(caps, out.cohort_day == caps.cd).filter(
        F.col("n_users") > F.col("cap")
    )
    assert over.count() == 0
    out.unpersist()


def test_transition_matrix_semantics(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        transition_matrix,
    )

    rows = [
        (1, _D(2024, 1, 1, 1), "a"),
        (1, _D(2024, 1, 1, 2), "b"),
        (1, _D(2024, 1, 1, 3), "a"),
        (2, _D(2024, 1, 2, 1), "a"),
        (2, _D(2024, 1, 2, 2), "b"),
        (3, _D(2024, 1, 3, 1), "c"),  # lone event: no transition
    ]
    out = transition_matrix(
        spark.createDataFrame(rows, _SCHEMA), "user_id", "ts", "event_type"
    )
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob)
        for r in out.collect()
    }
    # a->b twice, b->a once; user boundaries never produce transitions
    assert got == {
        ("a", "b"): (2, 1.0),
        ("b", "a"): (1, 1.0),
    }


def test_transition_matrix_rows_normalize_to_one(spark, sf_dir):
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        transition_matrix,
    )

    out = transition_matrix(
        T(spark, sf_dir, "events"), "user_id", "ts", "event_type",
        tiebreak_cols=["event_id"],
    )
    sums = (
        out.groupBy("from_type")
        .agg(F.round(F.sum("prob"), 3).alias("s"))
        .collect()
    )
    assert sums and all(abs(r.s - 1.0) < 0.005 for r in sums)
