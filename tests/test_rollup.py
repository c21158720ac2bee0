"""Multi-resolution rollup: cascade ≡ direct aggregation at every grain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.functions.numeric import money_sum
from calp_cva_tracking_pipeline_spark.operators.rollup import (
    rollup_time_hierarchy,
)


def _direct(events, grain):
    return (
        events.groupBy(
            F.window("ts", grain).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum("value").alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "min_value",
            "max_value",
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("grain", ["1 hour", "1 day"])
def test_cascade_equals_direct(spark, sf_dir, grain):
    e = T(spark, sf_dir, "events")
    cascade = rollup_time_hierarchy(
        e, grains=("1 minute", "1 hour", "1 day")
    )[grain]
    assert _rows(cascade) == _rows(_direct(e, grain))


def test_finest_grain_is_the_only_fact_scan(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    daily = rollup_time_hierarchy(
        e, grains=("1 minute", "1 hour", "1 day")
    )["1 day"]
    plan = daily._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1  # facts scanned once
    assert plan.count("Exchange hashpartitioning") == 3  # one per grain


def test_non_nesting_grains_rejected(spark):
    df = None  # validation happens before any plan is built
    with pytest.raises(ValueError, match="nest"):
        rollup_time_hierarchy(df, grains=("1 minute", "90 seconds"))
    with pytest.raises(ValueError, match="nest"):
        rollup_time_hierarchy(df, grains=("1 hour", "90 minutes"))
    with pytest.raises(ValueError, match="grain"):
        rollup_time_hierarchy(df, grains=("fortnight",))


def test_rollup_incremental_equals_full_recompute(spark, sf_dir):
    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.rollup import (
        rollup_incremental,
        rollup_time_hierarchy,
    )
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "events")
    hist = e.filter(F.col("user_id") % 3 != 0)  # a different split than
    batch = e.filter(F.col("user_id") % 3 == 0)  # the catalog entry's
    store = rollup_time_hierarchy(
        hist, grains=("1 hour",), keys=("event_type",)
    )["1 hour"]
    maintained = rollup_incremental(
        store, batch, grain="1 hour", keys=("event_type",)
    )
    full = rollup_time_hierarchy(
        e, grains=("1 hour",), keys=("event_type",)
    )["1 hour"]
    m = sorted(map(tuple, maintained.collect()))
    f = sorted(map(tuple, full.collect()))
    assert m == f  # bit-identical maintenance law


def test_rollup_incremental_untouched_rows_pass_through(spark):
    from calp_cva_tracking_pipeline_spark.operators.rollup import (
        rollup_incremental,
    )
    import datetime

    store = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1), "a", 5, 10.0, 1.0, 4.0),
            (datetime.datetime(2024, 1, 2), "a", 3, 6.0, 2.0, 2.5),
        ],
        "window_start timestamp, event_type string, n_events long, "
        "total_value double, min_value double, max_value double",
    )
    batch = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 2, 7, 30), "a", 4.0)],
        "ts timestamp, event_type string, value double",
    )
    out = {
        (r["window_start"].day, r["event_type"]): (
            r["n_events"], r["total_value"], r["min_value"], r["max_value"]
        )
        for r in rollup_incremental(store, batch).collect()
    }
    assert out[(1, "a")] == (5, 10.0, 1.0, 4.0)  # untouched, unchanged
    assert out[(2, "a")] == (4, 10.0, 2.0, 4.0)  # merged day


def test_gap_fill_locf_semantics(spark):
    import datetime

    from calp_cva_tracking_pipeline_spark.operators.rollup import (
        gap_fill_locf,
    )

    t0 = datetime.datetime(2024, 1, 1)
    series = spark.createDataFrame(
        [
            ("a", t0, 5, 1.0),
            ("a", t0 + datetime.timedelta(hours=3), 7, 2.0),
            ("b", t0 + datetime.timedelta(hours=1), 9, 3.0),
        ],
        "k string, window_start timestamp, n long, v double",
    )
    out = gap_fill_locf(
        series, keys=("k",), ts_col="window_start",
        value_cols=("n", "v"), grain="1 hour",
    ).collect()
    rows = {
        (r["k"], r["window_start"].hour): (r["filled"], r["n"], r["v"])
        for r in out
    }
    # key a: dense 0..3, gaps 1-2 carry hour-0's values
    assert rows[("a", 0)] == (False, 5, 1.0)
    assert rows[("a", 1)] == (True, 5, 1.0)
    assert rows[("a", 2)] == (True, 5, 1.0)
    assert rows[("a", 3)] == (False, 7, 2.0)
    # key b: a single observation spans no gaps — exactly one row
    assert rows[("b", 1)] == (False, 9, 3.0)
    assert len(out) == 5
