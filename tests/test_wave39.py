"""Round-11 wave-39 operator pins: matryoshka recall, lag features,
TWAP, DP noisy counts — hand-built inputs, independently derived."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_time_weighted_mean_hand_series(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        time_weighted_mean,
    )

    rows = [
        # value 10 held 10s, value 20 held 30s, final obs no interval
        ("a", _ts(0), 1, 10.0),
        ("a", _ts(10), 2, 20.0),
        ("a", _ts(40), 3, 99.0),
        # single observation: no interval at all -> NULL twap
        ("b", _ts(0), 4, 5.0),
        # NULL ts drops by contract
        ("a", None, 5, 1000.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, event_id long, value double"
    )
    out = {
        r.k: r
        for r in time_weighted_mean(
            df, ["k"], "ts", "value", tiebreak_cols=["event_id"]
        ).collect()
    }
    a = out["a"]
    assert (a.n_obs, a.total_s) == (3, 40)
    assert a.twap == round((10.0 * 10 + 20.0 * 30) / 40, 6) == 17.5
    b = out["b"]
    assert (b.n_obs, b.total_s, b.twap) == (1, 0, None)


def test_lag_features_hand_series(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        lag_features,
    )

    rows = [
        ("u", _ts(0), 1, 1.0),
        ("u", _ts(5), 2, 2.0),
        ("u", _ts(20), 3, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long, value double"
    )
    out = sorted(
        lag_features(
            df, "user_id", "ts", "value", "event_id", window_rows=3
        ).collect(),
        key=lambda r: r.event_idx,
    )
    assert [r.prev_value for r in out] == [None, 1.0, 2.0]
    assert [r.rolling_mean for r in out] == [1.0, 1.5, 3.0]
    assert [r.gap_s for r in out] == [None, 5, 15]
    assert [r.event_idx for r in out] == [1, 2, 3]


def test_dp_noisy_counts_deterministic_and_noisy(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [(f"g{i % 4}",) for i in range(100)], "g string"
    )
    # round 12: the replayable hash-noise path is now an EXPLICIT
    # keyword-only opt-in (the r11 advisor finding — by default the
    # release draws fresh rand() noise); this test pins the opt-in
    # path's contract, test_advice_r12.py pins the default's.
    a = {
        r.g: r.noisy_count
        for r in dp_noisy_counts(
            df, ["g"], deterministic_noise=True
        ).collect()
    }
    b = {
        r.g: r.noisy_count
        for r in dp_noisy_counts(
            df, ["g"], deterministic_noise=True
        ).collect()
    }
    assert a == b  # replayable release (documented hash-noise contract)
    # noise is actually applied (raw count is 25 per group) and bounded
    # plausibly for eps=1: P(|lap| > 20) ~ 1e-9 per the distribution
    assert any(v != 25 for v in a.values())
    assert all(abs(v - 25) < 25 for v in a.values())
    # a different seed redraws the noise
    c = {
        r.g: r.noisy_count
        for r in dp_noisy_counts(
            df, ["g"], seed=7, deterministic_noise=True
        ).collect()
    }
    assert c != a


def test_matryoshka_full_prefix_is_perfect_recall(spark):
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        matryoshka_recall,
    )

    # 8-dim vectors whose FIRST 4 dims already determine the ranking
    # exactly (last 4 dims are zero): prefix-4 recall must be 1.0, and
    # the full-width prefix trivially so
    rows = [
        (i, [float((i * 3 + j) % 7) for j in range(4)] + [0.0] * 4)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    q = df.filter(F.col("vec_id") < 2)
    out = {
        r.dims: r
        for r in matryoshka_recall(
            df, q, "vec_id", "v", "vec_id", "v", prefix_dims=[4, 8], k=3
        ).collect()
    }
    assert out[4].recall_ppm == 1_000_000
    assert out[8].recall_ppm == 1_000_000
    assert out[4].n_queries == 2 and out[4].hits == 6
