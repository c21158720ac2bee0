"""Eighth-wave operators: integer-exact EWMA, rolling z-score anomalies,
inverted-index posting lists, int8 quantization, k-anonymity audit."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.linalg import quantize_int8
from calp_cva_tracking_pipeline_spark.operators.profiling import k_anonymity
from calp_cva_tracking_pipeline_spark.operators.retrieval import posting_lists
from calp_cva_tracking_pipeline_spark.operators.temporal import (
    ewma_smooth,
    rolling_anomaly,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# ewma_smooth
# ---------------------------------------------------------------------------


def _ewma_ref(rows, alpha_num=1, alpha_den=4, scale=1_000_000):
    """Pure-python integer recurrence reference."""
    import math

    state: dict = {}
    out = {}
    for u, i, ts, v in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        x = int(math.floor(v * scale + 0.5))
        s = state.get(u)
        s = x if s is None else (alpha_num * x + (alpha_den - alpha_num) * s) // alpha_den
        state[u] = s
        out[i] = s / scale
    return out


def test_ewma_matches_reference_and_layout_independent(spark):
    rng = random.Random(31)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            rng.randrange(5),
            i,
            t0 + dt.timedelta(minutes=rng.randrange(10000)),
            round(rng.uniform(0, 300), 2),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    want = _ewma_ref(rows)

    def run(d):
        got = ewma_smooth(
            d, ["user_id"], "ts", "value", "event_id"
        ).collect()
        return {r["event_id"]: r["ewma"] for r in got}

    got = run(df)
    assert got == want
    assert run(df.repartition(9, "value")) == want  # bit-identical, any layout


def test_ewma_excludes_null_rows_from_recurrence(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, 100.0),
        (1, 2, t0 + dt.timedelta(hours=1), None),
        (1, 3, t0 + dt.timedelta(hours=2), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    got = {r["event_id"]: r["ewma"] for r in ewma_smooth(
        df, ["user_id"], "ts", "value", "event_id"
    ).collect()}
    assert set(got) == {1, 3}
    assert got[3] == (0 + 3 * 100_000_000) // 4 / 1_000_000  # null row skipped


# ---------------------------------------------------------------------------
# rolling_anomaly
# ---------------------------------------------------------------------------


def test_rolling_anomaly_flags_planted_spike_only(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, t0 + dt.timedelta(hours=i), 10.0 + (i % 3))
        for i in range(40)
    ]
    rows.append((1, 99, t0 + dt.timedelta(hours=41), 500.0))
    # another user with too-short history: never flagged
    rows += [(2, 200 + i, t0 + dt.timedelta(hours=i), float(i * 100)) for i in range(5)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    out = rolling_anomaly(
        df, ["user_id"], "ts", "value", "event_id", "7 days", 3.0, 10
    ).collect()
    assert [r["event_id"] for r in out] == [99]
    assert out[0]["z"] > 3.0


def test_rolling_anomaly_constant_series_never_divides_by_zero(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(hours=i), 7.0) for i in range(30)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    assert (
        rolling_anomaly(
            df, ["user_id"], "ts", "value", "event_id", "7 days", 3.0, 10
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# posting_lists
# ---------------------------------------------------------------------------


def test_posting_lists_reference(spark):
    docs = [
        (1, "a a a b"),
        (2, "a b b c"),
        (3, "a c"),
        (4, "b"),
    ]
    toks = (
        spark.createDataFrame(docs, "doc_id bigint, text string")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )
    got = {
        r["token"]: (r["df"], r["postings"])
        for r in posting_lists(toks, "token", "doc_id", top_m=2).collect()
    }
    # a: tf 3@1, 1@2, 1@3 → top2 = [1, 2]; df 3
    assert got["a"] == (3, [1, 2])
    # b: tf 2@2, 1@1, 1@4 → [2, 1]; df 3
    assert got["b"] == (3, [2, 1])
    assert got["c"] == (2, [2, 3])


def test_posting_lists_bounded_and_two_exchanges(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    df = S.rt_posting_lists(spark, sf_dir)
    # plan BEFORE any action: post-collect the AQE plan string holds both
    # Final and Initial sections and double-counts every node
    plan = _executed(df)
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Join" not in plan
    # the rank cut must push a partial top-m below the token exchange
    assert "WindowGroupLimit" in plan
    rows = df.collect()
    assert all(len(r["postings"]) <= S.POSTINGS_M for r in rows)


# ---------------------------------------------------------------------------
# quantize_int8
# ---------------------------------------------------------------------------


def test_quantize_int8_range_roundtrip_and_dead_dim(spark):
    rng = random.Random(3)
    rows = [
        (i, [round(rng.uniform(-2, 2), 4) for _ in range(7)] + [0.0])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = quantize_int8(df, "embedding", "vec_id").collect()
    raw = {i: v for i, v in rows}
    scales = out[0]["scales"]
    assert scales[7] == 0.0  # dead dimension
    for r in out:
        assert all(-127 <= q <= 127 for q in r["qvec"])
        assert r["qvec"][7] == 0
        for d, q in enumerate(r["qvec"][:7]):
            # dequantization error ≤ half a step
            x = raw[r["vec_id"]][d]
            assert abs(q * scales[d] / 127.0 - x) <= scales[d] / 127.0 * 0.5 + 1e-4


# ---------------------------------------------------------------------------
# k_anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_flags_small_classes(spark):
    rows = [("US", "a")] * 10 + [("US", "b")] * 2 + [("FR", "a")]
    df = spark.createDataFrame(rows, "country string, seg string")
    got = {
        (r["country"], r["seg"]): (r["n"], r["risky"])
        for r in k_anonymity(df, ["country", "seg"], k=5).collect()
    }
    assert got[("US", "a")] == (10, False)
    assert got[("US", "b")] == (2, True)
    assert got[("FR", "a")] == (1, True)


def test_ewma_chunked_equals_oneshot(spark):
    """ewma_smooth_chunked slices time into epochs and carries the
    one-integer state across them; the recurrence composes at epoch
    boundaries, so it must equal the one-shot kernel ROW FOR ROW — on
    data with negative values, keys silent for whole epochs (their state
    must carry), ties, and keys that appear mid-stream."""
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        ewma_smooth_chunked,
    )

    rng = random.Random(43)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(600):
        u = rng.randrange(6)
        # user 3 goes silent between day 3 and day 11 (skips >2 epochs)
        day = rng.choice([0, 1, 2, 11, 12]) if u == 3 else rng.uniform(0, 14)
        rows.append(
            (
                u,
                i,
                t0 + dt.timedelta(days=day, seconds=rng.randrange(86400)),
                round(rng.uniform(-200, 300), 2),
            )
        )
    # user 5 appears only in the last epoch
    rows = [r for r in rows if not (r[0] == 5 and r[3] < 250)]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    oneshot = {
        r.event_id: r.ewma
        for r in ewma_smooth(df, ["user_id"], "ts", "value", "event_id").collect()
    }
    chunked = {
        r.event_id: r.ewma
        for r in ewma_smooth_chunked(
            df, ["user_id"], "ts", "value", "event_id", epoch="2 days"
        ).collect()
    }
    assert chunked == oneshot
    # layout-independence of the chunked path
    chunked2 = {
        r.event_id: r.ewma
        for r in ewma_smooth_chunked(
            df.repartition(13, "event_id"),
            ["user_id"],
            "ts",
            "value",
            "event_id",
            epoch="2 days",
        ).collect()
    }
    assert chunked2 == oneshot
