"""Hand-data unit tests for the round-9 wave operators (the catalog
oracle proves engine parity; these pin the SEMANTICS on inputs where
the right answer is checkable by eye)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_interval_union_merges_overlaps_and_touching(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        interval_union_length,
    )

    rows = [
        # key 1: [0,10) [5,20) overlap -> [0,20); [20,30) touches -> merges
        (1, 0, 10), (1, 5, 20), (1, 20, 30),
        # key 1: disjoint [100,105)
        (1, 100, 105),
        # key 2: nested [0,100) contains [10,20)
        (2, 0, 100), (2, 10, 20),
        # junk: zero-length and inverted drop
        (2, 50, 50), (2, 70, 60),
    ]
    df = spark.createDataFrame(rows, "k long, s long, e long")
    out = {
        r.k: (r.n_intervals, r.n_runs, r.covered)
        for r in interval_union_length(df, ["k"], "s", "e").collect()
    }
    assert out[1] == (4, 2, 35)  # [0,30) + [100,105)
    assert out[2] == (2, 1, 100)


def test_interleave_positions_cycle_lanes(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        interleave_sources,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(10)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = interleave_sources(df, "src", "id", ["a", "b"]).collect()
    assert len(out) == 10
    positions = sorted(r.position for r in out)
    assert positions == list(range(10))  # equal sources -> dense 0..9
    by_pos = {r.position: r.src for r in out}
    assert all(by_pos[p] == ("a" if p % 2 == 0 else "b") for p in range(10))
    # undeclared source rows drop
    df2 = spark.createDataFrame(rows + [(99, "zz")], "id long, src string")
    assert interleave_sources(df2, "src", "id", ["a", "b"]).count() == 10


def test_interarrival_regular_stream_burstiness_minus_one(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        interarrival_stats,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: perfect 60s heartbeat -> std 0, CV 0, B -1
        *[(1, t0 + dt.timedelta(seconds=60 * i), i) for i in range(10)],
        # user 2: two events only -> below min_events, NULL stats
        (2, t0, 100), (2, t0 + dt.timedelta(seconds=5), 101),
    ]
    df = spark.createDataFrame(rows, "u long, ts timestamp, eid long")
    out = {
        r.u: r
        for r in interarrival_stats(
            df, "u", "ts", tiebreak_cols=["eid"], min_events=3
        ).collect()
    }
    r1 = out[1]
    assert r1.n_gaps == 9
    assert r1.mean_gap_s == 60.0 and r1.std_gap_s == 0.0
    assert r1.cv == 0.0 and r1.burstiness == -1.0
    assert out[2].mean_gap_s is None and out[2].burstiness is None


def test_sentence_stats_counts_and_lengths(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        sentence_stats,
    )

    rows = [
        (1, "one two three. four five! six?"),
        (2, "no terminators here at all"),
        (3, ""),
        (4, None),
        (5, "trailing dots..."),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in sentence_stats(df, "id", "text").collect()}
    assert out[1].n_sentences == 3
    assert out[1].mean_sentence_tokens == 2.0  # (3+2+1)/3
    assert out[1].max_sentence_tokens == 3
    assert out[2].n_sentences == 1
    assert out[3].n_sentences == 0 and out[3].mean_sentence_tokens is None
    assert out[4].n_sentences == 0
    assert out[5].n_sentences == 1 and out[5].max_sentence_tokens == 2


def test_ab_test_flags_only_real_shifts(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        ab_test_summary,
    )

    rows = []
    for i in range(200):
        rows.append(("control", 100.0 + (i % 11) - 5))  # mean ~100
        rows.append(("same", 100.0 + ((i + 3) % 11) - 5))  # same dist
        rows.append(("shifted", 130.0 + (i % 11) - 5))  # clearly higher
    rows += [("tiny", 500.0)] * 3  # below min_n
    df = spark.createDataFrame(rows, "variant string, v double")
    out = {
        r.variant: r
        for r in ab_test_summary(df, "variant", "v", "control").collect()
    }
    assert out["control"].z is None
    assert out["shifted"].significant is True and out["shifted"].z > 10
    assert out["same"].significant is False
    assert out["tiny"].z is None


def test_code_detect_routes_code_not_prose(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        code_detect,
    )

    rows = [
        (1, "def main():\n    return compute(x)\nimport sys"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "int x = y[3]; if (x > 0) { run(); }"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in code_detect(df, "id", "text").collect()}
    assert out[1].is_code is True  # keywords + indent
    assert out[2].is_code is False
    assert out[3].is_code is True  # symbol ratio
    assert out[4].is_code is False and out[4].symbol_ratio == 0.0
