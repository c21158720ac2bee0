"""Edge-case unit tests for the round-6 corpus operators: vocab induction
(textops.vocab_frequencies) and one-scan profiling
(profiling.profile_columns). The oracle parity suite proves them against
DuckDB on real testdata; these pin the hand-computable corners."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from calp_cva_tracking_pipeline_spark.operators.profiling import (
    profile_columns,
)
from calp_cva_tracking_pipeline_spark.operators.textops import (
    vocab_frequencies,
)


def test_vocab_counts_and_deterministic_cut(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="The cat and the DOG"),
            Row(doc_id=2, text="the dog runs"),
            Row(doc_id=3, text=None),  # null text contributes nothing
            Row(doc_id=4, text="   "),  # blank text contributes nothing
        ]
    )
    rows = vocab_frequencies(df, "doc_id", top_k=3).collect()
    # tf: the=3, dog=2, others=1; top-3 tie between and/cat broken asc
    assert [(r.token, r.tf, r.df) for r in rows] == [
        ("the", 3, 2),
        ("dog", 2, 2),
        ("and", 1, 1),
    ]


def test_vocab_df_counts_distinct_docs_not_occurrences(spark):
    df = spark.createDataFrame([Row(doc_id=7, text="go go go go")])
    rows = vocab_frequencies(df, "doc_id", top_k=10).collect()
    assert [(r.token, r.tf, r.df) for r in rows] == [("go", 4, 1)]


def test_profile_golden_stats(spark):
    df = spark.createDataFrame(
        [
            Row(a=1.0, b=10.0),
            Row(a=2.0, b=None),
            Row(a=3.0, b=30.0),
            Row(a=4.0, b=None),
        ]
    )
    got = {r.col_name: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert list(got) == ["a", "b"]
    assert (got["a"].n, got["a"].n_null) == (4, 0)
    assert (got["b"].n, got["b"].n_null) == (2, 2)
    assert (got["a"].min, got["a"].max) == (1.0, 4.0)
    assert got["a"].mean == 2.5
    assert got["a"].p50 == 2.5  # exact interpolated median of 1,2,3,4
    assert got["b"].p50 == 20.0  # nulls excluded from the median


def test_profile_approx_variant_same_shape(spark):
    df = spark.createDataFrame([Row(a=float(i)) for i in range(101)])
    exact = profile_columns(df, ["a"]).collect()[0]
    approx = profile_columns(df, ["a"], exact_median=False).collect()[0]
    assert exact.p50 == 50.0
    # sketch median must land within the value range and close at this n
    assert abs(approx.p50 - 50.0) <= 1.0
    assert exact.n == approx.n == 101


def test_profile_rejects_empty_cols(spark):
    df = spark.createDataFrame([Row(a=1.0)])
    with pytest.raises(ValueError):
        profile_columns(df, [])


def test_bm25_golden_tiny_corpus(spark):
    """Hand-computed BM25 on a 3-doc corpus: the term-frequency doc wins,
    a doc without query terms never scores, rarer terms weigh more."""
    import math

    from calp_cva_tracking_pipeline_spark.operators.textops import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="cat dog cat"),
            Row(doc_id=2, text="dog fish fish fish"),
            Row(doc_id=3, text="bird bird bird bird"),
        ]
    )
    out = bm25_topk(docs, "doc_id", ["cat", "dog"], k1=1.2, b=0.75, top_k=3)
    rows = {r.doc_id: r.score for r in out.collect()}
    assert 3 not in rows  # no query term -> no score row
    # doc 1: tf(cat)=2, tf(dog)=1, dl=3; doc 2: tf(dog)=1, dl=4; avgdl=11/3
    def bm25(tf, dl, df, n=3, k1=1.2, b=0.75, avgdl=11 / 3):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    exp1 = round(bm25(2, 3, 1) + bm25(1, 3, 2), 6)
    exp2 = round(bm25(1, 4, 2), 6)
    assert abs(rows[1] - exp1) < 1e-6
    assert abs(rows[2] - exp2) < 1e-6
    assert rows[1] > rows[2]


def test_bm25_rejects_empty_query(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(spark.createDataFrame([Row(doc_id=1, text="x")]), "doc_id", [])


def test_exact_percentiles_against_numpy(spark):
    import numpy as np

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        exact_percentiles,
    )

    vals = [((i * 37) % 101) / 3.0 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    ps = [0.0, 0.25, 0.5, 0.9, 0.95, 1.0]
    got = {
        round(r.p, 4): r.value
        for r in exact_percentiles(df, ["x"], ps, round_to=None).collect()
    }
    for p in ps:
        expected = float(np.percentile(vals, p * 100, method="linear"))
        assert abs(got[round(p, 4)] - expected) < 1e-9, (p, got[round(p, 4)], expected)


def test_exact_percentiles_validation(spark):
    import pytest as _pytest

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        exact_percentiles,
    )

    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        exact_percentiles(df, ["x"], [1.5])
    with _pytest.raises(ValueError):
        exact_percentiles(df, ["x"], [])


def test_psi_detects_shift_and_stability(spark):
    import random

    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        population_stability,
    )

    rng = random.Random(21)
    # stable: both slices draw from the same distribution
    rows = [(i, rng.gauss(0, 1), rng.gauss(0, 1)) for i in range(4000)]
    # shifted: slice 1 of col `b` moves by +2 sigma
    rows = [
        (i, a, b + (2.0 if i % 2 else 0.0)) for i, (_, a, b) in
        zip(range(4000), [(r[0], r[1], r[2]) for r in rows])
    ]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    out = {
        r["col_name"]: r["psi"]
        for r in population_stability(
            df, ["a", "b"], F.col("id") % 2
        ).collect()
    }
    assert out["a"] < 0.1   # same distribution -> stable
    assert out["b"] > 0.25  # 2-sigma shift -> flagged broken


def test_ks_drift_matches_numpy_brute_force(spark):
    # Shifted + same-distribution columns; D checked against the direct
    # all-values empirical-CDF computation (what scipy.ks_2samp does).
    import random

    import numpy as np

    from calp_cva_tracking_pipeline_spark.operators.profiling import ks_drift
    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = []
    for i in range(400):
        sl = i % 2
        same = rng.gauss(0.0, 1.0)
        shifted = rng.gauss(0.0, 1.0) + (0.8 if sl else 0.0)
        ties = float(rng.randint(0, 4))  # heavy ties exercise post-tie CDF
        rows.append((i, sl, same, shifted, ties))
    df = spark.createDataFrame(
        rows, "id long, sl int, same double, shifted double, ties double"
    )
    out = {
        r["col_name"]: (r["ks"], r["n_base"], r["n_cur"])
        for r in ks_drift(
            df, ["same", "shifted", "ties"], F.col("sl")
        ).collect()
    }

    def brute(colvals):
        a = np.sort([v for (s, v) in colvals if s == 0])
        b = np.sort([v for (s, v) in colvals if s == 1])
        xs = np.union1d(a, b)
        fa = np.searchsorted(a, xs, side="right") / len(a)
        fb = np.searchsorted(b, xs, side="right") / len(b)
        return round(float(np.max(np.abs(fa - fb))), 6)

    for idx, c in ((2, "same"), (3, "shifted"), (4, "ties")):
        vals = [(r[1], r[idx]) for r in rows]
        assert out[c] == (brute(vals), 200, 200), c
    # the shifted column must read as drifted, the identical one as not
    assert out["shifted"][0] > 0.25 and out["same"][0] < 0.15


def test_ks_drift_empty_slice_yields_null(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import ks_drift
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 0, 1.0), (2, 0, 2.0)], "id long, sl int, x double"
    )
    [r] = ks_drift(df, ["x"], F.col("sl")).collect()
    assert r["ks"] is None and r["n_base"] == 2 and r["n_cur"] == 0


def test_key_skew_report_hand_computed(spark):
    import math

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        key_skew_report,
    )

    # 6 rows: key a x3, b x2, c x1
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(["a", "a", "a", "b", "b", "c"])],
        "id long, k string",
    )
    [r] = key_skew_report(df, "k").collect()
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (6, 3, 3)
    assert r["max_share"] == 0.5
    ent = sum(
        round(1e9 * round(-(c / 6) * math.log(c / 6), 9)) for c in (3, 2, 1)
    ) / 1e9
    assert r["entropy_nats"] == round(ent, 6)
    assert r["effective_keys"] == round(math.exp(round(ent, 6)), 6)

    # uniform keys: entropy = ln(n_keys), effective_keys = n_keys
    u = spark.createDataFrame(
        [(i, str(i % 4)) for i in range(400)], "id long, k string"
    )
    [ru] = key_skew_report(u, "k").collect()
    assert ru["max_share"] == 0.25
    assert abs(ru["effective_keys"] - 4.0) < 1e-4


def test_profile_columns_by_matches_pandas(spark):
    import pytest

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        profile_columns_by,
    )

    rows = [
        ("a", 1.0, 10.0), ("a", 2.0, None), ("a", 3.0, 30.0),
        ("b", 5.5, 7.25), ("b", None, 9.75),
    ]
    df = spark.createDataFrame(rows, "src string, x double, y double")
    out = {
        (r["src"], r["col_name"]): (
            r["n"], r["n_null"], r["min"], r["max"], r["mean"]
        )
        for r in profile_columns_by(df, "src", ["x", "y"]).collect()
    }
    assert out[("a", "x")] == (3, 0, 1.0, 3.0, 2.0)
    assert out[("a", "y")] == (2, 1, 10.0, 30.0, 20.0)
    assert out[("b", "x")] == (1, 1, 5.5, 5.5, 5.5)
    assert out[("b", "y")] == (2, 0, 7.25, 9.75, 8.5)

    with pytest.raises(ValueError):
        profile_columns_by(df, "src", [])


def test_grouped_exact_medians_match_per_slice_kernel(spark):
    """grouped_exact_medians == exact_percentiles run per group slice
    (the previously-documented workaround), including NULL group, NULL
    values, a constant column and a single-row group — the grouped
    kernel is the same machinery with a joint key, so any divergence is
    a keying bug."""
    import random

    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        exact_percentiles,
        grouped_exact_medians,
    )

    rng = random.Random(13)
    rows = []
    for i in range(400):
        g = rng.choice(["a", "b", "c", None])
        rows.append(
            (
                i,
                g,
                rng.uniform(-50, 50) if rng.random() > 0.1 else None,
                7.0,  # constant column: median == 7 everywhere
            )
        )
    rows.append((1000, "solo", 3.25, 7.0))  # single-row group
    df = spark.createDataFrame(
        rows, "id long, grp string, x double, c double"
    )

    got = {
        (r.grp, r.col_name): r.median
        for r in grouped_exact_medians(df, "grp", ["x", "c"]).collect()
    }
    for g in ["a", "b", "c", None, "solo"]:
        s = df.filter(
            F.col("grp").eqNullSafe(F.lit(g))
        )
        exp = {
            r.col_name: round(r.value, 6) if r.value is not None else None
            for r in exact_percentiles(
                s, ["x", "c"], [0.5], round_to=6
            ).collect()
        }
        for c in ("x", "c"):
            if c in exp:
                assert got.get((g, c)) == exp[c], (g, c, got.get((g, c)), exp[c])
            else:
                assert (g, c) not in got
