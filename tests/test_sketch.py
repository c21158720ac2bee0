"""operators.sketch.heavy_hitters: the two-phase result must equal the
exact groupBy answer (the MG sketch only PRUNES; phase 2 re-counts), under
any partitioning and with the sketch capacity at the guarantee floor."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.sketch import heavy_hitters


def _exact(df, key_col, s):
    n = df.count()
    return {
        (r[key_col], r["cnt"])
        for r in df.groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt").cast("double") >= s * n)
        .collect()
    }


def _skewed(spark, n_heavy=3, heavy=400, n_tail=500, tail=2):
    # 3 keys at ~24% each, 500 keys at 2 rows each (~0.1%).
    rows = [(f"h{i}",) for i in range(n_heavy) for _ in range(heavy)]
    rows += [(f"t{i}",) for i in range(n_tail) for _ in range(tail)]
    return spark.createDataFrame(rows, "k string")


def test_matches_exact_groupby(spark):
    df = _skewed(spark)
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, "k", 0.05).collect()
    }
    assert got == _exact(df, "k", 0.05)
    assert len(got) == 3


def test_partition_invariance(spark):
    df = _skewed(spark)
    a = sorted(
        map(tuple, heavy_hitters(df.repartition(1), "k", 0.05).collect())
    )
    b = sorted(
        map(tuple, heavy_hitters(df.repartition(16), "k", 0.05).collect())
    )
    assert a == b


def test_guarantee_floor_capacity(spark):
    # margin=1 is the theoretical floor k = ceil(1/s); the superset
    # guarantee must still hold (phase 2 fixes any candidate overreach).
    df = _skewed(spark, n_heavy=5, heavy=100, n_tail=200, tail=1)
    s = 0.1  # 5 keys at 100/700 ~ 14.3% each
    got = {
        (r["k"], r["cnt"])
        for r in heavy_hitters(df, "k", s, margin=1.0).collect()
    }
    assert got == _exact(df, "k", s)
    assert len(got) == 5


def test_frac_column(spark):
    df = spark.createDataFrame([("a",)] * 30 + [("b",)] * 10, "k string")
    rows = {
        r["k"]: (r["cnt"], r["frac"])
        for r in heavy_hitters(df, "k", 0.2).collect()
    }
    assert rows == {"a": (30, 0.75), "b": (10, 0.25)}


def test_threshold_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 0.0)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", 1.5)


def test_mg_merge_bounded_and_superset(spark):
    from calp_cva_tracking_pipeline_spark.operators.sketch import mg_merge

    k = 10
    store = spark.createDataFrame([], "k string, cnt long")
    # stream: 3 heavy keys (200 each), 300 tail singletons, in 4 batches
    rows = [(f"h{i % 3}",) for i in range(600)] + [
        (f"t{i}",) for i in range(300)
    ]
    import random

    random.Random(5).shuffle(rows)
    n = len(rows)
    chunk = n // 4
    for b in range(4):
        batch = spark.createDataFrame(
            rows[b * chunk:(b + 1) * chunk if b < 3 else n], "k string"
        )
        store = spark.createDataFrame(
            store.collect(), "k string, cnt long"
        )  # materialize like a parquet store roundtrip
        store = mg_merge(store, batch, "k", k)
    final = {r["k"]: r["cnt"] for r in store.collect()}
    assert len(final) <= k  # bounded summary
    # every key with freq > n/(k+1) must be present, with undercount
    # bounded by n/(k+1)
    for h in ("h0", "h1", "h2"):
        assert h in final
        assert 200 - n / (k + 1) <= final[h] <= 200
