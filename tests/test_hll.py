"""Deterministic-HLL sketch tests: mergeability (the scale property),
estimate accuracy versus exact, branch coverage, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.sketch import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _df(spark, values, col="v"):
    return spark.createDataFrame([(x,) for x in values], f"{col} string")


def test_hll_merge_of_shards_equals_whole_sketch(spark):
    """Bucket-wise MAX merge of per-shard register tables must be
    BIT-IDENTICAL to sketching the union — the property that lets 100 TB
    be sketched shard-locally and merged as 512-row tables."""
    vals = [f"key-{i}" for i in range(5000)]
    whole = hll_sketch(_df(spark, vals), ["v"])
    half_a = hll_sketch(_df(spark, vals[:2500]), ["v"])
    half_b = hll_sketch(_df(spark, vals[2000:]), ["v"])  # overlapping
    merged = hll_merge(half_a, half_b)
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
    # and the estimates agree exactly too
    e1 = hll_estimate(whole).first().approx_distinct
    e2 = hll_estimate(merged).first().approx_distinct
    assert e1 == e2


def test_hll_estimate_within_rsd_envelope(spark):
    # 512 registers → rsd ≈ 1.04/sqrt(512) ≈ 4.6%; allow 3 sigma
    for n in (1000, 5000, 20000):
        vals = [f"item-{i}" for i in range(n)]
        est = hll_estimate(hll_sketch(_df(spark, vals), ["v"])).first()
        assert abs(est.approx_distinct - n) / n < 0.14, (n, est)


def test_hll_small_range_uses_linear_counting(spark):
    # 3 distinct values → almost all registers empty → the linear-
    # counting branch must fire and land very close to exact
    vals = ["a", "b", "c"] * 200
    est = hll_estimate(hll_sketch(_df(spark, vals), ["v"])).first()
    assert abs(est.approx_distinct - 3) < 0.5, est


def test_hll_sketch_bounded_and_partition_independent(spark):
    vals = [f"x{i}" for i in range(10000)]
    sk = hll_sketch(_df(spark, vals), ["v"])
    assert sk.count() <= HLL_M
    sk7 = hll_sketch(_df(spark, vals).repartition(7), ["v"])
    assert sorted(map(tuple, sk.collect())) == sorted(
        map(tuple, sk7.collect())
    )


def test_hll_duplicates_and_nulls_ignored(spark):
    base = [f"k{i}" for i in range(500)]
    df_dup = spark.createDataFrame(
        [(x,) for x in base * 3] + [(None,)] * 50, "v string"
    )
    a = hll_estimate(hll_sketch(_df(spark, base), ["v"])).first()
    b = hll_estimate(hll_sketch(df_dup, ["v"])).first()
    assert a.approx_distinct == b.approx_distinct


def test_hll_multi_column_single_scan(spark):
    df = spark.range(0, 3000).select(
        F.col("id").cast("string").alias("a"),
        (F.col("id") % 10).cast("string").alias("b"),
    )
    out = {
        r.col_name: r.approx_distinct
        for r in hll_estimate(hll_sketch(df, ["a", "b"])).collect()
    }
    assert abs(out["a"] - 3000) / 3000 < 0.14
    assert abs(out["b"] - 10) < 0.5
    # one scan: the sketch plan reads the range once (unpivot, not
    # one union branch per column over the source)
    plan = hll_sketch(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0") <= 1
