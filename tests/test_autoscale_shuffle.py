"""Bytes-derived shuffle parallelism (session.autoscale_shuffle_partitions).

The round-8 64× triangle probe (SCALE.md §shuffle-scaling) showed AQE
only coalesces DOWN — a fixed spark.sql.shuffle.partitions means hash
builds grow linearly with data until they OOM. These tests pin the
engine-behavior fix: partition counts derived from plan-statistics
bytes, monotone in data size, never lowered below the session setting,
clamped, and effective on a real aggregation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.session import (
    MAX_AUTO_SHUFFLE_PARTITIONS,
    autoscale_shuffle_partitions,
)


@pytest.fixture
def restore_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", before)


def _replicate(df, k: int):
    return df.crossJoin(
        df.sparkSession.range(k).select(F.col("id").alias("__rep"))
    ).drop("__rep")


def test_partition_count_scales_linearly_with_bytes(spark, sf_dir, restore_conf):
    li = T(spark, sf_dir, "lineitem")
    # small divisor so the tiny test table exercises the scaling law
    bpp = 64 * 1024
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    n1 = autoscale_shuffle_partitions(spark, df=li, bytes_per_partition=bpp)
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    n8 = autoscale_shuffle_partitions(
        spark, df=_replicate(li, 8), bytes_per_partition=bpp
    )
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    n64 = autoscale_shuffle_partitions(
        spark, df=_replicate(li, 64), bytes_per_partition=bpp
    )
    # linear-ish growth: 8x data needs >=4x partitions, 64x >= 4x of 8x
    # (plan stats for a crossJoin replication are size-exact, but keep a
    # 2x slack against estimator rounding)
    assert n8 >= 4 * n1
    assert n64 >= 4 * n8
    assert n64 >= 64 * n1 // 2


def test_never_lowers_session_setting(spark, sf_dir, restore_conf):
    li = T(spark, sf_dir, "lineitem")
    spark.conf.set("spark.sql.shuffle.partitions", "400")
    n = autoscale_shuffle_partitions(spark, df=li)  # tiny input
    assert n == 400
    assert spark.conf.get("spark.sql.shuffle.partitions") == "400"


def test_clamped_at_backstop(spark, restore_conf):
    n = autoscale_shuffle_partitions(
        spark, input_bytes=1 << 60, bytes_per_partition=1
    )
    assert n == MAX_AUTO_SHUFFLE_PARTITIONS


def test_raised_conf_is_effective_and_results_unchanged(
    spark, sf_dir, restore_conf
):
    li = T(spark, sf_dir, "lineitem")
    q = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n")
    )
    baseline = {r.l_returnflag: r.n for r in q.collect()}
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    n = autoscale_shuffle_partitions(
        spark, df=li, bytes_per_partition=32 * 1024
    )
    assert n > 2
    after = {r.l_returnflag: r.n for r in q.collect()}
    assert after == baseline


def test_requires_df_or_bytes(spark):
    with pytest.raises(ValueError):
        autoscale_shuffle_partitions(spark)
