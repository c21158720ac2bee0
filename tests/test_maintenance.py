"""Maintenance-plan tests: compaction trigger hysteresis, z-order
rewrite path, stats refresh artifacts, and no-op cheapness."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.plans.maintenance import (
    maintain_table,
)


def _files(path):
    return glob.glob(os.path.join(path, "*.parquet"))


def _mk_fragmented(spark, path, n_files=40):
    df = spark.range(0, 20000).select(
        F.col("id"),
        (F.col("id") % 97).alias("a"),
        (F.col("id") % 13).alias("b"),
    )
    df.repartition(n_files).write.parquet(path)
    return df


def test_maintenance_compacts_fragmented_table(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "out")
    _mk_fragmented(spark, src, 40)
    total = sum(os.path.getsize(f) for f in _files(src))
    rep = maintain_table(
        spark, src, dst, target_bytes=total // 4 + 1
    )
    assert rep.compacted and not rep.zordered
    assert rep.n_files_before == 40
    assert rep.out_path == dst
    assert 2 <= len(_files(dst)) <= 5
    assert spark.read.parquet(dst).count() == 20000


def test_maintenance_noop_when_layout_healthy(spark, tmp_path):
    src, dst = str(tmp_path / "ok"), str(tmp_path / "out")
    df = _mk_fragmented(spark, src, 2)
    rep = maintain_table(spark, src, dst, target_bytes=1)
    # target from metadata is >= current file count → healthy → no write
    assert not rep.compacted and not rep.zordered
    assert rep.out_path == src
    assert not os.path.exists(dst)
    assert df.count() == 20000  # source untouched


def test_maintenance_zorder_path_and_stats(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "zout")
    stats = str(tmp_path / "stats")
    _mk_fragmented(spark, src, 20)
    total = sum(os.path.getsize(f) for f in _files(src))
    rep = maintain_table(
        spark, src, dst,
        target_bytes=total // 4 + 1,
        zorder_cols=("a", "b"),
        stats_cols=["a", "b"],
        stats_path=stats,
    )
    assert rep.zordered and not rep.compacted
    assert spark.read.parquet(dst).count() == 20000
    regs = spark.read.parquet(f"{stats}/hll_registers")
    assert regs.count() <= 2 * 512
    est = {
        r.col_name: r.approx_distinct
        for r in spark.read.parquet(f"{stats}/distinct_estimates").collect()
    }
    assert abs(est["a"] - 97) / 97 < 0.15
    assert abs(est["b"] - 13) < 1.5
