"""Z-order layout + compaction tests: bit-math correctness, the
two-dimensional locality property the layout exists for, REAL parquet
footer min/max pruning effect, and metadata-only compaction sizing."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.operators.layout import (
    compact_parquet,
    plan_compaction,
    write_zordered,
    zorder_bucket,
    zorder_layout,
    zvalue,
)


def _p1(x: int) -> int:
    x &= 0xFFFF
    for s, m in (
        (8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)
    ):
        x = (x | (x << s)) & m
    return x


def _zv(a: int, b: int) -> int:
    return _p1(a) | (_p1(b) << 1)


def test_zvalue_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
            (400, 77), (65536 + 5, 3)]  # last: only low 16 bits survive
    df = spark.createDataFrame(rows, "a bigint, b bigint").withColumn(
        "z", zvalue(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert r.z == _zv(r.a, r.b), (r.a, r.b)


def test_zvalue_interleaves_monotonically_within_quadrants(spark):
    # the defining Z-curve property: the top bit pair = quadrant, so all
    # z-values of quadrant (hi-a, hi-b) sort after quadrant (lo, lo)
    lo, hi = 100, 60000
    df = spark.createDataFrame(
        [(lo, lo), (hi, lo), (lo, hi), (hi, hi)], "a bigint, b bigint"
    ).withColumn("z", zvalue(F.col("a"), F.col("b")))
    z = {(r.a, r.b): r.z for r in df.collect()}
    assert z[(lo, lo)] < min(z[(hi, lo)], z[(lo, hi)]) <= max(
        z[(hi, lo)], z[(lo, hi)]
    ) < z[(hi, hi)]


def test_zorder_bucket_rejects_non_power_of_two():
    import pytest

    with pytest.raises(ValueError):
        zorder_bucket(F.lit(0), 48)


def test_zorder_layout_buckets_are_tight_in_both_dimensions(spark, sf_dir):
    """64 cells ≈ an 8×8 grid: each cell's key envelope should span a
    small fraction of BOTH ranges — the property single-column sorting
    cannot give (its cells span 100% of the second key's range)."""
    li = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    cells = (
        zorder_layout(li, "l_partkey", "l_suppkey", 64)
        .groupBy("bucket")
        .agg(
            F.min("l_partkey").alias("plo"), F.max("l_partkey").alias("phi"),
            F.min("l_suppkey").alias("slo"), F.max("l_suppkey").alias("shi"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    prange = max(c.phi for c in cells) - min(c.plo for c in cells) or 1
    srange = max(c.shi for c in cells) - min(c.slo for c in cells) or 1
    n_rows = sum(c.n for c in cells)
    # weighted mean envelope fraction per dimension — an 8×8 grid ideal
    # is 1/8; allow slack for key-distribution granularity at tiny SF
    pfrac = sum((c.phi - c.plo) / prange * c.n for c in cells) / n_rows
    sfrac = sum((c.shi - c.slo) / srange * c.n for c in cells) / n_rows
    assert pfrac < 0.35, pfrac
    assert sfrac < 0.35, sfrac


def _files_containing(path: str, col: str, value) -> tuple[int, int]:
    """(files whose [min,max] envelope contains value, total files) from
    the REAL parquet footers — what row-group pruning consults."""
    hit, total = 0, 0
    import glob
    import os

    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        if lo is None:
            continue
        total += 1
        if lo <= value <= hi:
            hit += 1
    return hit, total


def test_write_zordered_footers_prune_on_both_keys(spark, sf_dir, tmp_path):
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", 16)
    # the comparison layout: single-column sort on partkey only
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(lpath)
    )
    stats = li.agg(
        F.expr("percentile(l_partkey, 0.5)"),
        F.expr("percentile(l_suppkey, 0.5)"),
    ).first()
    mid_part, mid_supp = int(stats[0]), int(stats[1])

    # point predicate on the SECOND key: linear layout prunes nothing
    z_hit, z_tot = _files_containing(zpath, "l_suppkey", mid_supp)
    l_hit, l_tot = _files_containing(lpath, "l_suppkey", mid_supp)
    assert l_hit == l_tot  # every linear file spans the full supp range
    assert z_hit <= z_tot // 2, (z_hit, z_tot)
    # and the z-layout still prunes on the first key too
    zp_hit, zp_tot = _files_containing(zpath, "l_partkey", mid_part)
    assert zp_hit <= zp_tot // 2, (zp_hit, zp_tot)

    # correctness: layout changed, relation did not
    assert (
        spark.read.parquet(zpath).orderBy("l_partkey", "l_suppkey",
                                          "l_quantity").collect()
        == li.orderBy("l_partkey", "l_suppkey", "l_quantity").collect()
    )


def test_compaction_plans_from_metadata_and_rewrites(spark, tmp_path):
    src, dst = str(tmp_path / "small"), str(tmp_path / "compact")
    df = spark.range(0, 20000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    _, n_files, _ = plan_compaction(spark, src, target_bytes=1)
    assert n_files == 40
    # pick a target ≈ a quarter of the data → ~4 output files
    import glob
    import os

    total = sum(
        os.path.getsize(f) for f in glob.glob(os.path.join(src, "*.parquet"))
    )
    n_out = compact_parquet(spark, src, dst, target_bytes=total // 4 + 1)
    assert 2 <= n_out <= 5
    got = len(glob.glob(os.path.join(dst, "*.parquet")))
    assert got == n_out
    assert spark.read.parquet(dst).orderBy("id").collect() == df.orderBy(
        "id"
    ).collect()
