"""Round-10 advisor-flagged edge cases, pinned as regressions.

Round-9 advisor findings (ADVICE.md):
1. phash band packing: grid=16 with the old nblocks=max_hamming+1
   produced 64-bit bands, so shiftleft(1L, 63) set the sign bit and
   band values went negative (contradicting the code comment). Fixed:
   nblocks floor keeps every band <= 63 bits; extra bands only add
   candidates so recall within max_hamming stays exact. Pinned on a
   grid=16 corpus: all band values non-negative AND pair output
   matches exact hamming ground truth.
2. funnel_step_times percentile labels floor-divide ppm by 10000, so
   990000 and 995000 both map to p99_s — silent duplicate output
   columns. Fixed: collision raises ValueError. Pinned both ways.
3. session.autoscale_shuffle_partitions dereferenced df._jdf without a
   guard — Spark Connect DataFrames have no JVM handle. Fixed: a
   missing _jdf now raises a clear ValueError demanding input_bytes.
   Pinned with a _jdf-less stand-in object.
4. split_leakage_audit's docstring claimed n_near >= n_exact cell-wise
   while its default near cap (16) was tighter than its exact cap (64):
   a 17..64-sized duplicate flood counts exact pairs but its
   fingerprints drop whole from the near count. Fixed: max_docs_per_fp
   defaults to max_docs_per_hash (aligned caps), tighter caps are an
   explicit caller decision documented as such. Pinned on a 20-copy
   duplicate flood: with defaults, every exact cell satisfies
   n_near >= n_exact.
5. interval_join's bucketized path re-added eqNullSafe key predicates
   that the pre-built `cond` already contained, with `cond` referencing
   the PRE-withColumn parent frames. Fixed: each path builds its
   predicates once against the frames actually joined. Pinned: keyed
   bucketized output matches the broadcast (no-bucket) path exactly,
   and the executed plan contains no duplicated key condition.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive


# ---------------------------------------------------------------------------
# 1. phash bands stay sign-bit-free at grid=16 and recall stays exact.
# ---------------------------------------------------------------------------


def test_phash_grid16_bands_nonnegative_and_recall_exact(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        image_phash_pairs,
    )

    grid = 16
    side = 32  # 2x2 pixel boxes per cell
    # four images: two all-dark/bright halves (near-dup pair via small
    # perturbation), one inverted, one checkerboard — deterministic
    def img(flip_cells):
        px = bytearray()
        for y in range(side):
            for x in range(side):
                cell = (y // 2) * grid + (x // 2)
                base = 200 if (x < side // 2) else 30
                if cell in flip_cells:
                    base = 255 - base
                px += bytes((base, base, base))
        return encode_bmp(side, side, bytes(px))

    rows = [
        (1, img(set())),
        (2, img({0})),          # 1 cell flipped -> hamming 1 from id 1
        (3, img(set(range(0, 256, 2)))),  # far from everything
        (4, img({0, 1, 2, 3, 4})),        # hamming 5 from id 1: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = image_phash_pairs(
        df, "doc_id", "payload", grid=grid, max_hamming=3
    ).collect()
    got = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in got
    assert all(3 not in p and 4 not in p for p in got), got

    # band values must be representable without the sign bit: recompute
    # the internal band projection and assert non-negative
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        image_cell_sums,
    )

    cells = image_cell_sums(df, "doc_id", "payload", grid).filter(
        F.col("decode_ok") == "ok_stdlib"
    )
    nbits = grid * grid
    nblocks = max(3 + 1, -(-nbits // 63))
    sizes = [
        nbits // nblocks + (1 if i < nbits % nblocks else 0)
        for i in range(nblocks)
    ]
    assert max(sizes) <= 63
    offs = [sum(sizes[:i]) for i in range(nblocks)]
    band_exprs = ", ".join(
        "aggregate(sequence(0, {n}), 0L, (acc, i) -> acc + IF("
        "__cells[{off} + i] * {nbits} > __total, shiftleft(1L, i), 0L))"
        .format(n=sizes[b] - 1, off=offs[b], nbits=nbits)
        for b in range(nblocks)
    )
    bands = (
        cells.withColumn(
            "__total",
            F.expr("aggregate(__cells, 0L, (acc, x) -> acc + x)"),
        )
        .select(F.explode(F.expr(f"array({band_exprs})")).alias("v"))
        .collect()
    )
    assert bands and all(r.v >= 0 for r in bands)


# ---------------------------------------------------------------------------
# 2. funnel_step_times rejects colliding percentile labels.
# ---------------------------------------------------------------------------


def _mini_events(spark):
    rows = [
        ("u1", 1_000_000_000_000, "view", "e1"),
        ("u1", 1_000_060_000_000, "cart", "e2"),
        ("u1", 1_000_120_000_000, "buy", "e3"),
        ("u2", 1_000_000_000_000, "view", "e4"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, ts_us long, event_type string, event_id string"
    ).select(
        "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "event_type",
        "event_id",
    )


def test_funnel_step_times_label_collision_raises(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        funnel_step_times,
    )

    with pytest.raises(ValueError, match="collide"):
        funnel_step_times(
            _mini_events(spark),
            "user_id",
            "ts",
            "event_type",
            ["view", "cart", "buy"],
            pcts_ppm=[990000, 995000],
        )


def test_funnel_step_times_distinct_labels_still_work(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        funnel_step_times,
    )

    out = funnel_step_times(
        _mini_events(spark),
        "user_id",
        "ts",
        "event_type",
        ["view", "cart", "buy"],
        pcts_ppm=[500000, 990000],
    )
    assert "p50_s" in out.columns and "p99_s" in out.columns
    rows = {r.hop: r for r in out.collect()}
    assert rows[1].n_converted == 1 and rows[1].p50_s == 60


# ---------------------------------------------------------------------------
# 3. autoscale_shuffle_partitions fails clearly without a JVM handle.
# ---------------------------------------------------------------------------


def test_autoscale_rejects_jdf_less_dataframe(spark):
    from calp_cva_tracking_pipeline_spark.session import (
        autoscale_shuffle_partitions,
    )

    class ConnectLike:  # no _jdf attribute, like a Spark Connect frame
        pass

    with pytest.raises(ValueError, match="input_bytes"):
        autoscale_shuffle_partitions(spark, df=ConnectLike())
    # explicit bytes still work regardless of the frame type
    n = autoscale_shuffle_partitions(spark, input_bytes=1)
    assert n >= 1


# ---------------------------------------------------------------------------
# 4. aligned default caps restore the n_near >= n_exact invariant.
# ---------------------------------------------------------------------------


def test_split_leakage_default_caps_keep_invariant(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        split_leakage_audit,
    )

    # one 20-copy duplicate flood (above the OLD near cap of 16, below
    # the exact cap of 64) + unique fillers; every doc long enough for
    # winnow detection (>= window+k-1 = 8 shared tokens)
    dup_text = " ".join(f"tok{i}" for i in range(12))
    rows = [(f"dup{i}", dup_text) for i in range(20)]
    rows += [
        (f"uniq{i}", " ".join(f"u{i}w{j}" for j in range(12)))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = split_leakage_audit(df, "doc_id", "text").collect()
    assert out, "flood must produce at least one cell"
    for r in out:
        if r.n_exact_pairs is not None and r.n_exact_pairs > 0:
            assert (r.n_near_pairs or 0) >= r.n_exact_pairs, r


# ---------------------------------------------------------------------------
# 5. interval_join bucketized path: single key predicate, parity with
#    the broadcast path.
# ---------------------------------------------------------------------------


def test_interval_join_bucketized_matches_broadcast_keyed(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        interval_join,
    )

    pts = spark.createDataFrame(
        [(k, float(t)) for k in ("a", "b", None) for t in range(0, 50, 3)],
        "k string, t double",
    )
    iv = spark.createDataFrame(
        [
            ("a", 0.0, 10.0, "i1"),
            ("a", 9.0, 30.0, "i2"),
            ("b", 5.0, 6.0, "i3"),
            (None, 0.0, 100.0, "i4"),
        ],
        "k string, lo double, hi double, iv_id string",
    )
    plain = interval_join(
        pts, iv, point_time="t", start="lo", end="hi", keys=["k"]
    )
    bucketed = interval_join(
        pts, iv, point_time="t", start="lo", end="hi", keys=["k"],
        bucket_width=7.0,
    )
    key = lambda r: (str(r["k"]), r["t"], str(r["iv_id"]))  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(
        map(key, bucketed.collect())
    )
    # the key predicate appears exactly once in the join condition
    analyzed = bucketed._jdf.queryExecution().analyzed().toString()
    join_lines = [
        ln for ln in analyzed.splitlines() if "Join Inner" in ln
    ]
    assert join_lines
    assert join_lines[0].count("<=>") == 1, join_lines[0]
