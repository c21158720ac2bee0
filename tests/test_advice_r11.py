"""Round-11 advisor-flagged edge cases, pinned as regressions.

Round-10 advisor findings (ADVICE.md):
1. snippet_extract interpolated raw query terms into an F.expr IN-list
   via f"'{t}'" — a term containing a single quote ("don't") broke the
   parse at runtime and was an expression-injection vector. Fixed:
   Column.isin takes the terms as literals, never as SQL text. Pinned
   with a quoted term and an injection-shaped term.
2. radius_join had no antimeridian handling: a probe at lon 179.99 and
   a point at lon -179.99 landed in far-apart lon cells, silently
   missing true matches straddling ±180°. Fixed: probes within the
   seam margin also bucket under lon∓360° (haversine itself is
   wrap-safe — sin²(Δλ/2) is symmetric about 180°), with a guard that
   keeps wrapped neighborhoods disjoint. Pinned both directions plus
   pair uniqueness.
3. epoch_plan's shortfall product `epochs_milli * source_tokens div
   1000` (and the raw_milli product `target_tokens * 1000`, which
   overflows even earlier) exceeded int64 for web-scale token counts.
   Fixed: both products run in DECIMAL(38,0) with exact integral
   `div`. Pinned at token counts where the bigint products are ~8e21.
4. frame_dedup_groups digested only the comma-joined luma values,
   omitting frame dimensions — a 2x3 and a 3x2 frame with the same
   pixel sequence collided into one "duplicate" group. Fixed: the
   digest input is "{w}x{h}:" + joined lumas (oracle mirrored).
   Pinned: reshaped frames distinct, same-dims duplicates still group.
5. time_split crashed with TypeError (float(None)) when the quantile
   cuts came back NULL (every ts NULL) — only the zero-row case was
   guarded. Fixed: NULL cut values return the same empty audit frame.
"""

from __future__ import annotations

import pytest

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive

from pyspark.sql import functions as F



# ---------------------------------------------------------------------------
# 1. snippet_extract treats query terms as literals, not SQL text.
# ---------------------------------------------------------------------------


def test_snippet_extract_quoted_and_injection_terms(spark):
    from calp_cva_tracking_pipeline_spark.operators.retrieval import (
        snippet_extract,
    )

    df = spark.createDataFrame(
        [
            (1, "they said don't stop the test run"),
            (2, "plain text with no match at all"),
        ],
        "doc_id long, text string",
    )
    out = snippet_extract(
        df, "doc_id", "text", ["don't", "x') OR ('1'='1"], window=4
    ).collect()
    got = {r.doc_id: r for r in out}
    assert set(got) == {1}
    assert got[1].hits == 1 and "don't" in got[1].snippet


# ---------------------------------------------------------------------------
# 2. radius_join finds pairs straddling the ±180° antimeridian.
# ---------------------------------------------------------------------------


def test_radius_join_antimeridian_pairs_found_once(spark):
    from calp_cva_tracking_pipeline_spark.operators.geo import radius_join

    # ~22 km apart across the seam at the equator, both directions,
    # plus a far-away control on each side
    pts = spark.createDataFrame(
        [(1, 0.0, -179.9), (2, 0.0, 179.9), (3, 0.0, 90.0)],
        "point_id long, lat double, lon double",
    )
    prb = spark.createDataFrame(
        [(10, 0.0, 179.9), (20, 0.0, -179.9), (30, 0.0, -90.0)],
        "probe_id long, lat double, lon double",
    )
    out = radius_join(pts, prb, radius_km=500.0).collect()
    pairs = [(r.probe_id, r.point_id) for r in out]
    assert sorted(pairs) == [(10, 1), (10, 2), (20, 1), (20, 2)]
    # no duplicate pairs from the wrapped cells
    assert len(pairs) == len(set(pairs))
    d = {(r.probe_id, r.point_id): r.dist_km for r in out}
    assert 20.0 < d[(10, 1)] < 25.0  # true seam distance, not ~360°
    assert d[(10, 2)] == 0.0


def test_radius_join_rejects_radius_wider_than_grid(spark):
    import pytest

    from calp_cva_tracking_pipeline_spark.operators.geo import radius_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0)], "point_id long, lat double, lon double"
    )
    with pytest.raises(ValueError, match="360"):
        radius_join(
            pts,
            pts.withColumnRenamed("point_id", "probe_id"),
            radius_km=20000.0,
            probe_cols=("probe_id", "lat", "lon"),
            max_abs_lat=89.0,
        )


# ---------------------------------------------------------------------------
# 3. epoch_plan arithmetic survives web-scale token counts.
# ---------------------------------------------------------------------------


def test_epoch_plan_webscale_tokens_no_overflow(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        epoch_plan,
    )

    big, small = 4_000_000_000_000_000_000, 100
    budget = 8_000_000_000_000_000_000
    df = spark.createDataFrame(
        [("big", big), ("small", small)], "source string, toks long"
    )
    out = {
        r.source: r
        for r in epoch_plan(
            df,
            "source",
            F.col("toks"),
            weights={"big": 1.0, "small": 0.5},
            budget_tokens=budget,
            max_epochs_milli=10000,
        ).collect()
    }
    # target 8e18, raw product 8e21 (would overflow int64): 2 passes
    assert out["big"].epochs_milli == 2000 and not out["big"].capped
    assert out["big"].shortfall_tokens == 0
    # small source capped at 10 passes; supplied = 10000*100 div 1000
    assert out["small"].epochs_milli == 10000 and out["small"].capped
    assert out["small"].shortfall_tokens == budget // 2 - 1000


# ---------------------------------------------------------------------------
# 4. frame digests include dimensions: reshapes are not duplicates.
# ---------------------------------------------------------------------------


def test_frame_dedup_reshaped_frames_stay_distinct(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.videoseq import (
        encode_frsq,
        frame_dedup_groups,
    )

    px = bytes(range(18))  # 6 pixels RGB, same byte sequence both ways
    v_2x3 = encode_frsq([encode_bmp(2, 3, px)])
    v_3x2 = encode_frsq([encode_bmp(3, 2, px)])
    v_dup = encode_frsq([encode_bmp(2, 3, px)])
    df = spark.createDataFrame(
        [(1, v_2x3), (2, v_3x2), (3, v_dup)], "doc_id long, payload binary"
    )
    out = frame_dedup_groups(df, "doc_id", "payload", min_group=2).collect()
    # only the true same-dims duplicate groups; the 3x2 reshape does not
    assert len(out) == 1
    g = out[0]
    assert (g.n_frames, g.n_videos, g.rep_media) == (2, 2, 1)


# ---------------------------------------------------------------------------
# 5. time_split returns the empty audit frame on an all-NULL time axis.
# ---------------------------------------------------------------------------


def test_time_split_all_null_ts_returns_empty(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        time_split,
    )

    df = spark.createDataFrame(
        [(i, None) for i in range(5)], "id long, ts timestamp"
    )
    out = time_split(df, "ts")
    assert out.columns == ["split", "n_rows", "min_ts", "max_ts"]
    assert out.count() == 0
