"""Round-12 wave-55 operator pins: spatial k-NN join, per-video
summary gate — hand-built inputs with independently derived values."""

from __future__ import annotations


def test_knn_points_hand_geometry(spark):
    from calp_cva_tracking_pipeline_spark.operators.geo import knn_points

    # probe at origin; points on the equator at ~111.19 km/degree
    pts = spark.createDataFrame(
        [
            (1, 0.0, 1.0),   # ~111 km
            (2, 0.0, 2.0),   # ~222 km
            (3, 0.0, 3.0),   # ~334 km
            (4, 0.0, 9.0),   # ~1000 km — outside radius
        ],
        "point_id long, lat double, lon double",
    )
    prb = spark.createDataFrame(
        [(10, 0.0, 0.0)], "probe_id long, lat double, lon double"
    )
    out = knn_points(pts, prb, radius_km=500.0, k=2).collect()
    assert [(r.point_id, r.rank) for r in out] == [(1, 1), (2, 2)]
    # sparse neighborhood: raising k past the in-radius count returns
    # what exists, never a far fill
    out3 = knn_points(pts, prb, radius_km=500.0, k=5).collect()
    assert [r.point_id for r in out3] == [1, 2, 3]


def test_knn_points_tie_breaks_on_id(spark):
    from calp_cva_tracking_pipeline_spark.operators.geo import knn_points

    pts = spark.createDataFrame(
        [(7, 0.0, 1.0), (3, 0.0, -1.0)],  # equidistant from origin
        "point_id long, lat double, lon double",
    )
    prb = spark.createDataFrame(
        [(10, 0.0, 0.0)], "probe_id long, lat double, lon double"
    )
    out = knn_points(pts, prb, radius_km=200.0, k=2).collect()
    assert [(r.point_id, r.rank) for r in out] == [(3, 1), (7, 2)]


def _frsq(frames_px, w, h):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.videoseq import (
        encode_frsq,
    )

    payloads = []
    for px in frames_px:
        rgb = b"".join(bytes((v, v, v)) for v in px)
        payloads.append(encode_bmp(w, h, rgb))
    return encode_frsq(payloads)


def test_video_summary_hand_video(spark):
    from calp_cva_tracking_pipeline_spark.operators.videoseq import (
        video_summary,
    )

    # 4 frames of 2x2: two identical dark frames, then a hard cut to
    # two DISTINCT bright frames -> n_cuts=1, distinct=3, dup ppm=25%
    dark = [10, 10, 10, 10]
    bright_a = [200, 200, 200, 200]
    bright_b = [200, 200, 200, 201]
    vid = _frsq([dark, dark, bright_a, bright_b], 2, 2)
    df = spark.createDataFrame(
        [(1, vid), (2, b"junk")], "doc_id long, payload binary"
    )
    out = video_summary(df, "doc_id", "payload").collect()
    assert len(out) == 1  # undecodable container drops
    r = out[0]
    assert (r.media_id, r.n_frames, r.n_cuts, r.n_distinct_frames) == (
        1, 4, 1, 3,
    )
    assert r.dup_frame_ppm == 250_000
    # mean luma: (40 + 40 + 800 + 801) * 1000 div 16 px
    assert r.mean_mluma == (40 + 40 + 800 + 801) * 1000 // 16


def test_video_summary_threshold_separates_fades(spark):
    from calp_cva_tracking_pipeline_spark.operators.videoseq import (
        video_summary,
    )

    # gentle ramp 10 -> 18 (step 8000 milli-luma women) is NOT a cut
    # at the 20000 threshold but IS at 5000
    frames = [[10] * 4, [18] * 4, [26] * 4]
    vid = _frsq(frames, 2, 2)
    df = spark.createDataFrame([(1, vid)], "doc_id long, payload binary")
    hard = video_summary(
        df, "doc_id", "payload", threshold_milli=20000
    ).collect()[0]
    soft = video_summary(
        df, "doc_id", "payload", threshold_milli=5000
    ).collect()[0]
    assert (hard.n_cuts, soft.n_cuts) == (0, 2)
