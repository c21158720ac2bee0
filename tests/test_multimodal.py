"""Multimodal plumbing: schema, batch shape, and deterministic stub decode.

The codec libraries are not in this container (PIL/ffmpeg), so decode runs
the clearly-marked deterministic stub; what these tests pin down is the REAL
part — the mapInPandas contract (schema, null payloads, status column) that
a deployment swaps real codecs into.
"""

from __future__ import annotations

from calp_cva_tracking_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZE_SCHEMA,
    _decode_stub,
    extract_features,
    resize_images,
    sample_frames,
)


def _media_df(spark):
    rows = [
        (1, "image", bytes([0, 1, 2, 3, 4, 5, 6, 7]) * 4, "image/png", 8, 8, None),
        (2, "audio", bytes([7] * 16), "audio/wav", None, None, 1000),
        (3, "video", None, "video/mp4", 640, 480, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_status(spark):
    out = extract_features(_media_df(spark))
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3
    # container has no PIL -> everything stubbed, never silently 'ok'
    assert {r["decode_ok"] for r in rows.values()} == {"stubbed"}
    # deterministic: feature equals the pure-python stub on the same payload
    assert rows[1]["feature"] == _decode_stub(bytes([0, 1, 2, 3, 4, 5, 6, 7]) * 4)
    # null payload -> zero vector, not a crash
    assert rows[3]["feature"] == [0.0] * 8
    # histogram features are normalized
    assert abs(sum(rows[2]["feature"]) - 1.0) < 1e-9


def test_extract_features_partitioned(spark):
    # batch shape: repartitioned input still yields one row per media row
    df = _media_df(spark).repartition(3)
    assert extract_features(df).count() == 3


def test_resize_images_stub_contract(spark):
    out = resize_images(_media_df(spark), width=4, height=4)
    assert out.schema == RESIZE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3
    # stubbed payloads are exactly width*height bytes; null stays null
    assert len(rows[1]["payload"]) == 16
    assert rows[3]["payload"] is None
    assert {r["decode_ok"] for r in rows.values()} == {"stubbed"}
    assert {(r["width"], r["height"]) for r in rows.values()} == {(4, 4)}


def test_sample_frames_fanout(spark):
    out = sample_frames(_media_df(spark), every_ms=500, max_frames=4)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # id 2: duration 1000ms / 500ms -> 2 frames; id 3: null payload skipped;
    # id 1: null duration skipped
    assert set(by_media) == {2}
    frames = sorted(by_media[2], key=lambda r: r["frame_index"])
    assert [f["frame_ms"] for f in frames] == [0, 500]
    # deterministic even byte slicing
    assert frames[0]["payload"] == bytes([7] * 8)
