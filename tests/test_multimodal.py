"""Multimodal plumbing: schema, batch shape, and deterministic stub decode.

The codec libraries are not in this container (PIL/ffmpeg), so decode runs
the clearly-marked deterministic stub; what these tests pin down is the REAL
part — the mapInPandas contract (schema, null payloads, status column) that
a deployment swaps real codecs into.
"""

from __future__ import annotations

from calp_cva_tracking_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    _decode_stub,
    extract_features,
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
