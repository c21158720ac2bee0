"""Round-12 wave-51 operator pins: audio VAD segmentation, IVF
cell-balance advisor — hand-built inputs with independently derived
values, plus plan shapes."""

from __future__ import annotations

import struct


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _wav(samples: list[int], rate: int = 8000) -> bytes:
    from calp_cva_tracking_pipeline_spark.operators.wav_stdlib import (
        encode_wav,
    )

    frames = b"".join(struct.pack("<h", int(v)) for v in samples)
    return encode_wav(rate, 1, 2, frames)


def test_audio_vad_hand_clips(spark):
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        audio_vad_segments,
    )

    # 64 samples, 4 frames of 16: loud-silent-loud-loud ->
    # segments [0,0] and [2,3]
    loud, quiet = 10_000, 0
    clip1 = (
        [loud] * 16 + [quiet] * 16 + [loud] * 16 + [loud] * 16
    )
    # all-equal energy: strict mean threshold -> no segments
    clip2 = [5_000] * 64
    # undecodable payload drops
    rows = [
        (1, _wav(clip1)),
        (2, _wav(clip2)),
        (3, b"not a wav"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = [
        (r.media_id, r.seg_start, r.seg_end, r.n_frames)
        for r in audio_vad_segments(
            df, "doc_id", "payload", frames=4
        ).collect()
    ]
    assert out == [(1, 0, 0, 1), (1, 2, 3, 2)]


def test_audio_vad_single_active_frame(spark):
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        audio_vad_segments,
    )

    # only frame 1 loud -> one 1-frame segment
    clip = [0] * 16 + [20_000] * 16 + [0] * 16 + [0] * 16
    df = spark.createDataFrame(
        [(7, _wav(clip))], "doc_id long, payload binary"
    )
    out = audio_vad_segments(df, "doc_id", "payload", frames=4).collect()
    assert [(r.seg_start, r.seg_end, r.n_frames) for r in out] == [
        (1, 1, 1)
    ]


def test_ivf_cell_balance_hand_cells(spark):
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        ivf_cell_balance,
    )

    # 2 centroids (ids 0, 1): vectors cluster 6-vs-2 by construction
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0])] + [
        (i, [0.1 * i, 0.0]) for i in range(2, 7)
    ] + [(7, [10.0, 9.5])]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = {
        r.cell: r
        for r in ivf_cell_balance(
            df, "vec_id", "embedding", cell_cap=4, n_centroids=2
        ).collect()
    }
    big, small = out[0], out[1]
    assert (big.n_vecs, small.n_vecs) == (6, 2)
    assert big.oversized and big.split_into == 2  # ceil(6/4)
    assert not small.oversized and small.split_into == 1
    assert big.share_ppm == 750_000 and small.share_ppm == 250_000


def test_ivf_cell_balance_prebuilt_requires_centroids(spark):
    import pytest

    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        ivf_cell_balance,
    )

    df = spark.createDataFrame(
        [(0, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="requires the `centroids`"):
        ivf_cell_balance(df, "vec_id", "embedding", cell_cap=4, cells=df)


def test_wave51_plan_shapes(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.ann_cell_balance(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the VAD pipe's only Python stages are the WAV encode + the
    # energy-frame decode kernel (Arrow-batched mapInPandas), never a
    # row-at-a-time UDF
    vplan = _executed(S.mm_audio_vad(spark, sf_dir))
    assert "BatchEvalPython" not in vplan
    assert vplan.count("MapInPandas") == 2
