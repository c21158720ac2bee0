"""Round-12 wave-54 operator pins: LSH banding tuner — hand-built
corpus with independently derived truth, plus the monotone-curve
property."""

from __future__ import annotations

import pytest


def test_lsh_tuner_hand_corpus(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        lsh_banding_tuner,
    )

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf"
    rows = [
        (1, base),
        (2, base + " zz"),              # near-dup of 1 (high Jaccard)
        (3, "x0 x1 x2 x3 x4 x5 x6 x7"),  # unrelated
        (4, base),                       # exact dup of 1 — collapses
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.bands: r
        for r in lsh_banding_tuner(
            df, "doc_id", "text", max_eval_id=100,
            threshold_micro=500_000, num_hashes=16,
            band_configs=(2, 4, 8),
        ).collect()
    }
    assert set(out) == {2, 4, 8}
    for r in out.values():
        # exactly one true pair (1,2); exact dup collapsed first
        assert r.n_true_pairs == 1
        assert r.rows_per_band == 16 // r.bands
        assert r.n_hit <= r.n_cand_pairs
    # recall is monotonically non-decreasing in bands (shorter keys
    # can only add candidates)
    assert (
        out[2].n_cand_pairs <= out[4].n_cand_pairs <= out[8].n_cand_pairs
    )
    assert out[8].recall_ppm >= out[4].recall_ppm >= out[2].recall_ppm


def test_lsh_tuner_rejects_non_divisor_bands(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        lsh_banding_tuner,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        lsh_banding_tuner(
            df, "doc_id", "text", max_eval_id=10, band_configs=(3,)
        )


def test_lsh_tuner_empty_slice_keeps_shape(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        lsh_banding_tuner,
    )

    df = spark.createDataFrame(
        [(500, "beyond the slice")], "doc_id long, text string"
    )
    out = lsh_banding_tuner(
        df, "doc_id", "text", max_eval_id=100, band_configs=(2, 4)
    ).collect()
    assert [(r.bands, r.n_true_pairs, r.n_cand_pairs, r.recall_ppm)
            for r in out] == [(2, 0, 0, None), (4, 0, 0, None)]
