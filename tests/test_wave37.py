"""Round-11 wave-37 operator pins: video-level near-dup, hard-negative
mining, incremental IVF audit, exact-substring duplicate-run spans —
hand-built inputs with independently-derived expectations."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_video_neardup_pairs_hand_videos(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.videoseq import (
        encode_frsq,
        video_neardup_pairs,
    )

    def frame(level):
        return encode_bmp(4, 4, bytes((level,) * 48))

    A, B, C, D = frame(10), frame(20), frame(30), frame(40)
    rows = [
        (1, encode_frsq([A, B])),        # shares A,B with 2; A with 3
        (2, encode_frsq([A, B, C])),     # shares A with 3
        (3, encode_frsq([A, A, D])),     # duplicate frame collapses
        (4, encode_frsq([frame(99)])),   # isolated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        (r.id_a, r.id_b): r
        for r in video_neardup_pairs(df, "doc_id", "payload").collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    # v1={A,B} v2={A,B,C}: shared 2, jacc = 2/3
    r = out[(1, 2)]
    assert (r.shared_frames, r.n_frames_a, r.n_frames_b) == (2, 2, 3)
    assert r.jaccard_ppm == 1_000_000 * 2 // 3
    # v3's duplicate A counts once: {A,D}
    r = out[(1, 3)]
    assert (r.shared_frames, r.n_frames_a, r.n_frames_b) == (1, 2, 2)
    assert r.jaccard_ppm == 1_000_000 // 3


def test_video_neardup_single_decode_stage(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.videoseq import (
        encode_frsq,
        video_neardup_pairs,
    )

    f = encode_bmp(2, 2, bytes(12))
    df = spark.createDataFrame(
        [(i, encode_frsq([f])) for i in range(4)],
        "doc_id long, payload binary",
    )
    out = video_neardup_pairs(df, "doc_id", "payload")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the decode must be planned once (bucketed pair expansion, not a
    # self-join of the decode-derived frame); the per-video size join
    # reuses the distinct exchange
    assert plan.count("ArrowEvalPython") <= 1, plan.count("ArrowEvalPython")


def test_hard_negatives_labels_and_order(spark):
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        hard_negatives,
    )

    # anchors at the axes; one same-label near-duplicate that MUST be
    # skipped in favor of a farther different-label vector
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.01], 0),   # same label as anchor 0 — never a negative
        (2, [0.9, 0.1], 1),     # hardest valid negative for anchor 0
        (3, [0.0, 1.0], 1),
        (4, [-1.0, 0.0], 2),
        (5, [0.5, 0.5], None),  # unlabeled: excluded by contract
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, label int")
    q = df.filter(F.col("vec_id") == 0)
    out = hard_negatives(
        df, q, "vec_id", "v", "label", "vec_id", "v", "label",
        n_centroids=1, nprobe=1, k=2,
    ).collect()
    assert [r.negative_id for r in out] == [2, 3]
    assert all(r.negative_label != r.query_label for r in out)
    assert out[0].cosine > out[1].cosine


def test_ivf_incremental_audit_invariants(spark):
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        ivf_incremental_audit,
    )

    base = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 7) % 5)]) for i in range(40)],
        "vec_id long, v array<double>",
    )
    inc = spark.createDataFrame(
        [(100 + i, [float(i % 4) + 0.25, 0.0]) for i in range(12)],
        "vec_id long, v array<double>",
    )
    out = ivf_incremental_audit(base, inc, "vec_id", "v", n_centroids=4)
    rows = out.collect()
    assert len(rows) == 4  # every centroid reports, hot or dead
    assert sum(r.n_base for r in rows) == 40
    assert sum(r.n_new for r in rows) == 12
    for r in rows:
        if r.n_base > 0:
            assert r.growth_ppm == 1_000_000 * r.n_new // r.n_base
        else:
            assert r.growth_ppm is None
        if r.n_new == 0:
            assert r.mean_d2_new is None and r.d2_drift is None


def test_duplicate_run_spans_hand_docs(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        duplicate_run_spans,
    )

    shared = " ".join(f"s{i}" for i in range(10))  # 10 shared tokens
    rows = [
        # shared run sits at tokens 3..12 of doc 1, 1..10 of doc 2
        (1, "a b c " + shared + " z z2 z3"),
        (2, shared + " q1 q2 q3 q4"),
        # doc 3: internal repetition only — must NOT mark
        (3, " ".join(["r1 r2 r3 r4 r5 r6 r7 r8"] * 2)),
        (4, "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_run_spans(df, "doc_id", "text", k=8).collect()
    got = {(r.doc_id): (r.span_start, r.span_end, r.n_grams) for r in out}
    # doc 1: grams at 0-based starts 3,4,5 (k=8 inside the 10-token
    # shared run shifted by 3) -> 1-based span [4, 13], 3 grams
    assert got[1] == (4, 13, 3)
    # doc 2: starts 0,1,2 -> span [1, 10]
    assert got[2] == (1, 10, 3)
    assert 3 not in got and 4 not in got
    assert len(out) == 2
