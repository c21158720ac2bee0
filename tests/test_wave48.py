"""Round-12 wave-48 operator pins: Theil-Sen trend, candidate-key
audit, contrastive triplets, clustering depth — hand-built inputs with
independently derived values, plus plan shapes."""

from __future__ import annotations

import datetime as dt


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_theil_sen_hand_series(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        theil_sen_trend,
    )

    rows = [
        # key a: days 1,2,3 values 1,2,30 (day-3 spike). slopes:
        # (2-1)/1=1, (30-1)/2=14.5, (30-2)/1=28 -> median 14.5?? no:
        # sorted [1, 14.5, 28], lower median idx (3+1)//2=2 -> 14.5
        ("a", dt.datetime(2024, 1, 1, 9), 1.0),
        ("a", dt.datetime(2024, 1, 2, 9), 2.0),
        ("a", dt.datetime(2024, 1, 3, 9), 30.0),
        # key b: two same-day rows average to (1+3)/2=2, then day 2 at
        # 5 -> single slope 3.0/day
        ("b", dt.datetime(2024, 1, 1, 9), 1.0),
        ("b", dt.datetime(2024, 1, 1, 10), 3.0),
        ("b", dt.datetime(2024, 1, 2, 9), 5.0),
        # key c: one day only -> excluded
        ("c", dt.datetime(2024, 1, 1, 9), 7.0),
        ("a", None, 9.0),  # dropped
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {
        r.event_type: r
        for r in theil_sen_trend(
            df, "event_type", "ts", "value"
        ).collect()
    }
    assert set(out) == {"a", "b"}
    a = out["a"]
    assert (a.n_days, a.n_slopes) == (3, 3)
    assert a.slope_nano_per_day == 14_500_000_000
    b = out["b"]
    assert (b.n_days, b.n_slopes, b.slope_nano_per_day) == (
        2, 1, 3_000_000_000,
    )


def test_theil_sen_window_keeps_trailing_days(spark):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        theil_sen_trend,
    )

    # 4 days with an old outlier; window_days=2 keeps only days 3,4
    rows = [
        ("a", dt.datetime(2024, 1, 1, 9), 1000.0),
        ("a", dt.datetime(2024, 1, 2, 9), 1.0),
        ("a", dt.datetime(2024, 1, 3, 9), 2.0),
        ("a", dt.datetime(2024, 1, 4, 9), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = theil_sen_trend(
        df, "event_type", "ts", "value", window_days=2
    ).collect()
    assert len(out) == 1
    assert (out[0].n_days, out[0].slope_nano_per_day) == (
        2, 1_000_000_000,
    )


def test_candidate_keys_hand_rows(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        candidate_keys,
    )

    df = spark.createDataFrame(
        [
            (1, "x", "k1"),
            (2, "x", "k2"),
            (3, "y", "k2"),
            (4, None, "k3"),
            (5, None, "k3"),
        ],
        "id long, grp string, k string",
    )
    out = {
        r.combo: r
        for r in candidate_keys(
            df, [["id"], ["grp"], ["grp", "k"]]
        ).collect()
    }
    assert out["id"].is_key and out["id"].uniqueness_ppm == 1_000_000
    g = out["grp"]
    # groups: x, y, NULL -> 3 groups over 5 rows
    assert (g.n_rows, g.n_groups, g.dup_rows, g.is_key) == (
        5, 3, 2, False,
    )
    assert g.uniqueness_ppm == 600_000
    gk = out["grp+k"]
    # (x,k1),(x,k2),(y,k2),(NULL,k3)x2 -> 4 groups
    assert (gk.n_groups, gk.dup_rows, gk.is_key) == (4, 1, False)


def test_contrastive_triplets_hand_labels(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        contrastive_triplets,
    )

    df = spark.createDataFrame(
        [
            (1, 10), (3, 10), (5, 10),  # label 10: ids 1,3,5
            (2, 20), (4, 20),           # label 20: ids 2,4
            (9, 30),                    # label 30: singleton -> none
            (7, None),                  # NULL label excluded
        ],
        "vec_id long, label int",
    )
    out = {
        r.anchor_id: r
        for r in contrastive_triplets(df, "vec_id", "label").collect()
    }
    # singleton label 30 emits no triplet; labels 10 (3 anchors) and
    # 20 (2 anchors) emit 5 triplets
    assert set(out) == {1, 2, 3, 4, 5}
    # label 10 positives are cyclic next member: 1->3, 3->5, 5->1
    assert (out[1].positive_id, out[3].positive_id,
            out[5].positive_id) == (3, 5, 1)
    # label 10's negative label is 20 (next in label order); positions
    # 0,1,2 mod sz(20)=2 -> members of 20 at pos 0,1,0 = ids 2,4,2
    assert (out[1].negative_label, out[1].negative_id) == (20, 2)
    assert (out[3].negative_label, out[3].negative_id) == (20, 4)
    assert (out[5].negative_label, out[5].negative_id) == (20, 2)
    # label 20's negative label is 30 (then cyclic back to 10 only for
    # label 30, which emits nothing) — sz(30)=1 so both anchors get id 9
    assert (out[2].negative_label, out[2].negative_id) == (30, 9)
    assert (out[4].negative_label, out[4].negative_id) == (30, 9)
    # every triplet's negative label provably differs from its label
    for r in out.values():
        assert r.negative_label != r.label


def test_contrastive_triplets_single_label_emits_nothing(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        contrastive_triplets,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 10)], "vec_id long, label int"
    )
    assert contrastive_triplets(df, "vec_id", "label").count() == 0


def test_clustering_depth_hand_cells(spark):
    from calp_cva_tracking_pipeline_spark.operators.layout import (
        clustering_depth,
    )

    cells = spark.createDataFrame(
        [
            # group g1: [0,10],[5,15] overlap each other; [20,30] alone
            ("g1", 0, 10),
            ("g1", 5, 15),
            ("g1", 20, 30),
            # group g2: two IDENTICAL ranges -> multiplicity 2, each
            # overlapping both -> depth 2
            ("g2", 0, 1),
            ("g2", 0, 1),
            ("g3", 0, 1),
            ("g3", None, 5),  # NULL bound excluded
        ],
        "grp string, lo int, hi int",
    )
    out = {
        r.grp: r
        for r in clustering_depth(cells, "grp", "lo", "hi").collect()
    }
    g1 = out["g1"]
    # depths: 2,2,1 -> avg 5/3 = 1666 milli, max 2
    assert (g1.n_cells, g1.avg_depth_milli, g1.max_depth) == (3, 1666, 2)
    g2 = out["g2"]
    assert (g2.n_cells, g2.avg_depth_milli, g2.max_depth) == (2, 2000, 2)
    g3 = out["g3"]
    assert (g3.n_cells, g3.avg_depth_milli, g3.max_depth) == (1, 1000, 1)


def test_theil_sen_no_pair_shuffle(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.ts_theil_sen(spark, sf_dir))
    # slopes are generated inside the collected array: no self-join,
    # no cartesian, no Python workers
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_contrastive_plan_broadcasts_label_index_only(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.mx_contrastive_pairs(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
