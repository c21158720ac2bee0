"""Round-12 wave-47 operator pins: embedding decontamination, local
clustering census, readability profile, DAU/MAU stickiness — hand-built
inputs with independently derived values, plus the plan shapes the scale
claims depend on."""

from __future__ import annotations

import datetime as dt


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_embedding_decontam_hand_vectors(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        embedding_decontam,
    )

    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [1.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(100, [2.0, 0.0]), (101, [-1.0, 0.0]), (102, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.eval_id: r
        for r in embedding_decontam(
            train, ev, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    # eval 100 == direction of train 1 -> cosine 1.0, contaminated
    assert (out[100].train_id, out[100].cosine, out[100].contaminated) == (
        1, 1.0, True,
    )
    # eval 101 is opposite train 1; best is train 2 or 3 at cos 0 /
    # -0.707...: cos(101,2)=0, cos(101,3)=-0.707 -> train 2 wins
    assert (out[101].train_id, out[101].cosine, out[101].contaminated) == (
        2, 0.0, False,
    )
    # eval 102 ties train 3 exactly (cos 1.0); 1 and 2 give 0.707107;
    # max cosine wins regardless of id
    assert (out[102].train_id, out[102].cosine, out[102].contaminated) == (
        3, 1.0, True,
    )


def test_embedding_decontam_tie_breaks_to_lowest_train_id(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        embedding_decontam,
    )

    # two identical train vectors: the argmax must pick the LOWER id
    train = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(50, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    row = embedding_decontam(
        train, ev, "vec_id", "embedding"
    ).collect()[0]
    assert row.train_id == 3 and row.cosine == 1.0


def test_embedding_decontam_broadcasts_eval_never_shuffles_train(
    spark, sf_dir
):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.dd_embed_contam(spark, sf_dir))
    # the corpus side must reach the argmax through a broadcast join +
    # partial aggregate, not an all-pairs exchange
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan  # map-side combine of the argmax struct


def test_local_clustering_hand_graph(spark):
    from calp_cva_tracking_pipeline_spark.operators.graph import (
        local_clustering_census,
    )

    # triangle 1-2-3 plus pendant 3-4: cc(1)=cc(2)=1.0 (deg 2, 1 tri),
    # cc(3)= 2*1/(3*2) = 1/3 -> 333333 ppm band 3; node 4 deg 1 excluded
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    out = {
        r.band: r for r in local_clustering_census(edges).collect()
    }
    assert set(out) == {3, 10}
    assert (out[10].n_nodes, out[10].mean_cc_ppm) == (2, 1_000_000)
    assert (out[3].n_nodes, out[3].mean_cc_ppm) == (1, 333_333)


def test_local_clustering_open_wedge_counts_zero_band(spark):
    from calp_cva_tracking_pipeline_spark.operators.graph import (
        local_clustering_census,
    )

    # path 1-2-3: node 2 has deg 2 and no triangle -> cc 0, band 0;
    # duplicate + reversed + self-loop edges normalize away
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 3)], "src long, dst long"
    )
    out = local_clustering_census(edges).collect()
    assert len(out) == 1
    assert (out[0].band, out[0].n_nodes, out[0].mean_cc_ppm) == (0, 1, 0)


def test_local_clustering_no_cartesian_no_python(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.gr_local_clustering(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_readability_hand_docs(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        readability_profile,
    )

    docs = spark.createDataFrame(
        [
            # 4 words, 2 sentences, syllable groups: "the"(1 e) "cat"(1 a)
            # "sat"(1 a) "down"(1 o+w? 'ow' is one [aeiouy]+ run) -> 4
            (1, "The cat sat. Down!", "a"),
            # no terminal punctuation -> sentences floored at 1;
            # "hello"(e,o=2) "world"(o=1) -> 3 syllable runs, 2 words
            (2, "hello world", "a"),
            (3, None, "a"),  # dropped: NULL text
            (4, "?!...", "a"),  # dropped: zero words
            (5, "aaa", "b"),  # 1 word, 1 sentence (floor), 1 run
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.source: r for r in readability_profile(docs).collect()
    }
    a = out["a"]
    assert (a.n_docs, a.n_words, a.n_sentences, a.n_syllables) == (
        2, 6, 3, 7,
    )
    assert a.wps_milli == 2000  # 1000*6//3
    assert a.spw_milli == 1166  # 1000*7//6
    # 206835 - 1015*2000//1000 - 84600*1166//1000
    assert a.flesch_milli == 206835 - 2030 - 98643
    b = out["b"]
    assert (b.n_words, b.n_sentences, b.n_syllables) == (1, 1, 1)
    assert (b.wps_milli, b.spw_milli) == (1000, 1000)


def test_readability_single_exchange(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.tx_readability(spark, sf_dir))
    # one group-keyed exchange (+ the orderBy range partition); regex
    # counting must stay in the scan stage, not a Python worker
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stickiness_hand_events(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        stickiness,
    )

    rows = [
        # Jan: u1 active 2 days, u2 active 1 day -> dau_sum 3 over
        # 2 observed days, mau 2 -> 1e6*3//(2*2) = 750000
        (1, dt.datetime(2024, 1, 1, 9), "u1"),
        (2, dt.datetime(2024, 1, 1, 10), "u1"),  # same day dedupes
        (3, dt.datetime(2024, 1, 2, 9), "u1"),
        (4, dt.datetime(2024, 1, 2, 11), "u2"),
        # Feb: single user single day -> 1000000
        (5, dt.datetime(2024, 2, 5, 9), "u3"),
        (6, None, "u4"),  # dropped
        (7, dt.datetime(2024, 2, 6, 9), None),  # dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string"
    )
    out = {
        str(r.month): r for r in stickiness(df).collect()
    }
    jan = out["2024-01-01"]
    assert (jan.n_days, jan.dau_sum, jan.mau, jan.stickiness_ppm) == (
        2, 3, 2, 750_000,
    )
    feb = out["2024-02-01"]
    assert (feb.n_days, feb.dau_sum, feb.mau, feb.stickiness_ppm) == (
        1, 1, 1, 1_000_000,
    )


def test_stickiness_null_segment_is_a_category(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        stickiness,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1, 9), "u1", "click"),
        (2, dt.datetime(2024, 1, 1, 9), "u2", None),
        (3, dt.datetime(2024, 1, 2, 9), "u2", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id string, event_type string",
    )
    out = {
        r.event_type: r
        for r in stickiness(df, segment_col="event_type").collect()
    }
    assert set(out) == {"click", None}
    n = out[None]
    assert (n.n_days, n.dau_sum, n.mau, n.stickiness_ppm) == (
        2, 2, 1, 1_000_000,
    )
