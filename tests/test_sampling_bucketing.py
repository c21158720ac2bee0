"""Stratified split / class weights (M2-adjacent) and bucketed co-located
joins (the pay-the-shuffle-once storage strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.sampling import (
    class_weights,
    stratified_split,
)
from calp_cva_tracking_pipeline_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)


def _labeled(spark, n=4000):
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 4 == 0, "Full").otherwise("Partial").alias("label"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )


def test_stratified_split_deterministic_and_stratified(spark):
    df = _labeled(spark)
    train, test = stratified_split(df, "label", 0.8, seed=42, id_col="id")
    # partition-independent: identical split after a repartition
    train2, _ = stratified_split(
        df.repartition(13), "label", 0.8, seed=42, id_col="id"
    )
    assert {r["id"] for r in train.collect()} == {
        r["id"] for r in train2.collect()
    }
    # disjoint and complete
    assert train.count() + test.count() == 4000
    assert train.join(test, "id").count() == 0
    # ~80/20 within EACH label
    for frame, lo, hi in ((train, 0.75, 0.85), (test, 0.15, 0.25)):
        per_label = {
            r["label"]: r["n"]
            for r in frame.groupBy("label").agg(F.count("*").alias("n")).collect()
        }
        assert lo < per_label["Full"] / 1000 < hi
        assert lo < per_label["Partial"] / 3000 < hi
    # different seed -> different split
    train3, _ = stratified_split(df, "label", 0.8, seed=7, id_col="id")
    assert {r["id"] for r in train3.collect()} != {
        r["id"] for r in train.collect()
    }


def test_class_weights_inverse_frequency(spark):
    w = {
        r["label"]: r["weight"]
        for r in class_weights(_labeled(spark), "label").collect()
    }
    assert w["Full"] == pytest.approx(4000 / 1000)
    assert w["Partial"] == pytest.approx(4000 / 3000)


def test_class_weights_is_lazy(spark):
    # composing class_weights must not fire a job (the old implementation
    # ran an eager df.count() at build time)
    sc = spark.sparkContext
    before = len(sc.statusTracker().getJobIdsForGroup(None))
    df = class_weights(_labeled(spark), "label")
    after = len(sc.statusTracker().getJobIdsForGroup(None))
    assert after == before
    assert set(df.columns) == {"label", "n", "weight"}


def test_classification_metrics_per_class(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        classification_metrics,
    )

    rows = [
        # label, pred: Full 3x correct, 1x miss->Partial;
        # Partial 2x correct, 2x miss->Full; None never predicted
        ("Full", "Full"), ("Full", "Full"), ("Full", "Full"),
        ("Full", "Partial"),
        ("Partial", "Partial"), ("Partial", "Partial"),
        ("Partial", "Full"), ("Partial", "Full"),
        ("None", "Full"),
    ]
    df = spark.createDataFrame(rows, ["label", "pred"])
    m = {
        r["label"]: r.asDict()
        for r in classification_metrics(df, "label", "pred").collect()
    }
    assert set(m) == {"Full", "Partial", "None"}
    # Full: tp=3, predicted=3+2+1=6, support=4
    assert m["Full"]["tp"] == 3
    assert m["Full"]["precision"] == pytest.approx(3 / 6)
    assert m["Full"]["recall"] == pytest.approx(3 / 4)
    p, r = 3 / 6, 3 / 4
    assert m["Full"]["f1"] == pytest.approx(2 * p * r / (p + r))
    # Partial: tp=2, predicted=3, support=4
    assert m["Partial"]["precision"] == pytest.approx(2 / 3)
    assert m["Partial"]["recall"] == pytest.approx(2 / 4)
    # None: never predicted -> null precision; support=1, tp=0 -> recall 0
    assert m["None"]["predicted"] == 0
    assert m["None"]["precision"] is None
    assert m["None"]["recall"] == pytest.approx(0.0)
    assert m["None"]["f1"] is None
    # overall accuracy derives as sum(tp)/sum(support)
    acc = sum(x["tp"] for x in m.values()) / sum(
        x["support"] for x in m.values()
    )
    assert acc == pytest.approx(5 / 9)


def test_classification_metrics_class_never_seen(spark):
    # a class that appears only in predictions: support=0 -> null recall
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        classification_metrics,
    )

    df = spark.createDataFrame(
        [("A", "A"), ("A", "B")], ["label", "pred"]
    )
    m = {
        r["label"]: r.asDict()
        for r in classification_metrics(df, "label", "pred").collect()
    }
    assert m["B"]["support"] == 0
    assert m["B"]["recall"] is None
    assert m["B"]["precision"] == pytest.approx(0.0)  # predicted 1, tp 0
    assert m["B"]["f1"] is None


def test_bucketed_join_elides_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        write_bucketed(left, "t_bucket_left", ["k"], 8, sort_cols=["k"])
        write_bucketed(right, "t_bucket_right", ["k"], 8, sort_cols=["k"])
        joined = read_table(spark, "t_bucket_left").join(
            read_table(spark, "t_bucket_right"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: no exchange anywhere in the join plan
        assert "Exchange" not in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_bucket_left")
        spark.sql("DROP TABLE IF EXISTS t_bucket_right")


def test_sample_per_key_deterministic_cap(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        sample_per_key,
    )

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
    )
    a = sample_per_key(df, "source", 50, id_col="doc_id")
    counts = {
        r["source"]: r["count"]
        for r in a.groupBy("source").count().collect()
    }
    assert counts == {"0": 50, "1": 50, "2": 50}
    # partition-independent: identical surviving ids on a reshuffled input
    b = sample_per_key(
        df.repartition(17), "source", 50, id_col="doc_id"
    )
    ids = lambda d: sorted(r["doc_id"] for r in d.collect())
    assert ids(a) == ids(b)
    # seed redraws; undersized groups pass through whole
    c = sample_per_key(df, "source", 50, seed=7, id_col="doc_id")
    assert ids(a) != ids(c)
    small = sample_per_key(df.limit(20), "source", 50, id_col="doc_id")
    assert small.count() == 20


def test_mixture_sample_deterministic_and_monotone(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(i, "web" if i % 2 else "wiki") for i in range(2000)],
        "doc_id bigint, source string",
    )
    kept = mixture_sample(
        df, "source", {"web": 0.5, "wiki": 0.2}, "doc_id", seed=3
    )
    ids = {r.doc_id for r in kept.collect()}
    # deterministic under repartitioning: identical survivor set
    ids2 = {
        r.doc_id
        for r in mixture_sample(
            df.repartition(13), "source", {"web": 0.5, "wiki": 0.2},
            "doc_id", seed=3,
        ).collect()
    }
    assert ids == ids2
    # realized fractions near targets (hash uniformity; 1000 rows/source)
    n_web = sum(1 for i in ids if i % 2)
    n_wiki = sum(1 for i in ids if not i % 2)
    assert abs(n_web / 1000 - 0.5) < 0.06
    assert abs(n_wiki / 1000 - 0.2) < 0.06
    # monotone: raising a fraction only ADDS rows
    bigger = {
        r.doc_id
        for r in mixture_sample(
            df, "source", {"web": 0.8, "wiki": 0.2}, "doc_id", seed=3
        ).collect()
    }
    assert ids <= bigger
    # different seed redraws
    redraw = {
        r.doc_id
        for r in mixture_sample(
            df, "source", {"web": 0.5, "wiki": 0.2}, "doc_id", seed=4
        ).collect()
    }
    assert redraw != ids


def test_mixture_sample_default_fraction_and_validation(spark):
    import pytest

    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], "doc_id bigint, source string"
    )
    # unlisted sources drop by default...
    assert mixture_sample(df, "source", {"a": 1.0}, "doc_id").count() == 1
    # ...or pass through with default_fraction=1.0
    assert (
        mixture_sample(
            df, "source", {"a": 1.0}, "doc_id", default_fraction=1.0
        ).count()
        == 3
    )
    with pytest.raises(ValueError):
        mixture_sample(df, "source", {"a": 1.5}, "doc_id")
    with pytest.raises(ValueError):
        mixture_sample(df, "source", {}, "doc_id", default_fraction=-0.1)


def test_sample_per_key_portable_partition_invariant_and_seeded(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        sample_per_key,
    )

    rows = [(f"k{i % 3}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, id long")
    a = sorted(
        map(
            tuple,
            sample_per_key(
                df.repartition(1), "k", 5, id_col="id", portable=True
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            sample_per_key(
                df.repartition(16), "k", 5, id_col="id", portable=True
            ).collect(),
        )
    )
    assert a == b and len(a) == 15
    # a different seed redraws the sample
    c = sorted(
        map(
            tuple,
            sample_per_key(
                df, "k", 5, seed=7, id_col="id", portable=True
            ).collect(),
        )
    )
    assert c != a


def test_temperature_weights_flatten_toward_uniform(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        temperature_weights,
    )

    rows = [("big",)] * 900 + [("small",)] * 100
    df = spark.createDataFrame(rows, "source string")
    out = {
        r["source"]: r
        for r in temperature_weights(df, "source", tau=0.5).collect()
    }
    assert out["big"]["share"] == 0.9 and out["small"]["share"] == 0.1
    # tau=0.5: q ∝ sqrt(p) -> 0.75 / 0.25
    assert abs(out["big"]["temp_share"] - 0.75) < 1e-6
    assert abs(out["small"]["temp_share"] - 0.25) < 1e-6
    # head downweights, tail upweights; shares sum to 1
    assert out["big"]["sample_weight"] < 1 < out["small"]["sample_weight"]
    # tau=1 keeps natural proportions (weight 1 everywhere)
    nat = {
        r["source"]: r["sample_weight"]
        for r in temperature_weights(df, "source", tau=1.0).collect()
    }
    assert nat == {"big": 1.0, "small": 1.0}
    # tau=0 is uniform over keys
    uni = {
        r["source"]: r["temp_share"]
        for r in temperature_weights(df, "source", tau=0.0).collect()
    }
    assert uni == {"big": 0.5, "small": 0.5}


def test_curriculum_order_bands_and_draw(spark):
    import pytest
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        curriculum_order,
    )

    # 400 rows with difficulty = i → exact quartile bands of 100 each
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(400)], "id long, diff double"
    )
    out = curriculum_order(df, "id", "diff", n_bands=4, seed=7)
    rows = out.collect()
    from collections import Counter

    c = Counter(r["band"] for r in rows)
    assert c == {0: 100, 1: 100, 2: 100, 3: 100}
    # band is monotone in difficulty: max difficulty of band b < min of b+1
    by_band = {}
    for r in rows:
        by_band.setdefault(r["band"], []).append(r["diff"])
    for b in range(3):
        assert max(by_band[b]) < min(by_band[b + 1])

    # deterministic under repartition
    out2 = curriculum_order(
        df.repartition(5), "id", "diff", n_bands=4, seed=7
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2))

    # a different seed moves draws but NEVER bands
    out3 = {
        r["id"]: (r["band"], r["draw"])
        for r in curriculum_order(
            df, "id", "diff", n_bands=4, seed=8
        ).collect()
    }
    base = {r["id"]: (r["band"], r["draw"]) for r in rows}
    assert all(out3[i][0] == base[i][0] for i in base)
    assert any(out3[i][1] != base[i][1] for i in base)

    with pytest.raises(ValueError):
        curriculum_order(df, "id", "diff", n_bands=1)


def test_weighted_sample_proportionality_and_determinism(spark):
    """A-ES statistical property: across seeds, a weight-10 item is
    picked ~10x as often as a weight-1 item; the draw is deterministic
    per seed and partition-independent; zero/negative weights never
    appear."""
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(0, 400).select(
        F.col("id"),
        F.when(F.col("id") < 40, 10.0)
        .when(F.col("id") < 380, 1.0)
        .otherwise(0.0)
        .alias("w"),
    )
    heavy_hits = light_hits = 0
    for seed in range(12):
        got = weighted_sample(df, "id", "w", k=40, seed=seed).collect()
        assert len(got) == 40
        ids = {r.id for r in got}
        assert not ids & set(range(380, 400))  # zero-weight excluded
        heavy_hits += sum(1 for i in ids if i < 40)
        light_hits += sum(1 for i in ids if 40 <= i < 380)
    # expected inclusion ratio heavy:light per item ≈ weight ratio at
    # small sampling fractions; generous band for 12 trials
    per_heavy = heavy_hits / 40
    per_light = light_hits / 340
    assert 4 < per_heavy / per_light < 25, (per_heavy, per_light)

    a = weighted_sample(df, "id", "w", k=40, seed=3).collect()
    b = weighted_sample(df.repartition(11), "id", "w", k=40, seed=3)
    assert [tuple(r) for r in a] == [tuple(r) for r in b.collect()]
    c = weighted_sample(df, "id", "w", k=40, seed=4).collect()
    assert {r.id for r in a} != {r.id for r in c}  # seed redraws


def test_weighted_sample_is_take_ordered_not_global_sort(spark):
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    df = spark.range(0, 5000).select(
        F.col("id"), (F.col("id") % 7 + 1.0).alias("w")
    )
    plan = (
        weighted_sample(df, "id", "w", k=50)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
