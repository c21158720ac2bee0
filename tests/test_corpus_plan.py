"""plans.corpus — the composed training-data curation pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.plans.corpus import (
    curate_corpus,
    near_dup_drop_set,
    write_training_shards,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "to the hills where a river bends through a quiet green valley"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_and_near_dups_drop_lower_id_survives(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1 → collapsed, 1 survives
        (3, BASE + " extra trailing words here"),  # near-dup of 1
        (4, "completely different text about ships and harbors and the "
            "sea with gulls wheeling over the masts at dawn in the port"),
        (5, "short"),  # fails min_tokens
    ]
    out = curate_corpus(
        _docs(spark, rows), min_quality=0.0, jaccard_threshold=0.5
    )
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 4]


def test_gates_run_before_dedup(spark):
    # a low-quality near-dup must not drag down its high-quality twin:
    # doc 11 is gated out, so doc 10 survives even though they'd pair
    rows = [
        (10, BASE),
        (11, BASE + " !!!! ???? ;;;; @@@@ #### $$$$ %%%% ^^^^ &&&& ****"),
    ]
    out = curate_corpus(
        _docs(spark, rows), min_quality=0.75, jaccard_threshold=0.3
    )
    ids = sorted(r.doc_id for r in out.collect())
    assert 10 in ids and 11 not in ids


def test_drop_set_is_higher_ids_only(spark):
    rows = [
        (1, BASE),
        (2, BASE + " tail one"),
        (3, BASE + " tail two"),
    ]
    drops = near_dup_drop_set(
        _docs(spark, rows), "doc_id", "text", jaccard_threshold=0.5
    )
    ids = {r.doc_id for r in drops.collect()}
    assert 1 not in ids
    assert ids <= {2, 3}


def test_drop_set_component_policy(spark):
    # chain 1~2~3: components policy keeps exactly the cluster min (1)
    # and drops the rest, with the same outcome as greedy on a chain
    rows = [
        (1, BASE),
        (2, BASE + " tail one"),
        (3, BASE + " tail one more"),
        (9, "completely different text about ships and harbors and the "
            "sea with gulls wheeling over the masts at dawn in the port"),
    ]
    drops = near_dup_drop_set(
        _docs(spark, rows), "doc_id", "text", jaccard_threshold=0.5,
        survivor_policy="components",
    )
    ids = {r.doc_id for r in drops.collect()}
    assert 1 not in ids and 9 not in ids
    assert ids <= {2, 3} and len(ids) >= 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="survivor_policy"):
        near_dup_drop_set(
            _docs(spark, rows), "doc_id", "text",
            survivor_policy="transitive-ish",
        )


def test_feature_columns_attached(spark):
    out = curate_corpus(
        _docs(spark, [(1, BASE)]), min_quality=0.0, jaccard_threshold=0.9
    )
    for col in (
        "quality", "lang_pred", "n_tokens", "fingerprint", "n_bpe_tokens"
    ):
        assert col in out.columns
    row = out.collect()[0]
    # BPE pre-tokens >= whitespace tokens (punctuation splits off)
    assert row["n_bpe_tokens"] >= row["n_tokens"]


def test_write_training_shards_balanced(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, n_shards=8)
    back = spark.read.parquet(path)
    assert back.count() == 1000
    sizes = [
        r["count"]
        for r in back.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    ]
    # hash-partitioned on a dense id key: no shard more than 2x the mean
    assert max(sizes) <= 2 * (1000 / 8)


def test_curate_corpus_decontaminates_against_benchmark(spark):
    span = "one two three four five six seven eight nine ten eleven"
    docs = _docs(
        spark,
        [
            (1, f"keepable document with plenty of clean words {span}"),
            (2, "another keepable document with enough distinct words"),
        ],
    )
    bench = spark.createDataFrame([(span,)], "text string")
    out = curate_corpus(
        docs,
        min_quality=0.0,
        jaccard_threshold=0.99,
        benchmark=bench,
        decontam_ngram=11,
    )
    assert [r["doc_id"] for r in out.collect()] == [2]
    # no benchmark → both survive (decontam stage absent, not just inert)
    assert (
        curate_corpus(
            docs, min_quality=0.0, jaccard_threshold=0.99
        ).count()
        == 2
    )


def test_shuffle_corpus_deterministic_and_seed_sensitive(spark):
    from calp_cva_tracking_pipeline_spark.plans.corpus import shuffle_corpus

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("d"), F.col("id")).alias("text"),
    )
    a1 = [r["doc_id"] for r in shuffle_corpus(df, seed=1).collect()]
    a2 = [
        r["doc_id"]
        for r in shuffle_corpus(df.repartition(7), seed=1).collect()
    ]
    b = [r["doc_id"] for r in shuffle_corpus(df, seed=2).collect()]
    assert a1 == a2  # partitioning-independent
    assert a1 != b  # seed reshuffles
    assert sorted(a1) == list(range(500))  # a permutation, nothing lost
    assert a1 != list(range(500))  # actually shuffled


def test_curate_corpus_pii_scrub_collapses_redacted_twins(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and keeps on "
        "running through the field"
    )
    docs = _docs(
        spark,
        [
            (1, f"{base} contact alice@example.com"),
            (2, f"{base} contact bob@other.org"),  # twin after redaction
            (3, "a different document with its own distinct words here"),
        ],
    )
    out = curate_corpus(
        docs, min_quality=0.0, jaccard_threshold=0.99, redact_pii=True
    )
    rows = {r["doc_id"]: r["text"] for r in out.collect()}
    # redacted twins collapse via exact dedup; min id survives
    assert set(rows) == {1, 3}
    assert "<EMAIL>" in rows[1] and "alice" not in rows[1]
