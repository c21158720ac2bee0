"""plans.corpus — the composed training-data curation pipeline."""

from __future__ import annotations

import pytest

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive

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


def test_rag_ingest_chunk_embed_retrieve_roundtrip(spark, sf_dir):
    """End-to-end embedding-pipeline composition: chunk documents →
    deterministic hash-embedding per chunk (stand-in for the encoder, same
    mapInPandas seam as mlstub) → brute-force cosine retrieval. A chunk
    queried against the chunk index must retrieve its own document's
    neighboring chunks first: consecutive chunks share `overlap` tokens,
    so under a bag-of-token-hashes embedding they are the most similar
    vectors in the corpus."""
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        chunk_documents,
    )

    # per-doc vocabularies: the driver's documents table draws every doc
    # from one ~25-word pool, so ANY bag-of-tokens embedding is blind
    # there — build docs whose token sets actually distinguish them
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"d{i}w{j}" for j in range(80)))
            for i in range(12)
        ],
        "doc_id bigint, text string",
    )
    chunks = chunk_documents(
        docs, "doc_id", max_tokens=32, overlap=16
    ).withColumn(
        "chunk_key",
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_id")),
    )
    # deterministic bag-of-token-hashes embedding: dim d = count of the
    # chunk's tokens hashing to bucket d — pure expressions, no encoder
    dim = 256
    toks = F.split(F.trim(F.col("chunk_text")), r"\s+")
    embed = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.size(
            F.filter(
                toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim)) == d
            )
        ).cast("float"),
    )
    embedded = chunks.select(
        "chunk_key", "doc_id", embed.alias("vec")
    ).cache()
    queries = embedded.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("chunk_key").endswith("#1"))
    )
    hits = brute_force_topk(
        embedded, queries, "chunk_key", "vec", "chunk_key", "vec", k=3
    )
    by_query: dict = {}
    for r in hits.collect():
        by_query.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"])
        )
    assert len(by_query) >= 2
    # a middle chunk has exactly TWO overlap-sharing siblings (the
    # chunks before and after it; farther chunks share zero tokens), so
    # ranks 1-2 must both be sibling chunks of the query's own document
    for qk, ranked in by_query.items():
        assert len(ranked) == 3
        top2 = [n for rank, n in sorted(ranked)[:2]]
        assert all(
            n.split("#")[0] == qk.split("#")[0] for n in top2
        ), f"non-sibling in top-2 of {qk}: {sorted(ranked)}"
    embedded.unpersist()


def test_full_training_recipe_composition(spark, tmp_path):
    """The whole round-6 recipe, composed end-to-end: mixture -> curate
    (gates + dedup + decontam) -> deterministic shuffle -> token-budget
    packing -> JSONL shard export -> schema-pinned read-back. Asserts the
    contract at every boundary AND end-to-end determinism under a
    different input partitioning."""
    from calp_cva_tracking_pipeline_spark.operators.packing import (
        pack_sequences,
    )
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        mixture_sample,
    )
    from calp_cva_tracking_pipeline_spark.plans.corpus import shuffle_corpus
    from calp_cva_tracking_pipeline_spark.sources.files import (
        read_jsonl,
        write_jsonl_shards,
    )

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = [
        (
            i,
            " ".join(words[(i + j) % len(words)] for j in range(12 + i % 9)),
            "keep" if i % 3 else "drop_src",
        )
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    bench = spark.createDataFrame(
        [(0, rows[1][1])], ["bid", "text"]  # doc 1's text is benchmark
    )

    def run(df):
        mixed = mixture_sample(
            df, "source", {"keep": 0.9}, "doc_id", seed=11
        )
        curated = curate_corpus(
            mixed, min_quality=0.0, min_tokens=5,
            benchmark=bench, decontam_ngram=5,
        )
        packed = pack_sequences(
            shuffle_corpus(curated, seed=5), "doc_id",
            budget=64, num_shards=4,
        )
        return mixed, curated, packed

    mixed, curated, packed = run(docs)
    n_mixed, n_curated = mixed.count(), curated.count()
    assert 0 < n_mixed < 120  # drop_src gone, keep sampled at 0.9
    assert {r.source for r in mixed.select("source").distinct().collect()} == {"keep"}
    assert 0 < n_curated < n_mixed  # dedup/decontam removed something
    # benchmark text never survives curation
    assert curated.filter(F.col("doc_id") == 1).count() == 0
    packs = packed.collect()
    assert len(packs) == n_curated  # packing drops nothing
    by_pack = {}
    for r in packs:
        by_pack.setdefault(r["pack_id"], 0)
        by_pack[r["pack_id"]] += r["n_tokens"]
    assert all(
        t <= 64 or len([x for x in packs if x["pack_id"] == p]) == 1
        for p, t in by_pack.items()
    )

    # shard export round-trip: pack members colocated per file
    path = str(tmp_path / "recipe_shards")
    write_jsonl_shards(
        packed, path, num_shards=3, shard_col="pack_id",
        sort_cols=["pack_id", "id"],
    )
    back = read_jsonl(
        spark, path,
        schema="id bigint, n_tokens bigint, shard int, pack_id bigint, "
               "pack_tokens bigint, oversized boolean",
    )
    assert back.count() == n_curated
    assert {r.id for r in back.collect()} == {r["id"] for r in packs}

    # end-to-end determinism: identical assignment from a repartitioned input
    _, _, packed2 = run(docs.repartition(17))
    a = sorted(tuple(r) for r in packs)
    b = sorted(tuple(r) for r in packed2.collect())
    assert a == b


def test_incremental_dedup_two_batch_ingest(spark):
    """Two consecutive ingest batches against an evolving digest store:
    cross-batch dups drop, intra-batch dups collapse to min id, null
    texts survive the anti join, and the updated store equals a from-
    scratch store over the union."""
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        content_digest_store,
        dedup_exact,
        dedup_incremental,
    )

    b1 = _docs(spark, [(1, "aaa"), (2, "bbb"), (3, "aaa")])
    corpus1 = dedup_exact(b1, "text", "doc_id")  # {1, 2}
    store1 = content_digest_store(corpus1, "text")

    b2 = _docs(
        spark,
        [
            (10, "aaa"),   # dup of history -> dropped
            (11, "ccc"),   # new
            (12, "ccc"),   # intra-batch dup -> 11 survives
            (13, None),    # null text survives (matches nothing)
        ],
    )
    survivors = dedup_incremental(b2, store1, "text", "doc_id")
    assert {r.doc_id for r in survivors.collect()} == {11, 13}

    # store update law: store1 ∪ digests(survivors) == digests(full corpus)
    store2 = store1.unionByName(
        content_digest_store(survivors, "text")
    ).distinct()
    full = content_digest_store(
        dedup_exact(b1.unionByName(b2), "text", "doc_id"), "text"
    )
    assert {r.digest for r in store2.collect()} == {
        r.digest for r in full.collect()
    }


def test_neardup_incremental_store_probe(spark):
    """LSH band-store probing: a new doc near-duplicating a historical doc
    surfaces as a vs_history candidate; two near-dup new docs surface as
    an intra-batch candidate; unrelated docs surface nowhere."""
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        lsh_band_store,
        neardup_incremental,
    )

    hist = _docs(spark, [(1, BASE), (2, "totally unrelated historical text "
                                       "about glaciers calving into a grey "
                                       "arctic sea under a pale sun")])
    store = lsh_band_store(hist, "doc_id", "text")
    batch = _docs(
        spark,
        [
            (10, BASE + " trailing extra"),          # near-dup of hist 1
            (11, "fresh unique content on orchards and bees in spring "
                 "with blossom drifting over the long wet grass rows"),
            (12, "fresh unique content on orchards and bees in spring "
                 "with blossom drifting over the long wet grass rows x"),
        ],
    )
    out = neardup_incremental(batch, store, "doc_id", "text")
    rows = {(r.id_a, r.id_b, r.vs_history) for r in out.collect()}
    assert (10, 1, True) in rows
    assert (11, 12, False) in rows
    assert not any(r[0] == 11 and r[2] for r in rows)


def test_simhash_candidates_wide_bits(spark):
    """bits=32 variant (the 'widen per-deployment' path): a token-set-
    identical pair (different byte strings, so exact pre-collapse keeps
    both) has hamming 0 and MUST surface; the wide space keeps unrelated
    docs apart."""
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        simhash_candidates,
    )

    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "beta gamma alpha epsilon delta"),  # same token SET as 1
            (3, "completely different words entirely here"),
            (4, "yet another unrelated document body text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = simhash_candidates(
        df, "doc_id", "text", bits=32, max_hamming=2
    ).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out}
    assert pairs.get((1, 2)) == 0  # guaranteed: identical distinct-token set
    assert all(h <= 2 for h in pairs.values())


def test_corpus_release_audit_conservation_and_manifest(spark, sf_dir):
    """The release audit's bookkeeping invariants (VERDICT r12 ask #5):
    per source n_raw = gate + exact + neardup + kept; kept counts equal
    an independently-run curate_corpus at the same thresholds; the
    shard manifest column is bounded by the shard count and by n_kept."""
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        CORPUS_N_SHARDS,
        corpus_release_audit,
    )

    rows = corpus_release_audit(spark, sf_dir).collect()
    assert rows, "audit produced no sources"
    for r in rows:
        assert (
            r.n_raw
            == r.n_gate_drop + r.n_exact_drop + r.n_neardup_drop + r.n_kept
        ), r
        assert 0 <= r.shards_touched <= min(CORPUS_N_SHARDS, r.n_kept), r
        assert r.kept_tokens >= r.n_kept  # every kept doc has >= 1 token
    # a corpus this size must exercise every status class somewhere
    assert sum(r.n_gate_drop for r in rows) > 0
    assert sum(r.n_exact_drop for r in rows) > 0
    assert sum(r.n_kept for r in rows) > 0


def test_corpus_release_audit_kept_matches_curate_corpus(spark, sf_dir):
    """The audit's kept census IS curate_corpus's survivor set: run the
    real pipeline on the same augmented corpus at the same thresholds
    and compare per-source kept counts — the audit is a projection of
    the recipe, not a reimplementation that can drift."""
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        CORPUS_DUP_OFFSET,
        CORPUS_JUNK_OFFSET,
        CORPUS_MIN_QUALITY,
        CORPUS_MIN_TOKENS,
        corpus_release_audit,
    )
    from calp_cva_tracking_pipeline_spark.plans.corpus import (
        curate_corpus,
    )

    d = T(spark, sf_dir, "documents").select("doc_id", "source", "text")
    dups = d.filter(
        (F.col("doc_id") % 7 == 0) & F.col("text").isNotNull()
    ).select(
        (F.col("doc_id") + CORPUS_DUP_OFFSET).alias("doc_id"),
        "source",
        "text",
    )
    junk = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + CORPUS_JUNK_OFFSET).alias("doc_id"),
        "source",
        F.lit("x y").alias("text"),
    )
    kept = curate_corpus(
        d.unionByName(dups).unionByName(junk),
        min_quality=CORPUS_MIN_QUALITY,
        min_tokens=CORPUS_MIN_TOKENS,
    )
    expected = {
        r.source: r.cnt
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    audit = {
        r.source: r.n_kept
        for r in corpus_release_audit(spark, sf_dir).collect()
    }
    assert audit == expected
