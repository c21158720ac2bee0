"""Corpus curation — the training-data pipeline composed end-to-end.

The scale-tier operators (text features, exact dedup, MinHash+LSH near-dup)
exist to be chained into exactly this program: raw documents → quality/
language gates → exact dedup → verified near-dup removal → shard-balanced
output. Each stage is one of the already-oracle-verified operators; this
module contributes the composition and the survivor policy, mirroring how
plans.pipelines composes the reference's CVA chain (EP1/EP2).

Shape at 100 TB: the gates are scan-speed projections; dedup shuffles
digests and band keys only; the near-dup drop set is candidate-sized
(≪ corpus) and broadcast into an anti-join, so the corpus itself is
never shuffled until the final shard write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_candidates,
    ngram_jaccard,
)
from calp_cva_tracking_pipeline_spark.operators.textops import (
    add_text_features,
)


def near_dup_drop_set(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket_docs: int | None = 64,
    survivor_policy: str = "greedy",
) -> DataFrame:
    """ids to drop among verified near-dup pairs.

    ``survivor_policy="greedy"`` (default; the standard large-corpus
    choice, as in MinHashLSH-based crawl dedup) drops the HIGHER id of
    every pair independently: a doc is dropped if ANY confirmed near-twin
    has a smaller id. Deliberately not a transitive closure — in a chain
    A~B~C without A~C, B and C both drop even though B's own survivor (A)
    differs from C's (B): one anti-join instead of an iterative fixpoint,
    and over-dropping is bounded by chain length, which the Jaccard
    threshold keeps short.

    ``survivor_policy="components"`` resolves exact clusters first
    (operators.dedup.connected_components — min-id label propagation over
    the candidate-sized pair set) and drops every non-minimum member, so
    each near-dup CLUSTER keeps exactly its min id. Same drop set as
    greedy on chains (one survivor either way); differs on graphs where
    greedy's pairwise view and the transitive clustering disagree — pay
    the O(diameter) iteration only when cluster-consistent labeling
    matters (e.g. attributing which survivor each drop maps to).
    """
    pairs = minhash_lsh_candidates(
        docs,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        pre_collapse_exact=True,
        max_bucket_docs=max_bucket_docs,
    )
    verified = ngram_jaccard(pairs, docs, id_col, text_col, k=k).filter(
        F.round(F.col("jaccard"), 6) >= jaccard_threshold
    )
    if survivor_policy == "components":
        from calp_cva_tracking_pipeline_spark.operators.dedup import (
            connected_components,
        )

        comp = connected_components(verified)
        return (
            comp.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias(id_col))
        )
    if survivor_policy != "greedy":
        raise ValueError(
            f"survivor_policy must be 'greedy' or 'components', "
            f"got {survivor_policy!r}"
        )
    return verified.select(F.col("id_b").alias(id_col)).distinct()


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    languages: list[str] | None = None,
    min_tokens: int = 5,
    jaccard_threshold: float = 0.8,
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    decontam_ngram: int = 13,
    redact_pii: bool = False,
) -> DataFrame:
    """documents → curated training corpus.

    optional PII scrub (``redact_pii=True`` — FIRST, so dedup keys and
    features see the scrubbed text and two docs differing only in
    redacted spans collapse as the duplicates they are) →
    quality/language/length gates (scan-speed projections, evaluated
    BEFORE any dedup so the expensive stages see only keepable docs) →
    exact dedup (min-id survivor) → near-dup removal (LSH candidates,
    exact-Jaccard verified, lower-id survives) → optional benchmark
    decontamination (pass ``benchmark`` to drop docs sharing any
    ``decontam_ngram``-gram with the eval set — operators.decontam; last
    because it must see the FINAL surviving text, and its train-side scan
    is cheapest on the already-shrunk corpus). Returns the surviving rows
    with the text-feature columns attached, plus ``n_bpe_tokens`` (the
    GPT-2-style pre-token count — the budget column training loaders
    sum when packing sequences; whitespace ``n_tokens`` undercounts
    punctuation-heavy text).
    """
    from calp_cva_tracking_pipeline_spark.functions.text import (
        bpe_token_count,
    )

    if redact_pii:
        from calp_cva_tracking_pipeline_spark.operators.textops import (
            pii_redact,
        )

        docs = docs.withColumn(text_col, pii_redact(F.col(text_col)))
    feats = add_text_features(docs, text_col).withColumn(
        "n_bpe_tokens", bpe_token_count(F.col(text_col))
    )
    gated = feats.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
    )
    if languages is not None:
        gated = gated.filter(F.col("lang_pred").isin(languages))
    exact = dedup_exact(gated, text_col, id_col)
    drops = near_dup_drop_set(
        exact, id_col, text_col, jaccard_threshold=jaccard_threshold
    )
    out = exact.join(F.broadcast(drops), [id_col], "left_anti")
    if benchmark is not None:
        from calp_cva_tracking_pipeline_spark.operators.decontam import (
            decontaminate,
        )

        out = decontaminate(
            out,
            benchmark,
            id_col,
            text_col,
            bench_text_col=bench_text_col,
            n=decontam_ngram,
        )
    return out


def shuffle_corpus(
    df: DataFrame, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic global shuffle for training order.

    Orders by a seeded hash of the id — the standard trick for a
    reproducible full-corpus shuffle without materializing random keys:
    same (corpus, seed) → same order on any cluster/partitioning, and a
    different seed reshuffles for the next epoch. Global orderBy plans a
    range exchange + sort; at 100 TB this is the one unavoidable
    total-order shuffle and it replaces the dataloader-side shuffle
    buffer (which can't span shards).
    """
    from calp_cva_tracking_pipeline_spark.functions.hashing import (
        stable_hash64,
    )

    key = stable_hash64(
        F.concat(F.lit(f"shuffle:{seed}:"), F.col(id_col).cast("string"))
    )
    return df.orderBy(key, F.col(id_col))


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    shard_key: str = "doc_id",
) -> None:
    """Persist the curated corpus as ``n_shards`` size-balanced parquet
    shards.

    Hash-repartition on ``shard_key`` (uniform for id/hash keys) so every
    shard carries ~|corpus|/n_shards rows — training loaders stream shards
    round-robin and skew would serialize the tail. One shuffle, at write
    time, exactly once.
    """
    df.repartition(n_shards, F.col(shard_key)).write.mode(
        "overwrite"
    ).parquet(path)
