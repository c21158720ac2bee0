"""Benchmark decontamination: remove training documents that overlap an
evaluation set by at least ``min_hits`` word n-grams.

The standard LLM training-data hygiene step (GPT-3 App. C / PaLM-style
13-gram decontamination), absent from the reference (its corpus is
humanitarian-flow rows, not training text) — an engine addition alongside
the dedup tiers.

Scale shape: the benchmark side is exploded once to DISTINCT n-gram
hashes — benchmarks are millions of n-grams at most, so this side
broadcasts; the 100 TB training side streams through explode → hash →
broadcast LEFT SEMI join → per-doc hit count, with no shuffle of document
text (only (id, hit) pairs after the semi join) and no state beyond the
broadcast hash set. If a benchmark ever outgrows the broadcast threshold,
pass ``broadcast_benchmark=False`` and the semi join degrades gracefully
to a shuffled join on the hash key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.dedup import (
    shingles_from_tokens,
    word_tokens,
)
from calp_cva_tracking_pipeline_spark.operators.partitioning import (
    spread_small_input,
)

# xxhash64, not the md5-derived stable_hash64: the gram hash is join-
# internal (both sides hash the same strings in the same session), so it
# needs no cross-engine reproducibility — and the oracle SQL joins the
# gram STRINGS directly. xxhash64 is a JVM codegen intrinsic; md5 +
# substring + conv over ~200 grams/doc was the dominant decontam cost
# (measured 2.1s → 0.9s at sf0.1 for the catalog query).
_gram_hash = F.xxhash64


def benchmark_ngram_hashes(
    benchmark: DataFrame, text_col: str, n: int = 13
) -> DataFrame:
    """Distinct 64-bit hashes of the benchmark's word n-grams
    (single column ``__bench_h``). Texts shorter than ``n`` words
    contribute their whole token sequence as one gram — matching the
    training side's behavior, so short eval items still decontaminate."""
    # spread-guard the scan (benchmark files are small — often one parquet
    # row group = ONE partition) and materialize the token array in its
    # own projection so the shingle lambda does not re-split per index
    return (
        spread_small_input(benchmark)
        .select(word_tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.explode(shingles_from_tokens(F.col("__toks"), n)).alias(
                "__g"
            )
        )
        # a NULL text shingles to a NULL gram; xxhash64(NULL) is a real
        # value, so unfiltered null grams would cross-match each other —
        # while SQL's `g IN (...)` drops them (NULL semantics). Filter on
        # BOTH sides so the engines agree: null never matches.
        .filter(F.col("__g").isNotNull())
        .select(_gram_hash(F.col("__g")).alias("__bench_h"))
        .distinct()
    )


def contamination_hits(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, contamination_hits): per-training-doc count of DISTINCT word
    n-grams shared with the benchmark. Docs with zero hits are absent."""
    bench = benchmark_ngram_hashes(
        benchmark, bench_text_col or text_col, n
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    # non-distinct explode + countDistinct after the semi join:
    # array_distinct over a long doc's gram array is O(n²) in Spark's
    # interpreted higher-order-function path (measured in
    # operators.dedup.shingles), while countDistinct is a codegen
    # hash aggregate over the few rows that SURVIVE the semi join
    grams = (
        spread_small_input(train)
        .select(
            F.col(id_col), word_tokens(F.col(text_col)).alias("__toks")
        )
        .select(
            id_col,
            F.explode(shingles_from_tokens(F.col("__toks"), n)).alias(
                "__g"
            ),
        )
    )
    return (
        grams.filter(F.col("__g").isNotNull())  # see benchmark side
        .select(id_col, _gram_hash(F.col("__g")).alias("__h"))
        .join(bench, F.col("__h") == F.col("__bench_h"), "left_semi")
        .groupBy(id_col)
        .agg(F.countDistinct("__h").alias("contamination_hits"))
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    min_hits: int = 1,
    mode: str = "drop",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Drop (``mode="drop"``) or annotate (``mode="flag"``) training rows
    sharing ≥ ``min_hits`` distinct word n-grams with the benchmark.

    ``drop`` anti-joins the contaminated id set — row count only ever
    shrinks. ``flag`` keeps every row and adds ``contamination_hits``
    (0 for clean rows) and boolean ``contaminated``.

    Hits are matched on 64-bit xxhash64 gram values, not gram strings, so
    a hash collision between a train gram and any benchmark gram is a
    false contamination hit — and in ``drop`` mode that silently removes
    a clean doc. With ~10^9 distinct grams a side the expected collision
    count is ~0.05 (birthday bound at 2^64); acceptable for training-data
    hygiene, but audit with ``mode="flag"`` first when the drop set must
    be exact."""
    if mode not in ("drop", "flag"):
        raise ValueError(f"mode must be drop|flag: {mode}")
    hits = contamination_hits(
        train,
        benchmark,
        id_col,
        text_col,
        bench_text_col,
        n,
        broadcast_benchmark,
    )
    if mode == "drop":
        bad = hits.filter(
            F.col("contamination_hits") >= min_hits
        ).select(id_col)
        return train.join(bad, [id_col], "left_anti")
    out = train.join(hits, [id_col], "left").withColumn(
        "contamination_hits",
        F.coalesce(F.col("contamination_hits"), F.lit(0)),
    )
    return out.withColumn(
        "contaminated", F.col("contamination_hits") >= min_hits
    )
