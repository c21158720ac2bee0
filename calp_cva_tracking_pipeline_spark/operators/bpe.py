"""Byte-pair-encoding tokenizer: distributed training statistics, exact
merge learning, distributed apply.

The engine's token counts elsewhere use the BPE *pre-token* proxy
(functions.text.bpe_token_count); this module closes the loop with actual
merge learning, so a corpus can carry its own learned tokenizer.

Altitude: BPE training needs only the WORD-FREQUENCY TABLE — the merge
loop never looks at documents, just (word, count) — so the distributed
half is one vocab aggregation (same shape as textops.vocab_frequencies)
and the driver half operates on a Heaps-law-bounded sufficient statistic
(~10⁶ rows for a web-scale corpus; ``max_vocab_rows`` caps it and
truncation-by-frequency is the standard trainer behavior, cf. the
fastBPE/HuggingFace trainers' min-frequency cut). This is the same
driver-size class as linalg's d² covariance collect, not a corpus
funnel. Applying the learned merges IS corpus-scale, so ``apply_bpe``
runs as an Arrow-batched pandas UDF with the merge ranks broadcast.

Determinism: merge selection breaks count ties lexicographically on the
pair, so the same word histogram always yields the same merge list on
any cluster; the greedy apply uses merge RANK (earlier merge wins), the
standard BPE inference rule.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word sentinel, so merges can't cross word boundaries


def word_histogram(
    df: DataFrame, text_col: str = "text", max_vocab_rows: int = 1_000_000
) -> list[tuple[str, int]]:
    """Distributed (word, count) table → driver list, highest-count first
    (ties lexicographic). The BPE sufficient statistic; bounded by
    ``max_vocab_rows`` (frequency-truncated, deterministically)."""
    hist = (
        df.select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), "\\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(max_vocab_rows)
    )
    return [(r["word"], r["cnt"]) for r in hist.collect()]


def learn_bpe(
    histogram: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over a word histogram (pure driver-side
    Python — the input is the sufficient statistic, not the corpus).

    Each word is a symbol sequence (chars + END); each round merges the
    (count-weighted) most frequent adjacent symbol pair, ties broken
    lexicographically. Returns the ordered merge list.

    COST: this reference loop is O(n_merges × vocab_rows × avg_word_len)
    — exact and dependency-free, fine for 10³-10⁴ merges over a
    frequency-truncated histogram (seconds-to-minutes). A production 32k-
    merge/10⁶-row run wants the standard pair-index optimization
    (incrementally update only the pairs touched by the last merge, as
    fastBPE does) — same outputs, same driver-side altitude; the
    distributed half of this module is unchanged either way."""
    words: list[tuple[list[str], int]] = [
        (list(w) + [END], c) for w, c in histogram
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, c in words:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_words = []
        for sym, c in words:
            out = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words.append((out, c))
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_i < 0:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string>) — the learned-BPE tokenization of
    each document. Arrow-batched pandas UDF; the merge-rank table
    broadcasts with the closure (KBs). Null text → null; per-word results
    are cached within a batch (Zipf makes the word-level cache hit rate
    very high, the standard tokenizer-inference trick)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in t.lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
