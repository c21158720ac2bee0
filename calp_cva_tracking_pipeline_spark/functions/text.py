"""Text/regex column helpers.

Implements the reference's scalar string family (SURVEY.md §2.9) as pure
JVM-side expressions — no Python UDFs, so every use stays inside whole-stage
codegen and scales linearly with executors:

- C1 keyword flag: case-insensitive word-boundary alternation
  (reference: code/08_fts_keyword_searching_cash.R:92-131).
- C5 name canonicalization: lower → strip punctuation → collapse whitespace →
  trim (reference: code/10_global_cva_analysis.R:88-105).
- C6 regex metachar quoting for dynamically-built patterns
  (reference: code/10_global_cva_analysis.R:88-91).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Explicit ASCII punctuation ranges (33-47, 58-64, 91-96, 123-126): Java's
# regex lacks POSIX [[:punct:]] and RE2's \p{P} excludes symbol chars, so an
# explicit class is the only spelling Spark and SQL oracles interpret
# identically.
ASCII_PUNCT_CLASS = "[!-/:-@\\[-`{-~]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonicalize_name(col: Column | str) -> Column:
    """lower → punctuation→space → collapse whitespace → trim.

    Reference semantics: code/10_global_cva_analysis.R:88-105.
    """
    c = F.lower(_c(col))
    c = F.regexp_replace(c, ASCII_PUNCT_CLASS, " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def regex_quote(col: Column | str) -> Column:
    """Backslash-escape regex metacharacters (reference quotemeta)."""
    return F.regexp_replace(_c(col), "([\\\\^$.|?*+()\\[\\]{}])", "\\\\$1")


def keyword_flag(col: Column | str, keywords: list[str]) -> Column:
    """Case-insensitive word-boundary alternation match → boolean."""
    pattern = "(?i)\\b(" + "|".join(keywords) + ")\\b"
    return _c(col).rlike(pattern)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization to array<string> (empty-safe)."""
    return F.split(F.trim(_c(col)), "\\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    c = _c(col)
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


# GPT-2-style pre-tokenization pattern (the regex BPE tokenizers split on
# BEFORE byte-pair merging): contractions, letter runs, digit runs,
# punctuation runs — each optionally absorbing one leading space — then
# residual whitespace. Java-regex spelling (\p{L}/\p{N} + lookahead); NOT
# RE2-expressible (the (?!\S) trailing-space term), so BPE counts stay a
# pytest-verified operator rather than a DuckDB-oracle column.
BPE_SPLIT_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?\\p{L}+"
    "| ?\\p{N}+"
    "| ?[^\\s\\p{L}\\p{N}]+"
    "|\\s+(?!\\S)"
    "|\\s+"
)


def bpe_pretokens(col: Column | str) -> Column:
    """array<string> of BPE pre-tokens (the units a regex-BPE tokenizer
    would merge within). JVM-side regexp_extract_all — scan speed."""
    return F.regexp_extract_all(_c(col), F.lit(f"({BPE_SPLIT_PATTERN})"), 1)


def bpe_token_count(col: Column | str) -> Column:
    """Pre-token count — the standard cheap proxy for LLM token budgets
    (true BPE counts need the merge table; pre-tokens upper-bound ~1-2x).
    Whitespace-only runs between words count once each, matching the
    pattern's residual-whitespace terms."""
    c = _c(col)
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(
        F.regexp_count(c, F.lit(BPE_SPLIT_PATTERN))
    )
