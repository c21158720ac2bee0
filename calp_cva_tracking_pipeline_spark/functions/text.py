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


# Latin-1 / Latin-Extended-A diacritics folded to ASCII base letters, plus
# common Unicode punctuation/whitespace re-encodings (smart quotes, en/em
# dashes, NBSP-family spaces, ideographic space) mapped to their ASCII
# equivalents. 1:1 mappings only — translate() is the one string-mapping
# builtin Spark and DuckDB interpret identically; the three 1→2 folds
# (ß→ss, æ→ae, œ→oe) go through replace(). Deliberately NOT full
# NFKC/ICU: CJK, Cyrillic, Greek, Hangul pass through untouched (folding
# across scripts is a curation decision); this tier catches the
# western-European re-encodings — the dominant crawl-duplicate class a
# byte-exact or ASCII-only pass misses. Input is assumed lowercased first
# (the mapping covers lowercase letters; Unicode lower() is
# engine-identical on these ranges, verified by the unicode parity sweep).
UNICODE_FOLD_SRC = (
    "\u00e0\u00e1\u00e2\u00e3\u00e4\u00e5"      # a-grave..a-ring
    "\u00e8\u00e9\u00ea\u00eb"                  # e family
    "\u00ec\u00ed\u00ee\u00ef"                  # i family
    "\u00f2\u00f3\u00f4\u00f5\u00f6\u00f8"      # o family (+slash)
    "\u00f9\u00fa\u00fb\u00fc"                  # u family
    "\u00fd\u00ff\u00f1\u00e7\u00f0"            # y/n/c/eth
    "\u0101\u0103\u0105\u0113\u0115\u0117\u0119\u011b"  # latin-ext a/e
    "\u012b\u012d\u012f\u0131"                  # latin-ext i
    "\u014d\u014f\u0151\u016b\u016d\u016f\u0171\u0173"  # latin-ext o/u
    "\u0107\u0109\u010b\u010d\u010f\u0111"      # c/d
    "\u011d\u011f\u0121\u0123\u0125\u0127"      # g/h
    "\u0135\u0137\u013a\u013c\u013e\u0142"      # j/k/l
    "\u0144\u0146\u0148\u0155\u0157\u0159"      # n/r
    "\u015b\u015d\u015f\u0161\u0163\u0165\u0167"  # s/t
    "\u0175\u0177\u017a\u017c\u017e"            # w/y/z
    "\u2018\u2019\u201c\u201d\u2013\u2014"      # smart quotes, dashes
    "\u00a0\u2009\u202f\u3000"                  # NBSP/thin/narrow/ideographic space
)
UNICODE_FOLD_DST = (
    "aaaaaa"
    "eeee"
    "iiii"
    "oooooo"
    "uuuu"
    "yyncd"
    "aaaeeeee"
    "iiii"
    "ooouuuuu"
    "ccccdd"
    "gggghh"
    "jkllll"
    "nnnrrr"
    "ssssttt"
    "wyzzz"
    "''\"\"--"
    "    "
)
assert len(UNICODE_FOLD_SRC) == len(UNICODE_FOLD_DST)


def unicode_fold(col: Column | str) -> Column:
    """Fold common Unicode re-encodings to ASCII (see mapping above).

    Oracle-SQL twin: ``sql_unicode_fold`` in catalog.scale builds the
    identical translate/replace chain in DuckDB syntax — both engines
    apply the same 1:1 character map and the same three 1→2 replaces,
    so the folded strings are byte-identical.
    """
    c = F.translate(_c(col), UNICODE_FOLD_SRC, UNICODE_FOLD_DST)
    c = F.replace(c, F.lit("ß"), F.lit("ss"))
    c = F.replace(c, F.lit("æ"), F.lit("ae"))
    return F.replace(c, F.lit("œ"), F.lit("oe"))


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
