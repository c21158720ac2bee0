"""operators.textops.lm_quality_score — smoothing formula and edge
semantics pinned on a hand-computed corpus (the catalog entry tx_lm_score
is oracle-verified end-to-end at all three SFs)."""

from __future__ import annotations

import math

from calp_cva_tracking_pipeline_spark.operators.textops import (
    lm_quality_score,
)


def test_hand_computed_bigram_nll(spark):
    # corpus: c2 = {(a,b):2, (b,a):1, (b,c):1}; c1 = {a:2, b:2}; V=3
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, "b c")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in lm_quality_score(df, "doc_id", alpha=0.5).collect()
    }
    nll_ab = round(-math.log((2 + 0.5) / (2 + 0.5 * 3)), 6)  # 0.336472
    nll_ba = round(-math.log((1 + 0.5) / (2 + 0.5 * 3)), 6)  # 0.847298
    doc1 = round((2 * nll_ab + nll_ba) / 3, 6)
    assert out[1] == (3, doc1)
    assert out[3] == (1, nll_ba)  # p(c|b) has the same counts as p(a|b)
    assert 2 not in out  # <2 tokens -> no bigrams -> omitted


def test_case_and_whitespace_normalization(spark):
    # "A  b" and "a b" train/score identically.
    df = spark.createDataFrame(
        [(1, "A  b"), (2, "a b")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_quality_score(df, "doc_id").collect()
    }
    assert out[1] == out[2]


def test_garbage_scores_above_repetition(spark):
    # a document of corpus-frequent bigrams scores lower nll than one of
    # singleton bigrams — the quality-gate direction.
    rep = "x y " * 20
    df = spark.createDataFrame(
        [(i, rep) for i in range(9)] + [(9, "q w e r t z u i o p")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_quality_score(df, "doc_id").collect()
    }
    assert out[9] > out[0]
