"""Unit semantics for operators.retrieval (RRF fusion) — the catalog
entry rt_hybrid_rrf is oracle-verified end-to-end; these pin the fusion
algebra itself on hand-computed inputs."""

from __future__ import annotations

import pytest

from calp_cva_tracking_pipeline_spark.operators.retrieval import (
    rrf_fuse,
    with_rank,
)


def _pool(spark, rows):
    return spark.createDataFrame(rows, "id long, rank int")


def test_rrf_hand_computed(spark):
    # list A: ids 1,2,3 at ranks 1,2,3; list B: ids 3,4 at ranks 1,2.
    a = _pool(spark, [(1, 1), (2, 2), (3, 3)])
    b = _pool(spark, [(3, 1), (4, 2)])
    out = {
        r["id"]: (r["rrf"], r["n_lists"])
        for r in rrf_fuse([a, b], "id", rrf_k=60, top_k=10).collect()
    }
    assert out[3] == (round(1 / 63 + 1 / 61, 6), 2)  # both lists
    assert out[1] == (round(1 / 61, 6), 1)
    assert out[4] == (round(1 / 62, 6), 1)
    # consensus doc 3 outranks every single-list doc incl. both rank-1s;
    # same-rank docs from different lists (2 in A, 4 in B) tie exactly.
    assert out[3][0] > out[1][0] > out[4][0] == out[2][0]


def test_rrf_top_k_cut_ties_break_on_id(spark):
    # two docs with identical single-list rank → identical rrf; the cut
    # keeps the lower id.
    a = _pool(spark, [(7, 1)])
    b = _pool(spark, [(5, 1)])
    got = rrf_fuse([a, b], "id", rrf_k=60, top_k=1).collect()
    assert [(r["id"], r["n_lists"]) for r in got] == [(5, 1)]


def test_rrf_empty_pools_raises():
    with pytest.raises(ValueError):
        rrf_fuse([], "id")


def test_with_rank_total_order(spark):
    # equal rounded scores tie-break on id: ranks are deterministic.
    df = spark.createDataFrame(
        [(10, 0.5), (3, 0.5), (9, 0.9)], "id long, score double"
    )
    got = {
        r["id"]: r["rank"]
        for r in with_rank(df, "id", "score").collect()
    }
    assert got == {9: 1, 3: 2, 10: 3}
