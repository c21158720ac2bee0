"""Embedding linear-algebra tier (operators.linalg): covariance partials
and PCA whitening. emb_dim_stats has a DuckDB oracle (parity suite); the
whitening transform's eigendecomposition does not, so its defining
invariants are pinned here instead."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from calp_cva_tracking_pipeline_spark.operators.linalg import (
    embedding_covariance,
    pca_whiten,
)

DIM = 4


def _aniso_df(spark, n=400, partitions=1):
    """Deterministic anisotropic cloud: dimensions with very different
    scales plus correlation — the case whitening exists for."""
    rows = []
    for i in range(n):
        # deterministic pseudo-noise from the index (no RNG state); three
        # independent sources so the covariance has rank >= 3 and k=3
        # whitening is well-posed
        a = ((i * 2654435761) % 1000) / 1000.0 - 0.5
        b = ((i * 40503) % 997) / 997.0 - 0.5
        c = ((i * 97001) % 983) / 983.0 - 0.5
        rows.append(
            Row(
                vec_id=i,
                embedding=[
                    10.0 * a,              # large-scale dim
                    0.1 * b,               # small-scale dim
                    5.0 * a + 0.05 * b + 1.5 * c,  # correlated dim
                    3.0,                   # constant (zero-variance) dim
                ],
            )
        )
    return spark.createDataFrame(rows).repartition(partitions)


def test_covariance_matches_numpy(spark):
    df = _aniso_df(spark, n=300, partitions=5)
    n, mean, cov = embedding_covariance(df, "embedding", DIM)
    x = np.array([r.embedding for r in df.orderBy("vec_id").collect()])
    assert n == 300
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(
        cov, np.cov(x, rowvar=False, bias=True), atol=1e-9
    )


def test_covariance_skips_bad_vectors(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, embedding=[1.0, 2.0]),
            Row(id=2, embedding=None),
            Row(id=3, embedding=[3.0, 4.0]),
        ]
    )
    n, mean, _ = embedding_covariance(df, "embedding", 2)
    assert n == 2
    np.testing.assert_allclose(mean, [2.0, 3.0])
    with pytest.raises(ValueError):
        embedding_covariance(df.filter("id = 2"), "embedding", 2)


def test_whitened_covariance_is_identity(spark):
    df = _aniso_df(spark, n=400, partitions=7)
    out = pca_whiten(df, "embedding", DIM, k=3, out_col="white")
    w = np.array([r.white for r in out.collect()])
    assert w.shape == (400, 3)
    cov = np.cov(w, rowvar=False, bias=True)
    # identity on the kept components (eps regularization allows 1e-3 slack)
    np.testing.assert_allclose(cov, np.eye(3), atol=1e-3)
    np.testing.assert_allclose(w.mean(axis=0), np.zeros(3), atol=1e-9)


def test_whitening_deterministic_under_repartition(spark):
    a = pca_whiten(_aniso_df(spark, 200, 3), "embedding", DIM, k=2)
    b = pca_whiten(_aniso_df(spark, 200, 11), "embedding", DIM, k=2)
    ra = {r.vec_id: r.embedding for r in a.collect()}
    rb = {r.vec_id: r.embedding for r in b.collect()}
    for i in ra:
        np.testing.assert_allclose(ra[i], rb[i], atol=1e-9)


def test_whitening_reuses_precomputed_stats_and_nulls(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[1.0, 1.0]),
            Row(vec_id=4, embedding=None),
        ]
    )
    stats = embedding_covariance(df, "embedding", 2)
    out = {
        r.vec_id: r.embedding
        for r in pca_whiten(df, "embedding", 2, stats=stats).collect()
    }
    assert out[4] is None  # null vector passes through as null
    assert len(out[1]) == 2


def test_whitened_embeddings_feed_ann(spark):
    """Tier composition: pca_whiten output (array<double>) is directly
    consumable by the similarity tier — and whitening preserves exact
    nearest-neighbor structure up to the transform (identity here: whiten
    with k=dim on isotropic-ized data keeps cosine ranking well-defined)."""
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        brute_force_topk,
    )

    df = _aniso_df(spark, n=60, partitions=4)
    white = pca_whiten(df, "embedding", DIM, k=3, out_col="embedding")
    q = white.filter("vec_id < 2")
    out = brute_force_topk(
        white, q, "vec_id", "embedding", "vec_id", "embedding", k=3
    )
    rows = out.collect()
    assert len(rows) == 2 * 3
    assert all(-1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9 for r in rows)
    # deterministic ranking columns present and ranked 1..k per query
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
