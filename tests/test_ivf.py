"""IVF ANN: oracle parity + recall floor vs brute force.

The driver's correctness gate is capped at 50 catalog queries (all slots
taken — catalog.relational.COVERAGE), so IVF is verified by this local
replica of the same DuckDB comparison instead of a driver row.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    train_centroids,
)

N_CENTROIDS = 16
NPROBE = 4
N_QUERIES = 8
K = 5

_D2 = "ROUND(list_sum(list_transform(list_zip({a}, {b}), x -> (x[1] - x[2]) * (x[1] - x[2]))), 6)"

IVF_SQL = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (
  SELECT CAST(rn - 1 AS INTEGER) AS centroid_id, v AS cv
  FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM c)
  WHERE rn <= {N_CENTROIDS}),
assign AS (
  SELECT vec_id, centroid_id AS cell FROM (
    SELECT a.vec_id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
             ORDER BY {_D2.format(a='a.v', b='cent.cv')}, cent.centroid_id
           ) AS rn
    FROM c a CROSS JOIN cent) t
  WHERE rn = 1),
probes AS (
  SELECT query_id, centroid_id AS cell FROM (
    SELECT q.vec_id AS query_id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_D2.format(a='q.v', b='cent.cv')}, cent.centroid_id
           ) AS pr
    FROM (SELECT * FROM c WHERE vec_id < {N_QUERIES}) q CROSS JOIN cent) t
  WHERE pr <= {NPROBE}),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_dot_product(qv.v, av.v) /
               (sqrt(list_dot_product(qv.v, qv.v))
                * sqrt(list_dot_product(av.v, av.v))), 6) AS cosine
  FROM probes p
  JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
  JOIN c qv ON qv.vec_id = p.query_id
  JOIN c av ON av.vec_id = a.vec_id)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored) t
WHERE rank <= {K}
"""


def _spark_ivf(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        n_centroids=N_CENTROIDS, nprobe=NPROBE, k=K,
    )


def test_ivf_matches_duckdb_oracle(spark, sf_dir):
    srows = sorted(
        tuple(r) for r in _spark_ivf(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    drows = sorted(
        (r[0], r[1], f"{r[2]:.9g}", r[3])
        for r in con.execute(IVF_SQL).fetchall()
    )
    srows = [(a, b, f"{c:.9g}", d) for a, b, c, d in srows]
    assert srows == drows


def test_ivf_recall_floor_vs_brute(spark, sf_dir):
    # testdata embeddings are uniform random — the worst case for IVF
    # (neighborhoods don't cluster), so the floor is deliberately loose;
    # clustered real embeddings sit far above it. nprobe=n_centroids must
    # be exact (every cell probed ⇒ identical candidate set to brute force).
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    brute = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(
            e, q, "vec_id", "embedding", "vec_id", "embedding", k=K
        ).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in _spark_ivf(spark, sf_dir).collect()
    }
    assert len(ivf & brute) / len(brute) >= 0.15

    full = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            e, q, "vec_id", "embedding", "vec_id", "embedding",
            n_centroids=N_CENTROIDS, nprobe=N_CENTROIDS, k=K,
        ).collect()
    }
    assert full == brute


def test_lloyd_refinement_keeps_contract(spark, sf_dir):
    # one refinement pass: same schema, same per-query row count, centroids
    # still N_CENTROIDS rows of the input dimensionality
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = train_centroids(e, "vec_id", "embedding", N_CENTROIDS, iters=1)
    rows = cent.collect()
    assert len(rows) == N_CENTROIDS
    dim = len(rows[0]["__cent"])
    assert all(len(r["__cent"]) == dim for r in rows)
    q = e.filter(F.col("vec_id") < N_QUERIES)
    out = ivf_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        n_centroids=N_CENTROIDS, nprobe=NPROBE, k=K, centroids=cent,
    )
    assert out.columns == ["query_id", "neighbor_id", "cosine", "rank"]
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] <= K for r in per_q)
