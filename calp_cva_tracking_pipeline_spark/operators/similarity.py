"""Similarity search over embedding columns (beyond-reference capability).

Brute-force cosine top-k is the correctness baseline; LSH-bucketed ANN is the
scale path (candidates per query ≈ corpus/2^planes instead of full corpus).
Dot products run as JVM higher-order functions (zip_with + aggregate) — no
Python in the loop, whole-stage codegen applies.

At 100 TB the corpus side is hash-partitioned once and reused across query
batches; the (small) query set is broadcast so the scan side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.partitioning import (
    spread_small_input,
)


def random_planes(
    n_planes: int, dim: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a fixed LCG.

    Components are in [-1, 1); reproducible across runs/engines without
    numpy's RNG (same reasoning as functions.hashing.minhash_params).
    ``dim`` is the embedding dimensionality — a declared schema constant,
    not probed from data (no driver-side action in plan construction).
    Different ``seed`` values give independent LSH tables.
    """
    planes, state = [], seed
    for _ in range(n_planes):
        comps = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) % (2**31)
            comps.append(state / float(2**30) - 1.0)
        planes.append(comps)
    return planes


def dot(a: Column, b: Column) -> Column:
    """Sequential-order double dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    queries × corpus via broadcast of the (small) query side — the corpus
    scan stays shuffle-free; ranking is a per-query-key window. Ordering key
    is (rounded cosine desc, id) so ranks are stable under float jitter.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qvec"),
    )
    c = spread_small_input(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(cosine_similarity(F.col("__qvec"), F.col("__cvec")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def plane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id of ``vec`` against ``planes`` (bit i set iff
    vec · plane_i >= 0). Pure JVM expression."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
        for i, plane in enumerate(planes)
    ]
    b = bits[0]
    for t in bits[1:]:
        b = b + t
    return b


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    n_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join, exact cosine within
    bucket. The scale path — candidate count per table drops
    ~2^n_planes-fold versus brute force.

    Recall comes from OR-amplification over ``n_tables`` independent hash
    tables (per-table seed offsets): a neighbor is a candidate if it
    collides with the query in ANY table. A single table's recall cliffs for
    neighbors near a hyperplane; with T tables the miss probability decays
    as (1 - p^b)^T.

    Shape for 100 TB: each table is a broadcast join of the (small) query
    side against the corpus scan — the corpus is scanned ``n_tables`` times
    but NEVER shuffled; scoring happens inside the table join, and the
    per-pair groupBy (pairs colliding in several tables score identically)
    shuffles only the candidate set, which is ≪ corpus. Same output schema
    as brute_force_topk.
    """
    c = spread_small_input(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("__qvec"),
    )
    scored = None
    for t in range(n_tables):
        planes = random_planes(n_planes, dim=dim, seed=seed + 1000 * t)
        ct = c.withColumn("__bucket", plane_bucket(F.col("__cvec"), planes))
        qt = q.withColumn("__bucket", plane_bucket(F.col("__qvec"), planes))
        part = (
            ct.join(F.broadcast(qt), ["__bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    cosine_similarity(F.col("__qvec"), F.col("__cvec")), 6
                ).alias("cosine"),
            )
        )
        scored = part if scored is None else scored.unionByName(part)
    dedup = scored.groupBy("query_id", "neighbor_id").agg(
        F.max("cosine").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        dedup.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
