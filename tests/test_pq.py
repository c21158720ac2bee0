"""Product-quantization tier (operators.similarity.pq_*): encoding
invariants, the exact-ADC property on codebook-aligned data, and the
measured recall floor on the uniform worst case. The catalog entry
ann_pq_topk is oracle-verified at all three SFs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.similarity import (
    brute_force_topk,
    pq_codebooks,
    pq_encode,
    pq_topk,
)

DIM = 8
M = 2
SUB = DIM // M


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_one_code_per_subspace_and_partition_invariance(spark):
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(60)
    ]
    df = _vecs(spark, rows)
    cb = pq_codebooks(df, "vec_id", "embedding", m=M, k=4, dim=DIM)
    codes = pq_encode(df, cb, "vec_id", "embedding", m=M, dim=DIM)
    got = codes.collect()
    assert len(got) == 60 * M
    assert len({(r["__id"], r["m"]) for r in got}) == 60 * M
    again = sorted(
        map(
            tuple,
            pq_encode(
                df.repartition(7), cb, "vec_id", "embedding", m=M, dim=DIM
            ).collect(),
        )
    )
    assert again == sorted(map(tuple, got))


def test_centroid_vectors_encode_to_themselves(spark):
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(20)
    ]
    df = _vecs(spark, rows)
    cb = pq_codebooks(df, "vec_id", "embedding", m=M, k=4, dim=DIM)
    codes = pq_encode(df, cb, "vec_id", "embedding", m=M, dim=DIM)
    for r in codes.filter(F.col("__id") < 4).collect():
        assert r["code"] == r["__id"]  # zero residual in every subspace


def test_adc_exact_on_codebook_aligned_corpus(spark):
    # corpus vectors are concatenations of codebook subvectors -> the
    # quantization residual is zero and ADC distance IS the true squared
    # L2, so PQ ranking equals exact L2 ranking.
    rng = random.Random(11)
    seed_rows = [
        (i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in range(4)
    ]
    subs = [[v[m * SUB:(m + 1) * SUB] for (i, v) in seed_rows] for m in range(M)]
    rows = list(seed_rows)
    combos = [(a, b) for a in range(4) for b in range(4)]
    for j, (a, b) in enumerate(combos):
        rows.append((100 + j, subs[0][a] + subs[1][b]))
    df = _vecs(spark, rows)
    q = df.filter(F.col("vec_id") == 100)
    out = pq_topk(
        df, q, "vec_id", "embedding", "vec_id", "embedding",
        m=M, k_codebook=4, k=3, dim=DIM,
    ).collect()
    # neighbor at adist 0 exists: vec 0 shares both subvectors with 100
    # (combo (0,0)) -> top-1 is the zero-distance duplicate structure.
    assert out[0]["adist"] == 0.0
    ranks = {r["rank"] for r in out}
    assert ranks == {1, 2, 3}


def test_uniform_worst_case_recall_floor(spark, sf_dir):
    # measured 0.375 at sf0.01 on uniform embeddings (cosine-vs-L2 rank
    # target mismatch + no Lloyd refinement — the documented worst case,
    # cf. the LSH 0.40 note). Pin a floor so a regression to near-random
    # (5/499 ~ 0.01) fails loudly.
    from calp_cva_tracking_pipeline_spark.catalog.common import T

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8)
    brute = brute_force_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding", k=5
    ).collect()
    pq = pq_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        m=4, k_codebook=16, k=5, dim=64,
    ).collect()
    b, p = {}, {}
    for r in brute:
        b.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in pq:
        p.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(b[qid] & p.get(qid, set())) for qid in b)
    total = sum(len(v) for v in b.values())
    assert hits / total >= 0.15


def test_ivfpq_is_subset_of_pq_candidates(spark, sf_dir):
    # IVF pruning only removes candidates: every IVF×PQ result pair must
    # carry the same adist PQ assigns it (same codebooks, same LUT), and
    # results come only from probed cells.
    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        ivf_pq_topk,
        pq_topk,
    )

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    full = {
        (r["query_id"], r["neighbor_id"]): r["adist"]
        for r in pq_topk(
            e, q, "vec_id", "embedding", "vec_id", "embedding",
            m=4, k_codebook=16, k=500, dim=64,
        ).collect()
    }
    pruned = ivf_pq_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        n_centroids=16, nprobe=4, m=4, k_codebook=16, k=5, dim=64,
    ).collect()
    assert len(pruned) > 0
    for r in pruned:
        key = (r["query_id"], r["neighbor_id"])
        assert key in full and full[key] == r["adist"]


def test_lloyd_refinement_reduces_quantization_distortion(spark):
    # clustered corpus (the real-embedding regime): 8 well-separated
    # centers + small noise. Lloyd's guarantee is NON-INCREASING
    # quantization distortion; on clusters the drop vs the arbitrary
    # lowest-id init is large. (Recall@5 is deliberately NOT the metric:
    # once whole clusters quantize to one code, ADC distances tie and
    # top-5 membership is id-tie-break noise.)
    import random

    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        _explode_subspaces,
        pq_codebooks,
        sq_dist,
    )

    rng = random.Random(13)
    dim, m = 8, 2
    centers = [
        [rng.uniform(-10, 10) for _ in range(dim)] for _ in range(8)
    ]
    rows = []
    for i in range(240):
        c = centers[i % 8]
        rows.append((i, [x + rng.gauss(0, 0.3) for x in c]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )

    def distortion(cb):
        subs = _explode_subspaces(
            df.select(
                F.col("vec_id").alias("__id"),
                F.col("embedding").alias("__ev"),
            ),
            "__id", "__ev", m, dim,
        )
        d = (
            subs.join(F.broadcast(cb), "m")
            .select(
                "__id", "m",
                sq_dist(F.col("__sub"), F.col("__cb")).alias("d2"),
            )
            .groupBy("__id", "m")
            .agg(F.min("d2").alias("d2"))
            .agg(F.avg("d2").alias("avg"))
            .collect()[0]["avg"]
        )
        return d

    cb0 = pq_codebooks(df, "vec_id", "embedding", m=m, k=16, dim=dim)
    cb2 = pq_codebooks(
        df, "vec_id", "embedding", m=m, k=16, dim=dim, iters=2
    )
    d0, d2 = distortion(cb0), distortion(cb2)
    assert d2 < d0 * 0.8  # large drop on clustered data
    # stability: rebuilding under a different partitioning gives the
    # same codebook to 9 dp (exact equality is NOT promised — the Lloyd
    # means are float partial sums, which is why oracle-verified flows
    # pin iters=0)
    again = pq_codebooks(
        df.repartition(7), "vec_id", "embedding", m=m, k=16, dim=dim,
        iters=2,
    )

    def canon(cb):
        return sorted(
            (r["m"], r["centroid_id"],
             tuple(round(x, 9) for x in r["__cb"]))
            for r in cb.collect()
        )

    assert canon(cb2) == canon(again)


def test_rerank_cosines_are_exact(spark, sf_dir):
    # stage-2 scores must equal the brute-force cosine for every pair it
    # ranks — rerank changes WHICH pairs are scored, never their score.
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        brute_force_topk,
        pq_rerank_topk,
    )

    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    brute = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(
            e, q, "vec_id", "embedding", "vec_id", "embedding", k=500
        ).collect()
    }
    rr = pq_rerank_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        m=4, k_codebook=16, shortlist=25, k=5, dim=64,
    ).collect()
    assert len(rr) == 4 * 5
    for r in rr:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cosine"]
