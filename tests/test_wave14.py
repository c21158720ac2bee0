"""Fourteenth-wave operators (round 8): exact set-similarity join and
fixed-iteration k-core — hand-computed expectations (oracle parity runs
separately in test_oracle_parity.py via the catalog entries)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Row
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.dedup import jaccard_join
from calp_cva_tracking_pipeline_spark.operators.graph import kcore


def _shingle_set(text: str, k: int = 3) -> set[str]:
    toks = text.strip().split()
    if len(toks) <= k:
        return {" ".join(toks[:k])}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _brute_jaccard(docs: dict[int, str], threshold: float, k: int = 3):
    out = {}
    for (ia, ta), (ib, tb) in combinations(sorted(docs.items()), 2):
        sa, sb = _shingle_set(ta, k), _shingle_set(tb, k)
        i, u = len(sa & sb), len(sa | sb)
        if u and i * 1_000_000 >= round(threshold * 1_000_000) * u:
            out[(ia, ib)] = round(i / u, 6)
    return out


def test_jaccard_join_matches_brute_force(spark):
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",   # near-dup of 1
        3: "the quick brown fox jumps over the lazy dog",   # exact dup of 1
        4: "completely different content about spark engines and scale",
        5: "content about spark engines and scale at night",  # overlaps 4
        6: "one two",  # shorter than k -> single padded shingle
    }
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in docs.items()]
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_join(df, "doc_id", "text", threshold=0.4).collect()
    }
    want = _brute_jaccard(docs, 0.4)
    assert got == want
    assert got[(1, 3)] == 1.0  # exact dup pair present at J=1
    assert (1, 2) in got  # near-dup found
    assert all(not (a == 4 and b == 6) for a, b in got)


def test_jaccard_join_threshold_boundary_integer_exact(spark):
    # J(a,b) = 2/4 = 0.5 exactly: must be INCLUDED at t=0.5 (>=) and
    # EXCLUDED at t=0.500001 — the integer predicate decides, not float
    a = "w1 w2 w3 w4 w5"  # shingles: {w1w2w3, w2w3w4, w3w4w5}
    b = "w2 w3 w4 w5 w6"  # shingles: {w2w3w4, w3w4w5, w4w5w6}
    # intersection 2, union 4 -> 0.5
    df = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    at = jaccard_join(df, "doc_id", "text", threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in at] == [(1, 2, 0.5)]
    above = jaccard_join(df, "doc_id", "text", threshold=0.500001).collect()
    assert above == []


def test_kcore_peels_cascade(spark):
    # triangle {1,2,3} + chain 3-4-5: k=2 core = the triangle.
    # Node 5 (deg 1) peels in round 1, which drops 4 to deg 1 -> peels in
    # round 2 — the cascade needs >1 iteration, proving the loop carries.
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r.node, r.degree) for r in kcore(df, k=2, n_iter=4).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_canonicalizes_and_ignores_duplicates(spark):
    # directed duplicates + self-loop must not inflate degrees
    edges = [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {(r.node, r.degree) for r in kcore(df, k=2, n_iter=3).collect()}
    assert got == {(1, 2), (2, 2), (3, 2)}


def test_kcore_fixed_iterations_converged_on_catalog_graph(sf_dir):
    """The catalog's 6 rounds must be a true fixpoint on the shipped
    data — one extra round changes nothing (otherwise the published
    census would be an unconverged artifact of the iteration cap).
    Checked through the DuckDB oracle twin (sub-second, where a
    double Spark run of the 7-round DAG costs minutes); oracle parity
    ties the Spark side to this same census at every SF."""
    import duckdb

    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        KCORE_ITERS,
        KCORE_K,
    )
    from calp_cva_tracking_pipeline_spark.operators.graph import kcore_sql

    edges = (
        "SELECT a.l_partkey AS src, b.l_partkey AS dst "
        "FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a "
        "JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    at = con.execute(kcore_sql(edges, k=KCORE_K, n_iter=KCORE_ITERS)).fetchall()
    plus = con.execute(
        kcore_sql(edges, k=KCORE_K, n_iter=KCORE_ITERS + 1)
    ).fetchall()
    assert len(at) > 0
    assert at == plus


def test_snapshot_diff_classifies_and_names_columns(spark):
    from calp_cva_tracking_pipeline_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),   # unchanged
            Row(k=2, a="x", b=2.0),   # b updated
            Row(k=3, a="x", b=None),  # NULL -> value: update
            Row(k=4, a="x", b=4.0),   # deleted
            Row(k=5, a=None, b=5.0),  # NULL == NULL: unchanged
        ]
    )
    new = spark.createDataFrame(
        [
            Row(k=1, a="x", b=1.0),
            Row(k=2, a="y", b=9.0),
            Row(k=3, a="x", b=3.0),
            Row(k=5, a=None, b=5.0),
            Row(k=6, a="new", b=6.0),  # inserted
        ]
    )
    got = {
        r.k: (r.change_type, r.changed_cols)
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("update", "a,b"),
        3: ("update", "b"),
        4: ("delete", ""),
        6: ("insert", ""),
    }


def test_dq_checks_single_pass_ledger(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        dq_checks,
    )

    df = spark.createDataFrame(
        [
            Row(id=1, v=10.0),
            Row(id=2, v=-1.0),   # violates positive
            Row(id=2, v=None),   # duplicate id; NULL v not a violation
            Row(id=3, v=-5.0),   # violates positive
        ]
    )
    got = {
        r.rule: (r.n_rows, r.n_violations, r.violation_rate)
        for r in dq_checks(
            df,
            rules=[("v_positive", F.col("v") <= 0)],
            unique_cols=["id"],
        ).collect()
    }
    assert got == {
        "id_unique": (4, 1, 0.25),      # 4 non-null ids, 3 distinct
        "v_positive": (4, 2, 0.5),      # NULL v does not violate
    }
