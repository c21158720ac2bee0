"""Decontamination (vs a DuckDB n-gram oracle) and sequence packing
(invariants + determinism)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.operators.decontam import (
    contamination_hits,
    decontaminate,
)
from calp_cva_tracking_pipeline_spark.operators.packing import (
    pack_sequences,
)

# DuckDB twin of operators.dedup.shingles(k=n): same whitespace
# tokenization, same whole-text fallback for short docs (slice past the
# end just truncates in both engines).
_DUCK_GRAMS = """
SELECT {id} AS id,
       unnest(list_transform(
         generate_series(0, greatest(len(toks) - {n}, 0)),
         i -> array_to_string(list_slice(toks, i + 1, i + {n}), ' '))) AS g
FROM (
  SELECT {id}, string_split_regex(trim(text), '\\s+') AS toks
  FROM {table}
)
"""


def test_contamination_hits_match_duckdb(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("text").alias("bench_text")
    )
    got = {
        r["doc_id"]: r["contamination_hits"]
        for r in contamination_hits(
            train,
            bench,
            "doc_id",
            "text",
            bench_text_col="bench_text",
            n=5,
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW train AS SELECT * FROM documents WHERE doc_id % 3 <> 0"
    )
    con.execute(
        "CREATE VIEW bench AS SELECT * FROM documents WHERE doc_id % 3 = 0"
    )
    tg = _DUCK_GRAMS.format(id="doc_id", n=5, table="train")
    bg = _DUCK_GRAMS.format(id="doc_id", n=5, table="bench")
    want = dict(
        con.execute(
            f"""
            SELECT id, COUNT(DISTINCT g) FROM ({tg})
            WHERE g IN (SELECT g FROM ({bg}))
            GROUP BY id
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_decontaminate_drop_and_flag_agree(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").limit(300)
    train = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    kept = decontaminate(train, bench, "doc_id", "text", n=5)
    flagged = decontaminate(
        train, bench, "doc_id", "text", n=5, mode="flag"
    )
    assert flagged.count() == train.count()  # flag never drops
    clean_ids = {
        r["doc_id"]
        for r in flagged.filter(~F.col("contaminated")).collect()
    }
    assert {r["doc_id"] for r in kept.collect()} == clean_ids


def test_decontaminate_planted_overlap(spark):
    marker = "zq alpha beta gamma delta epsilon zeta eta theta iota"
    train = spark.createDataFrame(
        [
            (1, f"prefix words here {marker} and a tail"),
            (2, "completely unrelated text with enough words to shingle"),
            (3, marker),  # exactly the contaminated span
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(f"benchmark question {marker} benchmark answer",)],
        "text string",
    )
    kept = {
        r["doc_id"]
        for r in decontaminate(
            train, bench, "doc_id", "text", n=10
        ).collect()
    }
    assert kept == {2}


def test_pack_sequences_invariants(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    budget = 256
    packs = pack_sequences(
        docs, "doc_id", budget=budget, num_shards=8
    ).cache()
    rows = packs.collect()
    assert len(rows) == docs.count()  # every doc assigned exactly once
    assert len({r["id"] for r in rows}) == len(rows)
    by_pack: dict[int, list] = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, members in by_pack.items():
        total = sum(m["n_tokens"] for m in members)
        assert all(m["pack_tokens"] == total for m in members)
        if any(m["oversized"] for m in members):
            assert len(members) == 1  # oversized docs pack alone
        else:
            assert total <= budget, (pid, total)
    # occupancy: FFD on many small docs should stay well above the
    # 2-approximation floor — every non-last bin of a shard is > half full
    n_packs = len(by_pack)
    lower_bound = sum(min(r["n_tokens"], budget) for r in rows) / budget
    assert n_packs <= 2 * lower_bound + 8  # + num_shards slack
    packs.unpersist()


def test_pack_sequences_deterministic_under_repartition(spark, sf_dir):
    docs = T(spark, sf_dir, "documents").limit(400)
    a = pack_sequences(docs, "doc_id", budget=300, num_shards=4)
    b = pack_sequences(
        docs.repartition(13), "doc_id", budget=300, num_shards=4
    )
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_pack_sequences_explicit_token_col(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 150), (4, 90), (5, 500)],
        "doc_id bigint, toks bigint",
    )
    rows = pack_sequences(
        df, "doc_id", budget=200, token_col="toks", num_shards=1
    ).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[5]["oversized"] and by_id[5]["pack_tokens"] == 500
    packs = {}
    for r in rows:
        packs.setdefault(r["pack_id"], []).append(r["id"])
    # FFD at budget 200: 150+? (90 fits: 240>200 no, 150+? none of 100s
    # fit) → bins {150,...}: 150 alone? 150+? 100>50 no, 90>50 no →
    # {150}, {100,100}, {90}, {500 oversized}
    sizes = sorted(
        sum(by_id[i]["n_tokens"] for i in ids)
        for ids in packs.values()
    )
    assert sizes == [90, 150, 200, 500]


def test_decontam_shuffled_join_matches_broadcast(spark, sf_dir):
    """broadcast_benchmark=False (the too-big-to-broadcast fallback) must
    produce the identical hit set via the shuffled semi join."""
    from calp_cva_tracking_pipeline_spark.catalog.common import T as _T

    docs = _T(spark, sf_dir, "documents").limit(300)
    train = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0)
    kw = dict(id_col="doc_id", text_col="text", n=5)
    a = sorted(
        tuple(r)
        for r in contamination_hits(train, bench, **kw).collect()
    )
    b = sorted(
        tuple(r)
        for r in contamination_hits(
            train, bench, broadcast_benchmark=False, **kw
        ).collect()
    )
    assert a == b and len(a) > 0


def test_pack_sequences_string_ids(spark):
    df = spark.createDataFrame(
        [("doc-a", 100), ("doc-b", 120), ("doc-c", 90)],
        "doc_id string, toks bigint",
    )
    rows = pack_sequences(
        df, "doc_id", budget=250, token_col="toks", num_shards=2
    ).collect()
    assert {r["id"] for r in rows} == {"doc-a", "doc-b", "doc-c"}
    assert all(r["pack_tokens"] <= 250 for r in rows)


def test_null_texts_never_contaminate_and_still_pack(spark):
    train = spark.createDataFrame(
        [(1, None), (2, "real words that shingle fine here")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(None,), ("other words",)], "text string")
    flagged = decontaminate(
        train, bench, "doc_id", "text", n=3, mode="flag"
    )
    rows = {r["doc_id"]: r["contamination_hits"] for r in flagged.collect()}
    assert rows == {1: 0, 2: 0}  # null never matches null
    packs = pack_sequences(train, "doc_id", budget=100).collect()
    assert {r["id"] for r in packs} == {1, 2}
    assert {r["n_tokens"] for r in packs if r["id"] == 1} == {0}


def test_length_buckets_are_balanced_and_ordered(spark):
    # quartile boundaries split a spread-out length distribution into 4
    # buckets of ~equal population, and bucket is monotone in length.
    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        pk_length_buckets,
    )

    out = pk_length_buckets(spark, "/root/testdata/sf0.001").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["n_tokens"])
    assert set(by_bucket) == {0, 1, 2, 3}
    sizes = [len(v) for _, v in sorted(by_bucket.items())]
    assert max(sizes) - min(sizes) <= len(out) // 2  # roughly balanced
    for b in range(3):
        assert max(by_bucket[b]) <= min(by_bucket[b + 1])
