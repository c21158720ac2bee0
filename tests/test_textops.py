

def test_quality_gate_reason_ordering(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        quality_gate,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "too short"),                                  # short
        (2, "the " * 5 + "of " * 5 + "!!!!!!!!!!!!!!!!"),  # punct
        (3, " ".join(f"w{i}" for i in range(20))),         # stopword
        (4, "the of and to in is " + "dup " * 14),         # repetition
        (5, "the quick brown fox of a lazy dog and more "
            "unique words to pass every gate here now"),   # ok
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    g = quality_gate(F.col("text"))
    out = {
        r["doc_id"]: (r["k"], r["r"])
        for r in df.select(
            "doc_id", g["keep"].alias("k"), g["reason"].alias("r")
        ).collect()
    }
    assert out[1] == (False, "short")
    assert out[2] == (False, "punct")
    assert out[3] == (False, "stopword")
    assert out[4] == (False, "repetition")
    assert out[5] == (True, "ok")


def test_char_entropy_hand_computed(spark):
    import math

    from calp_cva_tracking_pipeline_spark.operators.textops import (
        char_entropy,
    )

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_chars"], r["entropy"])
        for r in char_entropy(df, "doc_id").collect()
    }
    assert out[1] == (4, 0.0)  # degenerate distribution
    assert out[2] == (4, round(math.log(2), 6))  # two equiprobable chars
    assert out[3] == (4, round(math.log(4), 6))  # uniform over 4
    # quality-gate direction: uniform > mixed > degenerate
    assert out[3][1] > out[2][1] > out[1][1]


def test_tfidf_keywords_semantics(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common shared words here"),
            (3, "common shared other tokens"),
        ],
        "doc_id bigint, text string",
    )
    out = tfidf_keywords(docs, "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.token, r.tf))
    # doc 1: 'common' appears 3x but is in every doc (low idf); 'rare'
    # appears once and only here (high idf) — rare must outrank common?
    # tf=3 * idf(common) vs tf=1 * idf(rare): idf_c = ln(4/4)+1 = 1,
    # idf_r = ln(4/2)+1 ≈ 1.693 → common 3.0 > rare 1.693: common ranks
    # first BY DESIGN (smoothed tf-idf, no tf normalization)
    assert sorted(by_doc[1]) == [(1, "common", 3), (2, "rare", 1)]
    # every doc gets exactly min(k, n_distinct_tokens) rows, ranks dense
    assert all(
        [r[0] for r in sorted(v)] == list(range(1, len(v) + 1))
        for v in by_doc.values()
    )
    # determinism under repartition
    out2 = tfidf_keywords(docs.repartition(5), "doc_id", k=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
