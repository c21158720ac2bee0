"""operators.dedup.passage_overlap_pairs — exact-substring duplication
semantics pinned on constructed corpora (the catalog entry
dd_passage_overlap is oracle-verified at all three SFs)."""

from __future__ import annotations

from calp_cva_tracking_pipeline_spark.operators.dedup import (
    passage_overlap_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_counting(spark):
    # docs 1 and 2 share the 4-token span "a b c d" twice-overlapping?
    # spans of doc1: "a b c d","b c d e"; doc2: "z a b c","a b c d".
    df = _docs(spark, [(1, "a b c d e"), (2, "z a b c d"), (3, "q w e r")])
    got = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in passage_overlap_pairs(df, "doc_id", window=4).collect()
    }
    assert got == {(1, 2): 1}


def test_identical_docs_share_all_spans(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens, W=4 -> 7 spans
    df = _docs(spark, [(1, text), (2, text)])
    got = passage_overlap_pairs(df, "doc_id", window=4).collect()
    assert [(r["id_a"], r["id_b"], r["n_shared"]) for r in got] == [(1, 2, 7)]


def test_short_docs_emit_nothing(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])  # < window tokens
    assert passage_overlap_pairs(df, "doc_id", window=4).count() == 0


def test_boilerplate_cap_drops_bucket(spark):
    # the same span in 5 docs: cap=4 drops it entirely (no pairs), the
    # default cap keeps all 10 pairs.
    rows = [(i, f"pre{i} common a b c post{i}") for i in range(5)]
    df = _docs(spark, rows)
    assert (
        passage_overlap_pairs(
            df, "doc_id", window=4, max_docs_per_window=4
        ).count()
        == 0
    )
    assert passage_overlap_pairs(df, "doc_id", window=4).count() == 10


def test_case_sensitive_exact_match(spark):
    df = _docs(spark, [(1, "A b c d"), (2, "a b c d")])
    assert passage_overlap_pairs(df, "doc_id", window=4).count() == 0


def test_containment_short_doc_quoted_in_long(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        passage_containment,
    )

    quote = " ".join(f"q{i}" for i in range(6))  # 6 tokens, W=4 -> 3 spans
    long_doc = " ".join(f"pre{i}" for i in range(20)) + " " + quote + " " \
        + " ".join(f"post{i}" for i in range(20))
    df = _docs(spark, [(1, quote), (2, long_doc)])
    got = passage_containment(df, "doc_id", window=4).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"], r["n_shared"]) == (1, 2, 3)
    assert r["containment_a"] == 1.0  # the quote is fully contained
    assert r["containment_b"] < 0.1  # the container barely overlaps
