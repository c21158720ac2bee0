"""BPE trainer (operators.bpe): hand-computed merge learning, greedy
rank-based apply, distributed/driver split, determinism."""

from __future__ import annotations

from pyspark.sql import Row

from calp_cva_tracking_pipeline_spark.operators.bpe import (
    END,
    apply_bpe,
    learn_bpe,
    word_histogram,
)


def test_learn_bpe_hand_computed():
    # corpus: low x5, lower x2, newest x6 (the classic BPE example shape)
    hist = [("newest", 6), ("low", 5), ("lower", 2)]
    merges = learn_bpe(hist, 4)
    # pair counts round 1: ('e','s')=6, ('s','t')=6, ('t',END)=6,
    # ('n','e')=6, ('w','e')=6+2=8, ('l','o')=7, ('o','w')=7, ... the
    # max is ('w','e')=8 -> first merge
    assert merges[0] == ("w", "e")
    # deterministic full list for this histogram
    again = learn_bpe(hist, 4)
    assert merges == again and len(merges) == 4


def test_learn_bpe_tie_breaks_lexicographic():
    hist = [("ab", 3), ("cd", 3)]
    merges = learn_bpe(hist, 2)
    # ('a','b'), ('b',END), ('c','d'), ('d',END) all count 3 ->
    # lexicographic first is ('a','b'); then ('b</w>' formed next round)
    assert merges[0] == ("a", "b")


def test_word_histogram_distributed(spark):
    df = spark.createDataFrame(
        [Row(text="aa bb aa"), Row(text="BB aa"), Row(text=None)]
    )
    hist = word_histogram(df)
    assert hist == [("aa", 3), ("bb", 2)]


def test_apply_bpe_greedy_rank_order(spark):
    hist = [("abab", 10)]
    merges = learn_bpe(hist, 3)
    # round 1: ('a','b') count 20 -> merge; round 2: ('ab','ab') count 10
    # (vs ('ab', END)+('b',END)... ) -> 'abab'; round 3: ('abab', END)
    assert merges[0] == ("a", "b")
    df = spark.createDataFrame([Row(id=1, text="abab ab")])
    out = apply_bpe(df, merges).collect()[0]
    # 'abab' fully merges per the learned ranks; 'ab' becomes 'ab'+END
    assert out.bpe_tokens[0].startswith("abab")
    assert "ab" in out.bpe_tokens[1] or out.bpe_tokens[1].startswith("ab")


def test_apply_bpe_roundtrip_reconstructs_text(spark):
    # concatenating a word's subword tokens and stripping END restores it
    hist = [("hello", 4), ("help", 3), ("world", 2)]
    merges = learn_bpe(hist, 6)
    df = spark.createDataFrame(
        [Row(id=1, text="hello help world"), Row(id=2, text=None)]
    )
    rows = {r.id: r for r in apply_bpe(df, merges).collect()}
    joined = "".join(rows[1].bpe_tokens).replace(END, " ").strip()
    assert joined == "hello help world"
    assert rows[2].bpe_tokens is None


def test_full_train_apply_pipeline_deterministic(spark, sf_dir):
    from calp_cva_tracking_pipeline_spark.catalog.common import T

    d = T(spark, sf_dir, "documents").limit(200)
    hist = word_histogram(d)
    merges = learn_bpe(hist, 50)
    assert len(merges) == 50
    out1 = apply_bpe(d, merges).select("doc_id", "bpe_tokens")
    out2 = apply_bpe(d.repartition(7), merges).select("doc_id", "bpe_tokens")
    a = sorted((r.doc_id, tuple(r.bpe_tokens or ())) for r in out1.collect())
    b = sorted((r.doc_id, tuple(r.bpe_tokens or ())) for r in out2.collect())
    assert a == b
    # learned tokenization is never longer than character count + 1/word
    r = next(x for x in out1.collect() if x.bpe_tokens)
    assert len(r.bpe_tokens) >= 1


def test_learned_bpe_drives_packing(spark, sf_dir):
    """Composition: learned-BPE token counts feed pack_sequences'
    token_col — the real token budget a trained tokenizer implies, not
    the whitespace proxy."""
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    d = T(spark, sf_dir, "documents").limit(100)
    merges = learn_bpe(word_histogram(d), 30)
    counted = apply_bpe(d, merges).withColumn(
        "n_bpe", F.size("bpe_tokens")
    )
    packs = pack_sequences(
        counted, "doc_id", budget=400, token_col="n_bpe", num_shards=4
    ).collect()
    assert len(packs) == 100  # no row dropped
    by_pack = {}
    for r in packs:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        total = sum(m["n_tokens"] for m in members)
        if not any(m["oversized"] for m in members):
            assert total <= 400
