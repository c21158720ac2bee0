

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
