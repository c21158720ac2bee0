"""Direct unit tests for operators whose catalog slots were retired from
the driver's 50-row gate in round 6 (f11/a7/w5/x2/x7/so1/c1 rotation —
see catalog/relational.py header and COVERAGE).

Each retired SURVEY.md §2 row stays covered two ways: a documented merge
onto a still-gated query (COVERAGE) AND a hand-computed expectation here,
so the retirement never weakens the operator's verification below what a
driver row provided.

The round-7 rotation (a1/a3/a8/a10/x3/x4/c2/c12/j11/j15 out;
dd_components/dd_semantic/gr_pagerank/cdc_upsert/ev_funnel/
pf_percentiles/pk_pack_audit/mx_mixture/rt_bm25_topk/jx_salted_join in)
needs NO new tests here: unlike the round-6 deletions, those ten retirees
stay catalog-resident past position 50 with their DuckDB oracles, so
tests/test_oracle_parity.py still value-checks each of them at every SF —
strictly stronger coverage than a hand-computed expectation.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.text import keyword_flag
from calp_cva_tracking_pipeline_spark.operators.aggregate import ratio_of_sums
from calp_cva_tracking_pipeline_spark.operators.reshape import (
    fan_out_rows,
    union_ragged,
)
from calp_cva_tracking_pipeline_spark.operators.windows import top1_per_group


def test_union_ragged_null_fills_by_name(spark):
    # X2/SO2 — rbindlist(fill=TRUE): union by name, missing columns null.
    a = spark.createDataFrame([Row(k=1, amount=10.0), Row(k=2, amount=20.0)])
    b = spark.createDataFrame([Row(k=3, status="open")])
    u = union_ragged([a, b])
    assert sorted(u.columns) == ["amount", "k", "status"]
    rows = {r.k: r for r in u.collect()}
    assert rows[1].amount == 10.0 and rows[1].status is None
    assert rows[3].status == "open" and rows[3].amount is None


def test_union_ragged_three_way_order_preserves_multiplicity(spark):
    a = spark.createDataFrame([Row(k=1)])
    b = spark.createDataFrame([Row(k=1), Row(k=2)])
    c = spark.createDataFrame([Row(j=9)])
    u = union_ragged([a, b, c])
    assert u.count() == 4  # UNION ALL semantics, never dedup


def test_fan_out_rows_broadcast_mapping(spark):
    # X7 — duplicate rows for dependent keys via a broadcast mapping.
    base = spark.createDataFrame(
        [Row(id=0, name="REGION_0"), Row(id=1, name="REGION_1")]
    )
    out = fan_out_rows(
        base, "name",
        [("REGION_0", "COPY_A"), ("REGION_0", "COPY_B")],
    )
    names = sorted(r.name for r in out.collect())
    # originals always kept; mapped key fans out once per mapping row
    assert names == ["COPY_A", "COPY_B", "REGION_0", "REGION_1"]
    ids = {r.name: r.id for r in out.collect()}
    assert ids["COPY_A"] == 0 and ids["COPY_B"] == 0


def test_top1_per_group_deterministic_tiebreak(spark):
    # W5 — best-row-per-group; the tie on val=5 must break on id asc.
    df = spark.createDataFrame(
        [
            Row(g="a", id=2, val=5),
            Row(g="a", id=1, val=5),
            Row(g="a", id=3, val=1),
            Row(g="b", id=9, val=7),
        ]
    )
    out = top1_per_group(
        df, ["g"], [F.col("val").desc(), F.col("id").asc()]
    )
    got = {r.g: r.id for r in out.collect()}
    assert got == {"a": 1, "b": 9}
    # partitioning-independence: same winner at any input layout
    out2 = top1_per_group(
        df.repartition(7, "id"), ["g"], [F.col("val").desc(), F.col("id").asc()]
    )
    assert {r.g: r.id for r in out2.collect()} == got


def test_ratio_of_sums_exact_decimal(spark):
    # A7 — sum(a)/sum(b) per group through the decimal money path.
    df = spark.createDataFrame(
        [
            Row(g="x", a=1.0, b=2.0),
            Row(g="x", a=3.0, b=2.0),
            Row(g="y", a=10.0, b=4.0),
        ]
    )
    out = ratio_of_sums(df, ["g"], "a", "b", "ratio")
    got = {r.g: r.ratio for r in out.collect()}
    assert got == {"x": 1.0, "y": 2.5}


def test_except_all_preserves_multiplicity(spark):
    # SO1 — setdiff with multiplicity: 3 copies minus 1 copy leaves 2.
    a = spark.createDataFrame([Row(v="p")] * 3 + [Row(v="q")])
    b = spark.createDataFrame([Row(v="p"), Row(v="r")])
    got = {
        r.v: r.n
        for r in a.exceptAll(b).groupBy("v").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"p": 2, "q": 1}


def test_keyword_flag_word_boundary_case_insensitive(spark):
    # C1 — (?i)\b(alternation)\b over free text.
    df = spark.createDataFrame(
        [
            Row(id=1, text="Apache SPARK is fast"),
            Row(id=2, text="sparkle is not a keyword hit"),
            Row(id=3, text="vector search"),
            Row(id=4, text="nothing here"),
        ]
    )
    out = df.withColumn(
        "hit", keyword_flag(F.col("text"), ["spark", "vector"])
    )
    got = {r.id: r.hit for r in out.collect()}
    assert got == {1: True, 2: False, 3: True, 4: False}
