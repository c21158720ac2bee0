"""Script-07 program: branch-ordered percentage standardizer, boolean
normalization, overlap reconciliation, final cva override."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.plans.projects import (
    build_project_features,
    project_text,
    standardize_percentage,
)


@pytest.mark.parametrize(
    "answer,expected",
    [
        ("25%", 25.0),
        ("About 12.5% of funds", 12.5),
        ("less than 1%", 1.0),    # '%' branch wins over 'less than 1'!
        ("less than 1", 0.0),
        ("30 percent", 30.0),
        ("around 30 percent of total", 30.0),
        ("0.4", 0.4),
        ("42", 42.0),
        ("about 30", 30.0),        # fallback strips non-numeric
        ("n/a", None),             # no digits -> null
        ("none", None),
    ],
)
def test_standardize_percentage_branch_order(spark, answer, expected):
    df = spark.createDataFrame([(answer,)], "answer string")
    got = df.select(
        standardize_percentage(F.col("answer")).alias("p")
    ).collect()[0]["p"]
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


def _qa(spark):
    rows = [
        # project, question, answer, name, objective
        ("P1", "q_quant", "60%", "Project One", "obj1"),
        ("P1", "q_quant2", "70%", "Project One", "obj1"),   # clamps at 100
        ("P2", "q_quant", "0%", "Project Two", "obj2"),     # zero -> bool F
        ("P3", "q_flag", "Yes", "Project Three", "obj3"),
        ("P4", "q_flag", "No", "Project Four", "obj4"),     # false -> pct 0
        ("P5", "q_quant", "20%", "Project Five", "obj5"),
        ("P5", "q_flag", "no", "Project Five", "obj5"),     # pct>0 overrides
        ("P6", "q_unlabeled", "99%", "Project Six", "obj6"),  # ignored
        ("P7", "q_quant", "no digits here", "P7", "obj7"),  # screened out
    ]
    return spark.createDataFrame(
        rows,
        "project_id string, question string, answer string,"
        " project_name string, project_objective string",
    )


def _labels(spark):
    return spark.createDataFrame(
        [("q_quant", "quantC"), ("q_quant2", "quantV"), ("q_flag", "flagCVA")],
        "question string, question_type string",
    )


def test_build_project_features(spark):
    out = build_project_features(_qa(spark), _labels(spark))
    rows = {r["project_id"]: r for r in out.collect()}
    assert rows["P1"]["cva_percentage"] == 1.0      # 130 clamped -> 1.0
    assert rows["P1"]["cva"] is True                # pct>0 override
    assert rows["P2"]["cva_percentage"] == 0.0
    assert rows["P2"]["cva"] is False               # zero_to_bool
    assert rows["P3"]["cva"] is True
    assert rows["P3"]["cva_percentage"] is None     # flag-only project
    assert rows["P4"]["cva"] is False
    assert rows["P4"]["cva_percentage"] == 0.0      # bool_to_zero
    assert rows["P5"]["cva"] is True                # pct 0.2 overrides 'no'
    assert "P6" not in rows and "P7" not in rows


def test_project_text_distinct(spark):
    out = project_text(_qa(spark))
    assert out.count() == 7  # one row per project despite P1/P5 dup rows
