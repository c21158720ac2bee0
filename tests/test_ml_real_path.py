"""Deploy-time verification of the REAL HF classifier path
(operators.mlstub._classify_flows_hf — the ~20 lines the stub-only
container can never execute).

Skips wherever torch/transformers are absent (this build container).
In any environment that has them — the deploy image, a GPU pool node —
run:

    python -m pytest tests/test_ml_real_path.py -q

optionally pointing $SPARK_GRAFT_HF_TEST_MODEL at a local or mirrored
model (default: a ~100KB random-weight public test model, so the check
needs no real checkpoint download and asserts plumbing, not accuracy).
This proves the exact Arrow plumbing the production model uses: scalar-
iterator pandas_udf, struct return, per-worker pipeline construction,
null-text handling, row-count preservation.
"""

from __future__ import annotations

import os

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pyspark.sql import Row

from calp_cva_tracking_pipeline_spark.operators.mlstub import (
    _classify_flows_hf,
    classify_flows,
)

TEST_MODEL = os.environ.get(
    "SPARK_GRAFT_HF_TEST_MODEL",
    "hf-internal-testing/tiny-random-DistilBertForSequenceClassification",
)


def test_hf_real_path_plumbing(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="cash and voucher assistance in region A"),
            Row(id=2, text=""),
            Row(id=3, text=None),  # null text must not crash the worker
            Row(id=4, text="x " * 2000),  # long text exercises truncation
        ]
    )
    out = _classify_flows_hf(df, "text", model=TEST_MODEL)
    assert out.columns == ["id", "text", "predicted_class", "predicted_confidence"]
    rows = out.collect()
    assert len(rows) == 4  # one prediction per input row, none dropped
    for r in rows:
        assert r.predicted_class is not None
        assert 0.0 <= r.predicted_confidence <= 1.0


def test_classify_flows_dispatches_to_real_model(spark):
    # with torch importable, classify_flows must take the HF path (the
    # plan contains a Python stage; the native stub path contains none)
    df = spark.createDataFrame([Row(text="sample")])
    out = classify_flows(df, "text")
    assert "pythonUDF" in out._jdf.queryExecution().executedPlan().toString() or (
        "ArrowEvalPython" in out._jdf.queryExecution().executedPlan().toString()
    )
