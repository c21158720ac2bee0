"""ML inference surface (SURVEY.md §2.11 M1) as Arrow-batched Pandas UDFs.

The reference shells out to a Python BERT classifier via CSV files
(classifier_code/flow_inference.py:11-28, invoked between code/08 and
code/09). Here inference is an in-DAG scalar-iterator pandas_udf: the model
loads once per executor python worker (not per batch), batches arrive via
Arrow, and the classifier scales with the cluster instead of being a
single-process side trip.

torch/transformers are not available in this container, so the real model is
gated behind an import-try; the default path is a *deterministic* stub whose
outputs are reproducible in ANSI SQL, which lets the driver's DuckDB oracle
verify the UDF plumbing end-to-end (schema, batching, null handling).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_HF_MODEL = "alex-miller/cva-flow-weighted-classifier2"  # reference model card

_PRED_SCHEMA = StructType(
    [
        StructField("predicted_class", StringType()),
        StructField("predicted_confidence", DoubleType()),
    ]
)


def _stub_confidence(text: pd.Series) -> pd.Series:
    # Deterministic pseudo-confidence from text length: ((len*2654435761)
    # mod 1000)/1000. Matches the SQL oracle expression exactly.
    return ((text.str.len().fillna(0).astype("int64") * 2654435761) % 1000) / 1000.0


def stub_confidence_native(text) -> "F.Column":
    """The stub confidence as a NATIVE JVM expression — the same function as
    _stub_confidence, with no Python stage at all. Used when no real model
    is loadable: pipelines then stay whole-stage-codegen end-to-end instead
    of paying an Arrow round trip for a stand-in. (Round-3 bench note:
    swapping ep2's Arrow stub for this moved ep2 only 2.736→2.706s at
    sf0.1 — its cost is exchange/stage count, not Python; the win here is
    plan purity, not headline seconds. See SCALE.md.)"""
    return (
        (F.coalesce(F.length(text), F.lit(0)).cast("bigint") * F.lit(2654435761))
        % 1000
    ) / 1000.0


@pandas_udf(_PRED_SCHEMA)
def predict_stub(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
    # ONE struct-returning UDF for both outputs: a single Arrow round trip
    # per batch (two scalar UDFs would serialize the text column to Python
    # twice — measured ~2x the JVM<->Python transfer on the bench).
    for text in it:
        conf = _stub_confidence(text)
        yield pd.DataFrame(
            {
                "predicted_class": (conf >= 0.5).map(
                    {True: "Full", False: "Partial"}
                ),
                "predicted_confidence": conf,
            }
        )


def classify_flows(
    df: DataFrame, text_col: str = "text", stub: str = "native"
) -> DataFrame:
    """M1 — append predicted_class / predicted_confidence.

    Tries the real HF pipeline (torch+transformers present); otherwise the
    deterministic stub. ``stub`` picks the fallback shape: ``"native"``
    (default) compiles the stub as a pure JVM expression — zero Python in
    the plan, so production pipelines benched without the model don't pay
    an Arrow round trip for a stand-in; ``"arrow"`` runs the same function
    through the scalar-iterator pandas_udf, exercising the exact plumbing
    (batching, struct return, null handling) the real model uses — the
    catalog's m1_classifier_stub pins that path. Both produce identical
    values. Output contract matches
    classifier_code/fts_to_inference_output.csv: predicted_class ∈
    {Partial, Full}, predicted_confidence ∈ [0,1].
    """
    # Inference cost is per-row CPU (with the real model, dominant): callers
    # should hand this a parallel input — spread the SOURCE scan
    # (operators.partitioning.spread_small_input) rather than this mid-plan
    # DataFrame, because probing partition counts after a shuffle/broadcast
    # chain materializes AQE query stages and re-runs upstream work.
    try:  # pragma: no cover - heavy deps absent in this container
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return _classify_flows_hf(df, text_col)
    except ImportError:
        if stub == "arrow":
            return (
                df.withColumn("__pred", predict_stub(F.col(text_col)))
                .withColumns(
                    {
                        "predicted_class": F.col("__pred.predicted_class"),
                        "predicted_confidence": F.col(
                            "__pred.predicted_confidence"
                        ),
                    }
                )
                .drop("__pred")
            )
        conf = stub_confidence_native(F.col(text_col))
        return df.withColumns(
            {
                "predicted_class": F.when(
                    conf >= 0.5, F.lit("Full")
                ).otherwise(F.lit("Partial")),
                "predicted_confidence": conf,
            }
        )


def _classify_flows_hf(
    df: DataFrame, text_col: str, model: str = _HF_MODEL
) -> DataFrame:
    """Real-model path (requires torch/transformers at deploy time).

    Deploy-time verification: tests/test_ml_real_path.py runs this exact
    function against a tiny public HF model (overridable via
    $SPARK_GRAFT_HF_TEST_MODEL) in any environment where torch and
    transformers import — it skips here, where they don't. Run it once
    on the target cluster image before shipping the real classifier.
    Reference: classifier_code/flow_inference.py:11-28.
    """

    @pandas_udf(_PRED_SCHEMA)
    def infer(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        from transformers import pipeline

        clf = pipeline("text-classification", model=model, truncation=True)
        for text in it:
            out = clf(text.fillna("").tolist(), batch_size=32)
            yield pd.DataFrame(
                {
                    "predicted_class": [o["label"] for o in out],
                    "predicted_confidence": [o["score"] for o in out],
                }
            )

    return (
        df.withColumn("__pred", infer(F.col(text_col)))
        .withColumn("predicted_class", F.col("__pred.predicted_class"))
        .withColumn("predicted_confidence", F.col("__pred.predicted_confidence"))
        .drop("__pred")
    )
