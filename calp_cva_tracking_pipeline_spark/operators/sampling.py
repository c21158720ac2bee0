"""Training-data sampling utilities (SURVEY.md §2.11 M2-adjacent).

The reference's classifier training job (offline, out of engine scope)
dedups text, stratifies an 80/20 split with a fixed seed, and weights the
loss by inverse class frequency
(classifier_code/train_flow_classifier_weighted.py:103-148). The engine owns
the data-preparation half of that: deterministic stratified splits and class
weights computed as DataFrame aggregates, so a 100 TB corpus is split and
weighted without leaving the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stratified_split(
    df: DataFrame,
    label_col: str,
    train_fraction: float = 0.8,
    seed: int = 42,
    id_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic per-label train/test split → (train, test).

    Hash-based rather than ``sampleBy``: a row's assignment depends only on
    (label, key, seed) via ``xxhash64``, never on partitioning or scan
    order — re-runs and re-partitions reproduce the identical split, which
    sampleBy's per-partition RNG does not guarantee when the input's
    partitioning changes. Stratification is in-expectation per label (the
    hash is uniform within each label's rows), the same guarantee as the
    reference's sklearn stratify at 80/20.
    """
    key = F.col(id_col) if id_col else F.xxhash64(*df.columns)
    bucket = F.pmod(
        F.xxhash64(F.col(label_col), key.cast("string"), F.lit(seed)),
        F.lit(10_000),
    )
    is_train = bucket < int(train_fraction * 10_000)
    train = df.filter(is_train)
    test = df.filter(~is_train)
    return train, test


def class_weights(
    df: DataFrame, label_col: str
) -> DataFrame:
    """(label, n, weight) with weight = total / n — the inverse-frequency
    class weighting of the reference trainer
    (classifier_code/train_flow_classifier_weighted.py:139-148). One
    aggregation pass; broadcast the result into the training job.

    Fully lazy: the total rides in as a broadcast cross join of the
    per-label counts re-aggregated (a handful of rows), not an eager
    ``df.count()`` — composing this into a larger plan triggers no
    driver-side action."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            "weight", F.col("__total").cast("double") / F.col("n")
        )
        .drop("__total")
    )


def classification_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Per-class evaluation of a prediction table → one row per class:
    (label, support, predicted, tp, precision, recall, f1).

    The distributed part is ONE aggregation — ``groupBy(label, pred)``
    confusion counts, shuffling only (label, pred, n) tuples — after which
    every metric derives from the tiny num_classes² matrix (re-aggregated
    and full-outer self-joined broadcast-side; a class never predicted
    keeps null precision, a class never seen keeps null recall, and f1 is
    null unless both are defined and their sum positive — ANSI-safe, no
    division by zero). Covers the metric block of the reference trainer
    (classifier_code/train_flow_classifier_weighted.py:155-159:
    accuracy/F1/precision/recall) as a cluster job over 100 TB of
    predictions; overall accuracy is the one-liner
    ``sum(tp) / sum(support)`` over this output.
    """
    cm = df.groupBy(
        F.col(label_col).alias("__l"), F.col(pred_col).alias("__p")
    ).agg(F.count("*").alias("__n"))
    actual = cm.groupBy(F.col("__l").alias("__label")).agg(
        F.sum("__n").alias("support"),
        F.sum(F.when(F.col("__p") == F.col("__l"), F.col("__n"))
              .otherwise(F.lit(0))).alias("tp"),
    )
    predicted = cm.groupBy(F.col("__p").alias("__pred")).agg(
        F.sum("__n").alias("predicted")
    )
    joined = actual.join(
        F.broadcast(predicted),
        actual["__label"] == predicted["__pred"],
        "full_outer",
    ).select(
        F.coalesce(F.col("__label"), F.col("__pred")).alias("label"),
        F.coalesce(F.col("support"), F.lit(0)).alias("support"),
        F.coalesce(F.col("predicted"), F.lit(0)).alias("predicted"),
        F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
    )
    precision = F.when(
        F.col("predicted") > 0, F.col("tp") / F.col("predicted")
    )
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support"))
    joined = joined.withColumns(
        {"precision": precision, "recall": recall}
    )
    return joined.withColumn(
        "f1",
        F.when(
            F.col("precision").isNotNull()
            & F.col("recall").isNotNull()
            & (F.col("precision") + F.col("recall") > 0),
            2 * F.col("precision") * F.col("recall")
            / (F.col("precision") + F.col("recall")),
        ),
    )
