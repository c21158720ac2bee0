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
    aggregation pass; broadcast the result into the training job."""
    counts = df.groupBy(label_col).agg(F.count("*").alias("n"))
    total = df.count()
    return counts.withColumn(
        "weight", F.lit(float(total)) / F.col("n")
    )
