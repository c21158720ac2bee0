"""Bucketed-table storage for co-located (shuffle-free) joins.

At 100 TB the dominant cost of a fact×fact join is the shuffle. Bucketing
both tables by the join key at WRITE time pre-partitions the data on disk,
so Spark's planner proves co-location and elides the exchange on every
subsequent join/aggregation on that key — pay the shuffle once at ingest,
never again. (The reference has no analog; its joins are all single-node
in-memory merges. This is the Spark-native answer for the fact-to-fact
joins the pipeline performs repeatedly: flows×projects, flows×predictions.)

Bucketed tables must go through the session catalog (``saveAsTable``);
plain ``parquet(path)`` writes cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    ``num_buckets`` should be sized so one bucket of the LARGEST table fits
    an executor's memory (e.g. 100 TB / 64k buckets ≈ 1.6 GB); both sides
    of a co-located join must use the SAME bucket count and columns.
    Sorting within buckets additionally enables sort-merge joins without a
    sort step.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata flows into the plan automatically."""
    return spark.table(table)
