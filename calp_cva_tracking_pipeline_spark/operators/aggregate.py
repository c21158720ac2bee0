"""Aggregation operators (SURVEY.md §2.5).

All are plain groupBy.agg — partial aggregation (map-side combine) comes free
from Catalyst, so a 100 TB input reduces before the exchange. Money sums go
through functions.numeric.money_sum for run/engine determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.numeric import money_sum


def sum_clamped_percentage(
    df: DataFrame, key: str, pct_col: str, out_col: str = "cva_percentage"
) -> DataFrame:
    """A1 — per-key percentage sum clamped at 100 then scaled to [0,1]
    (reference code/07_process_project_data.R:130-132)."""
    return df.groupBy(key).agg(
        (F.least(F.lit(100.0), money_sum(pct_col)) / 100.0).alias(out_col)
    )


def bool_any(df: DataFrame, key: str, bool_col: str, out_col: str) -> DataFrame:
    """A2 — per-key boolean OR via max (reference code/07:143)."""
    return df.groupBy(key).agg(
        (F.max(F.col(bool_col).cast("int")) == 1).alias(out_col)
    )


def ratio_of_sums(
    df: DataFrame, keys: list[str], num_col: str, den_col: str, out_col: str
) -> DataFrame:
    """A7 — sum(a)/sum(b) per group (DAC deflator, code/03_deflators.R:122-123)."""
    return df.groupBy(*keys).agg(
        (money_sum(num_col) / money_sum(den_col)).alias(out_col)
    )


def latest_row_per_group(
    df: DataFrame, keys: list[str], order_col: str, tiebreak: list[str]
) -> DataFrame:
    """A9 — the extreme (max order_col) row per group, deterministic under
    ties (reference .SD[variable == max(variable)], code/03:154-168)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), *[F.col(c) for c in tiebreak]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def geometric_growth(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "growth",
) -> DataFrame:
    """A10 — per-group (last/first)^(1/span) over the order column
    (reference code/03_deflators.R:154-157). min_by/max_by keep it a single
    aggregation pass; result rounded for cross-engine libm stability."""
    span = F.max(order_col) - F.min(order_col)
    first_v = F.min_by(value_col, order_col)
    last_v = F.max_by(value_col, order_col)
    return df.groupBy(*keys).agg(
        F.round(
            F.pow(last_v / first_v, F.lit(1.0) / span), 6
        ).alias(out_col),
        F.min(order_col).alias("first_" + order_col),
        F.max(order_col).alias("last_" + order_col),
    )
