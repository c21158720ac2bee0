"""Dataset profiling: per-column statistics in ONE scan.

The pre-training sanity pass every 100 TB ingest needs — null rates, value
ranges, central tendency — emitted long-format (one row per column) so the
report is schema-stable regardless of how many columns are profiled.

Scale shape: all statistics for all columns compute in a single global
aggregation (Catalyst partial-aggregates each one map-side; one exchange of
ONE row), then a constant-width projection unpivots to long form — the scan
is the entire cost. The exact median (``percentile``) buffers each column's
values per partial aggregate, which is fine for profiling runs on samples
or single tables; pass ``exact_median=False`` at full-corpus scale to use
``approx_percentile`` (t-digest-style sketch, bounded memory) — the oracle
twin pins the exact variant, the approx variant is plan-identical except
for the aggregate function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.numeric import money_avg

_STATS = ("n", "n_null", "min", "max", "mean", "p50")


def profile_columns(
    df: DataFrame, cols: list[str], exact_median: bool = True
) -> DataFrame:
    """→ (col_name, n, n_null, min, max, mean, p50), one row per profiled
    numeric column, ordered by column name. mean runs through the exact
    decimal accumulator (functions.numeric.money_avg); min/max/median are
    exact doubles; everything float-y is rounded to 6 dp for cross-engine
    hash stability."""
    if not cols:
        raise ValueError("profile_columns: no columns given")
    aggs = []
    for c in cols:
        col = F.col(c)
        med = (
            F.percentile(col, F.lit(0.5))
            if exact_median
            else F.expr(f"approx_percentile({c}, 0.5d, 10000)")
        )
        aggs.extend(
            [
                F.count(col).alias(f"{c}__n"),
                (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__n_null"),
                F.round(F.min(col), 6).alias(f"{c}__min"),
                F.round(F.max(col), 6).alias(f"{c}__max"),
                F.round(money_avg(c), 6).alias(f"{c}__mean"),
                F.round(med, 6).alias(f"{c}__p50"),
            ]
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        "'{c}', {fields}".format(
            c=c,
            fields=", ".join(
                f"cast(`{c}__{s}` as double)" for s in _STATS
            ),
        )
        for c in cols
    )
    stacked = wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(col_name, {', '.join(_STATS)})"
        )
    )
    return stacked.select(
        "col_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        "min",
        "max",
        "mean",
        "p50",
    ).orderBy("col_name")
