"""Window / ordered computations (SURVEY.md §2.6).

The deflator program's group-wise cumulative products and anchor rebasing
(reference code/03_deflators.R:76-82,164-165) re-expressed as window
expressions. One hash exchange per partition key; frames are running frames
so state never exceeds a single group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _running(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def cumulative_product(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str,
    reverse: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """W1/W4 — per-group cumulative product via exp(sum(log)).

    Values must be positive growth factors (the deflator case). A zero,
    negative, or null factor poisons the product from that row onward: the
    output is null wherever the running frame contains a non-positive factor
    (F.sum would silently *skip* a null log, which would drop the factor from
    the product — the min-over-frame guard below propagates instead).
    ``reverse=True`` gives the reference's back-fill rev(cumprod(...))
    (code/03_deflators.R:164-165). Rounded to ``round_to`` dp because libm
    exp/ln differ at 1-ulp across engines.
    """
    order = [
        F.col(c).desc() if reverse else F.col(c).asc() for c in order_cols
    ]
    w = _running(Window.partitionBy(*partition_cols).orderBy(*order))
    v = F.col(value_col)
    frame_ok = F.min(
        F.when(v.isNull() | (v <= 0), F.lit(0)).otherwise(F.lit(1))
    ).over(w)
    out = F.when(frame_ok == 1, F.exp(F.sum(F.log(v)).over(w)))
    if round_to is not None:
        out = F.round(out, round_to)
    return df.withColumn(out_col, out)


def rebase_to_anchor(
    df: DataFrame,
    value_col: str,
    anchor_predicate: Column,
    partition_cols: list[str],
    out_col: str,
) -> DataFrame:
    """W2 — divide each row's value by the group's anchor-row value
    (reference: gdp_cg / gdp_cg[variable == base_year] per ISO,
    code/03_deflators.R:78,82). Unbounded frame; null when no anchor."""
    w = Window.partitionBy(*partition_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    anchor = F.max(F.when(anchor_predicate, F.col(value_col))).over(w)
    return df.withColumn(out_col, F.col(value_col) / anchor)


def lead_value(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str,
    offset: int = 1,
) -> DataFrame:
    """W3 — next-row lookahead (reference shift(value, -1),
    code/03_deflators.R:77)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(out_col, F.lead(value_col, offset).over(w))


def top1_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[Column],
) -> DataFrame:
    """W5 — deterministic best-row-per-group (fuzzy-match tie-breaks,
    code/10_global_cva_analysis.R:139,173). ``order_cols`` must be a total
    order within each group for run-to-run stability."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
