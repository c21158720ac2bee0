"""Table maintenance plan: the OPTIMIZE / ANALYZE / VACUUM-equivalent
nightly job for a parquet dataset, composed from the layout and
profiling operators.

No reference counterpart (the reference rewrites whole outputs each
run); engine addition for the operational side of a 100 TB lakehouse:
high-frequency incremental appends (``apply_changeset`` batches,
streaming sinks) fragment a dataset into thousands of small files with
drifting statistics, and THIS job is what keeps scans fast —

1. **Compaction** to ~target-size files when fragmentation crosses a
   threshold (metadata-only planning; skipped when the layout is
   already healthy, so running the job every night is cheap).
2. Optional **Z-order rewrite** on two predicate keys instead of plain
   compaction, when point/range queries on both keys matter (footer
   min/max pruning — measured table in SCALE.md).
3. **Statistics refresh**: per-column profile cards
   (operators.profiling) and HLL distinct sketches (operators.sketch)
   written next to the data — the register tables are ≤512 rows/column
   and mergeable, so downstream planners/dashboards read counts without
   ever re-scanning.

Everything is driven by file METADATA plus single-scan aggregates; the
only data rewrite is the compaction/z-order step itself, and only when
triggered. Each step is also usable alone (the operators are public);
the plan just sequences them with sane triggers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from calp_cva_tracking_pipeline_spark.operators.layout import (
    plan_compaction,
    write_zordered,
)
from calp_cva_tracking_pipeline_spark.operators.sketch import (
    hll_estimate,
    hll_sketch,
)


@dataclass
class MaintenanceReport:
    n_files_before: int
    n_files_target: int
    compacted: bool
    zordered: bool
    stats_columns: list[str]
    out_path: str
    stats_path: str | None


def maintain_table(
    spark: SparkSession,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
    fragmentation_factor: float = 2.0,
    zorder_cols: tuple[str, str] | None = None,
    stats_cols: list[str] | None = None,
    stats_path: str | None = None,
) -> MaintenanceReport:
    """One maintenance pass over the dataset at ``src``.

    Rewrites to ``dst`` only when the current file count exceeds
    ``fragmentation_factor ×`` the metadata-planned target (or when a
    z-order layout was requested — a layout change is always a
    rewrite). Refreshes statistics for ``stats_cols`` into
    ``stats_path`` as two parquet outputs: ``<path>/hll_registers``
    (the mergeable sketch state) and ``<path>/distinct_estimates``.
    """
    df, n_files, n_target = plan_compaction(spark, src, target_bytes)
    needs_compact = n_files > fragmentation_factor * n_target
    did_compact = did_zorder = False
    out_path = src
    if zorder_cols is not None:
        write_zordered(df, dst, zorder_cols[0], zorder_cols[1], n_target)
        did_zorder, out_path = True, dst
    elif needs_compact:
        df.repartition(n_target).write.mode("overwrite").parquet(dst)
        did_compact, out_path = True, dst

    cols = stats_cols or []
    if cols and stats_path:
        sk = hll_sketch(spark.read.parquet(out_path), cols)
        sk.write.mode("overwrite").parquet(f"{stats_path}/hll_registers")
        hll_estimate(sk).write.mode("overwrite").parquet(
            f"{stats_path}/distinct_estimates"
        )
    return MaintenanceReport(
        n_files_before=n_files,
        n_files_target=n_target,
        compacted=did_compact,
        zordered=did_zorder,
        stats_columns=cols,
        out_path=out_path,
        stats_path=stats_path if cols else None,
    )
