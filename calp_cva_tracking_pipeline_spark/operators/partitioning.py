"""Input-parallelism guard for CPU-heavy per-row stages.

Parquet scans split by row group: a table written as one row group arrives
as ONE partition no matter how many cores the cluster has, so a stage whose
cost is per-row CPU (md5 shingling, levenshtein, Arrow-batched inference)
serializes on a single core. The guard below widens such degenerate inputs
and is a structural no-op at scale — a 100 TB table arrives as thousands of
splits, the partition count already exceeds the session's parallelism, and
no shuffle is added.

This is deliberately NOT applied to plain scan→filter→agg paths: there the
per-row work is cheap and a round-robin exchange would cost about as much
as it saves. Reach for it only in front of operators that do real per-row
computation.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# Logical-plan nodes that imply the data is (or is about to be) shuffled.
# Probing `.rdd` below such a node makes AQE materialize the shuffle stages
# early — upstream work would run twice — and post-shuffle data is already
# parallel (AQE's parallelismFirst coalescing keeps >= default-parallelism
# partitions), so spreading it is pointless as well as harmful.
_WIDE_NODE = re.compile(
    r"(?:^|\n)[-+:\s]*'?(?:Join|Aggregate|Window|Deduplicate|"
    r"Repartition\w*|Sort|Union|Intersect|Except)\b"
)


def spread_small_input(
    df: DataFrame,
    min_partitions: int | None = None,
    bytes_per_task: int | None = None,
) -> DataFrame:
    """Round-robin repartition IFF ``df`` is scan-rooted (scan plus
    projections/filters only) AND has fewer partitions than the session's
    default parallelism (or ``min_partitions`` when given).

    Non-scan-rooted inputs are returned unchanged — see ``_WIDE_NODE``.
    For a scan-rooted ``df`` the partition count comes from the compiled
    physical plan; no job runs.

    ``bytes_per_task`` caps the spread width by the optimizer's size
    estimate (``ceil(sizeInBytes / bytes_per_task)``): per-row cost decides
    the right task size, so CPU-heavy stages (minhash shingling, Arrow
    inference) omit it and take full parallelism, while light per-row work
    (regex flags, cascades) passes ~512 KiB so a few-MiB input doesn't
    fragment into default-parallelism slivers where task scheduling costs
    more than the work (measured: ep2 at sf0.1 runs 25% faster at 16 tasks
    than 32). At scale both forms are structural no-ops — a big table
    already arrives wider than any cap.

    Round-robin repartition is deterministic (Spark 2.4+ sorts each input
    partition before distributing so retries are stable), and every engine
    operator placed downstream of a spread is row-order-insensitive, so
    results are unchanged.
    """
    if _WIDE_NODE.search(str(df._jdf.queryExecution().analyzed())):
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if bytes_per_task:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if est > 0:
            target = max(2, min(target, -(-est // bytes_per_task)))
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
