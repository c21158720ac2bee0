"""Data-layout operators: Z-order clustering keys, layout-aware writers,
and a file-size-targeted compaction planner.

No reference counterpart (the reference materializes single CSV/RData
outputs — SURVEY.md §2.1 S4/S5); these are engine additions for the
storage side of a 100 TB pipeline, where the dominant cost is not the
query plan but WHICH parquet row groups a scan can skip:

- ``zvalue`` computes a Morton (Z-order) interleave of two integer key
  columns entirely with JVM-side bit arithmetic (5 shift/mask rounds per
  dimension — the classic magic-number spread, no UDF, no loop).
- ``write_zordered`` lays a table out range-partitioned and sorted by
  that z-value, so EVERY file's parquet footer min/max is narrow in BOTH
  dimensions (a 64-file layout is an 8×8 grid over the two keys: a point
  predicate on either key prunes ~7/8 of the files, vs pruning nothing
  on the second key under a single-column sort). Measured footer-stat
  effect pinned in tests/test_layout.py; numbers in SCALE.md.
- ``compact_parquet`` / ``plan_compaction`` rewrite a many-small-files
  dataset to ~``target_bytes`` files — the maintenance job that keeps
  scan parallelism sane after high-frequency incremental appends
  (pairs with ``apply_changeset``/``dedup_incremental``'s per-batch
  writes). Sizing reads FILE METADATA only (driver-side listing), never
  data.

Scale notes: the z-value is a plain deterministic column — computing it
is scan-local (no exchange); ``repartitionByRange`` on it samples the
column to pick balanced boundaries, so pathological key skew degrades to
at-worst the same file-size skew a date-partitioned layout would have.
Bit-interleave beats Hilbert here: one less locality constant, but
expressible as pure Catalyst expressions on both engines (the DuckDB
oracle recomputes z bit-for-bit, so layout assignment is correctness-
checked, not just claimed).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Part1By1 magic masks: spread the low 16 bits of x onto the even bit
# positions of a 32-bit lane (Morton encoding building block).
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _part1by1(col: Column) -> Column:
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(col_a: Column, col_b: Column) -> Column:
    """32-bit Morton code interleaving the low 16 bits of two integer
    columns (a's bits on even positions, b's on odd). Monotone locality:
    rows close in z are close in BOTH a and b. Keys wider than 16 bits
    should be pre-scaled (``>> (width-16)``) by the caller — layout
    clustering needs the HIGH bits of each key, and the testdata keys
    fit 16 bits outright."""
    a = _part1by1(col_a.cast("bigint"))
    b = _part1by1(col_b.cast("bigint"))
    return a.bitwiseOR(F.shiftleft(b, 1))


def part1by1_sql(expr: str) -> str:
    """The DuckDB-dialect twin of ``_part1by1`` (oracle support). The
    BIGINT cast matters: DuckDB types bare integer columns/literals as
    32-bit and THROWS on shift overflow where Spark's 64-bit lane is
    silent."""
    x = f"((CAST({expr} AS BIGINT)) & 65535)"
    for shift, mask in _SPREAD:
        x = f"((({x} | ({x} << {shift}))) & {mask})"
    return x


def zvalue_sql(expr_a: str, expr_b: str) -> str:
    return f"({part1by1_sql(expr_a)} | ({part1by1_sql(expr_b)} << 1))"


def zorder_bucket(z: Column, n_buckets: int, z_bits: int = 32) -> Column:
    """Static grid cell: the top log2(n_buckets) bits of the z-value.
    ``write_zordered`` uses repartitionByRange (sampled, balanced)
    instead; the static grid is the ANALYSIS view of the layout — its
    per-bucket min/max spans are what footer pruning would see, and they
    are what the lx_zorder catalog query (and its oracle) report."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two: {n_buckets}")
    return F.shiftright(z, z_bits - int(math.log2(n_buckets)))


def with_zvalue(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Adds ``zv``: the 32-bit Morton code over the RANGE-NORMALIZED
    keys. Normalization — affine-scale each key onto [0, 65535] by its
    observed min/max — matters: raw keys occupy only the LOW bits of the
    16-bit lane, so the z top bits (which drive both the grid cells and
    range partitioning) would be dominated by whichever key happens to
    be wider, degenerating to a single-column sort (measured: a
    16-file raw-key layout pruned 0 files on the narrow key). Bounds
    come from a 4-value aggregate broadcast back over the scan (one tiny
    exchange, no driver collect); integer ``div`` keeps the scaling
    bit-exact cross-engine."""
    a, b = F.col(col_a).cast("bigint"), F.col(col_b).cast("bigint")
    bounds = df.agg(
        F.min(a).alias("__amin"), F.max(a).alias("__amax"),
        F.min(b).alias("__bmin"), F.max(b).alias("__bmax"),
    )

    def scale(name: str, lo: str, hi: str) -> Column:
        # integer div ≡ DuckDB // for non-negative operands (oracle twin)
        return F.expr(
            f"CASE WHEN {hi} > {lo} THEN "
            f"((CAST({name} AS BIGINT) - {lo}) * 65535) div ({hi} - {lo}) "
            f"ELSE CAST(0 AS BIGINT) END"
        )

    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            "zv",
            zvalue(
                scale(col_a, "__amin", "__amax"),
                scale(col_b, "__bmin", "__bmax"),
            ),
        )
        .drop("__amin", "__amax", "__bmin", "__bmax")
    )


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_buckets: int,
) -> DataFrame:
    """``with_zvalue`` plus ``bucket``: the static top-bits grid cell —
    the ANALYSIS view of the layout, whose per-cell key envelopes are
    what footer pruning would see (lx_zorder catalog query + oracle)."""
    return with_zvalue(df, col_a, col_b).withColumn(
        "bucket", zorder_bucket(F.col("zv"), n_buckets)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
) -> None:
    """Materialize ``df`` as ~``n_files`` parquet files range-partitioned
    AND sorted by the (a, b) z-value, then drop the helper column. Files
    get narrow min/max footer stats on both keys, so engine-side filter
    pushdown (parquet row-group stats) skips most files for a point or
    range predicate on EITHER key."""
    (
        with_zvalue(df, col_a, col_b)
        .repartitionByRange(n_files, F.col("zv"))
        .sortWithinPartitions("zv")
        .drop("zv")
        .write.mode("overwrite")
        .parquet(path)
    )


def plan_compaction(
    spark, path: str, target_bytes: int = 128 * 1024 * 1024
) -> tuple[DataFrame, int, int]:
    """Size a compaction rewrite from file metadata only: returns
    (dataframe, current file count, target file count) where the target
    is ceil(total_bytes / target_bytes), floor 1. At cluster scale the
    same arithmetic runs off the object-store listing; file bytes are
    metadata, so planning a 100 TB compaction touches no data."""
    df = spark.read.parquet(path)
    files = [f for f in df.inputFiles() if f.endswith(".parquet")]
    total = 0
    for uri in files:
        local = uri.removeprefix("file:")
        if os.path.exists(local):
            total += os.path.getsize(local)
    n_target = max(1, math.ceil(total / target_bytes))
    return df, len(files), n_target


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``src`` to ``dst`` in ~``target_bytes`` files. Uses
    round-robin repartition (no shuffle key: compaction must not skew on
    data values) — layout-preserving compaction of a z-ordered table
    should re-run ``write_zordered`` instead. Returns the file count."""
    df, _, n_target = plan_compaction(spark, src, target_bytes)
    df.repartition(n_target).write.mode("overwrite").parquet(dst)
    return n_target


def compaction_plan(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    target_rows: int,
) -> DataFrame:
    """Compaction planner for small micro-partitions — the layout-tier
    answer to the small-files problem at 100 TB: given row counts per
    (partition, ordered sub-partition) cell (e.g. per day within a
    source), assign consecutive cells to compaction bins by a
    row-budget greedy rule, bin = EXCLUSIVE-prefix-rows div target —
    deterministic, order-preserving (compacted files stay
    range-queryable on ``order_col``), and computed entirely from ONE
    cell aggregation + one partition-ordered window (shuffle = cells,
    never rows). An oversized single cell occupies its own bin without
    splitting (file boundaries cannot split a partition cell).

    Output per (partition, bin): (part_cols..., bin, n_cells, rows,
    first/last ``order_col``), ordered — the work list a compaction job
    executes one bin at a time.
    """
    from pyspark.sql import Window

    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive: {target_rows}")
    cells = (
        df.filter(F.col(order_col).isNotNull())
        .groupBy(*part_cols, order_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("__r"))
    )
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = (
        cells.withColumn(
            "__pre",
            (F.sum("__r").over(w) - F.col("__r")).cast("bigint"),
        )
        .withColumn(
            "bin",
            F.expr(f"CAST(__pre div {int(target_rows)} AS BIGINT)"),
        )
        .drop("__pre")
    )
    return (
        binned.groupBy(*part_cols, "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("__r").cast("bigint").alias("rows"),
            F.min(order_col).alias("first_key"),
            F.max(order_col).alias("last_key"),
        )
        .orderBy(*part_cols, "bin")
    )


def clustering_depth(
    cells: DataFrame,
    group_col: str,
    min_col: str,
    max_col: str,
) -> DataFrame:
    """Layout clustering audit over micro-partition METADATA: given one
    row per storage cell (file / row-group) with its ``[min, max]``
    range for a candidate pruning key, report per group how badly the
    cells' ranges overlap — n_cells, avg_depth_milli and max_depth,
    where a cell's depth = how many cells in its group (itself
    included) its range overlaps. Depth 1 everywhere = perfectly
    clustered (every point predicate prunes to one cell); depth ≈
    n_cells = the key is unclustered and min/max pruning is useless —
    the measurement that justifies (or retires) a Z-order/compaction
    job before anyone pays for it.

    Scale shape: the input is CELL metadata (one row per file — ~10⁵
    rows for 100 TB), not data, so the within-group range self-join is
    metadata×metadata work bounded by the largest group's cell count;
    nothing row-scale is ever scanned or shuffled. Cells with NULL
    bounds (all-NULL key in the cell) are excluded by contract.
    """
    # identical ranges carry multiplicity (two files CAN share exact
    # bounds) — pre-collapse so the self-join stays distinct-range
    # sized and each physical cell still counts
    c = (
        cells.filter(
            F.col(min_col).isNotNull() & F.col(max_col).isNotNull()
        )
        .select(
            F.col(group_col).alias("__g"),
            F.col(min_col).alias("__lo"),
            F.col(max_col).alias("__hi"),
        )
        .groupBy("__g", "__lo", "__hi")
        .agg(F.count("*").alias("__m"))
    )
    a, b = c.alias("a"), c.alias("b")
    depth = (
        a.join(
            b,
            (F.col("a.__g") == F.col("b.__g"))
            & (F.col("a.__lo") <= F.col("b.__hi"))
            & (F.col("b.__lo") <= F.col("a.__hi")),
        )
        .groupBy(
            F.col("a.__g").alias("__g"),
            F.col("a.__lo").alias("__lo"),
            F.col("a.__hi").alias("__hi"),
            F.col("a.__m").alias("__m"),
        )
        .agg(F.sum(F.col("b.__m")).alias("__d"))
    )
    return (
        depth.groupBy(F.col("__g").alias(group_col))
        .agg(
            F.sum("__m").cast("bigint").alias("n_cells"),
            F.expr(
                "CAST(1000 * sum(__m * __d) div sum(__m) AS BIGINT)"
            ).alias("avg_depth_milli"),
            F.max("__d").cast("bigint").alias("max_depth"),
        )
        .orderBy(group_col)
    )


def prune_plan(
    cells: DataFrame,
    preds: DataFrame,
    min_col: str = "lo",
    max_col: str = "hi",
    rows_col: str = "r",
) -> DataFrame:
    """Partition-pruning simulator over micro-partition METADATA: for
    each declared range predicate (pred_name, lo, hi) — a tiny
    broadcast table, possibly derived lazily from data statistics —
    count which cells survive min/max pruning and what row volume a
    scan would actually read. This turns "would Z-ordering help?" and
    "is this predicate selective enough for the layout?" into numbers
    BEFORE a 100 TB scan is paid for: scanned_ppm ≈ 10⁶ means the
    layout does nothing for that predicate (see `clustering_depth` for
    the per-key diagnosis). Cells with NULL bounds are counted as
    always-scanned (a cell without stats cannot be pruned — the
    conservative reading real engines use).

    Shape: cells metadata × a predicate list joined with a broadcast
    (both metadata-scale), one aggregate per predicate. Output:
    (pred_name, n_cells, n_cells_scanned, rows_total, rows_scanned,
    scanned_ppm).
    """
    c = cells.select(
        F.col(min_col).alias("__lo"),
        F.col(max_col).alias("__hi"),
        F.col(rows_col).cast("bigint").alias("__r"),
    )
    hit = (
        F.col("__lo").isNull()
        | F.col("__hi").isNull()
        | ((F.col("__lo") <= F.col("hi")) & (F.col("lo") <= F.col("__hi")))
    )
    return (
        c.crossJoin(F.broadcast(preds))
        .groupBy("pred_name")
        .agg(
            F.count("*").cast("bigint").alias("n_cells"),
            F.sum(F.when(hit, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cells_scanned"),
            F.sum("__r").cast("bigint").alias("rows_total"),
            F.sum(F.when(hit, F.col("__r")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )
        .withColumn(
            "scanned_ppm",
            F.expr(
                "CAST(1000000 * rows_scanned div rows_total AS BIGINT)"
            ),
        )
        .orderBy("pred_name")
    )


def partition_advisor(
    df: DataFrame,
    candidates: list[str],
    max_partitions: int = 10_000,
    max_share_ppm: int = 200_000,
) -> DataFrame:
    """Partition-column advisor: for each DECLARED candidate column, the
    statistics that decide whether `PARTITIONED BY (col)` helps or hurts
    at warehouse scale — cardinality (too high → small-files explosion;
    the Hive-style partition count is the first thing a layout review
    reads), the largest partition's row share (skew: one giant
    partition serializes every scan that can't prune it), rows per
    partition, and the equality-predicate prune ratio (1/cardinality of
    the scan survives a `col = x` filter, the whole point of
    partitioning). Verdict thresholds are declared knobs:
    'too_many_partitions' above ``max_partitions``, 'skewed' above
    ``max_share_ppm``, else 'ok'. NULL forms its own partition (exactly
    as a table layout would place it).

    Scale shape: one map-side-combined groupBy per candidate reduced to
    a SINGLE summary row before the union — k candidates = k scans of
    one column each (column pruning makes each scan that column's
    bytes), group-cardinality exchanges, nothing row-sized ever moves.
    Output: (part_col, n_partitions, n_rows, max_share_ppm,
    rows_per_part, prune_ppm, verdict), one row per candidate, ordered.
    """
    if not candidates:
        raise ValueError("partition_advisor: no candidate columns")
    outs = []
    for c in candidates:
        g = df.groupBy(F.col(c).alias("__k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("__c")
        )
        outs.append(
            g.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
                F.sum("__c").cast("bigint").alias("n_rows"),
                F.max("__c").cast("bigint").alias("__mx"),
            ).select(
                F.lit(c).alias("part_col"),
                "n_partitions",
                "n_rows",
                F.expr(
                    "CAST((1000000 * __mx) div n_rows AS BIGINT)"
                ).alias("max_share_ppm"),
                F.expr(
                    "CAST(n_rows div n_partitions AS BIGINT)"
                ).alias("rows_per_part"),
                F.expr(
                    "CAST(1000000 div n_partitions AS BIGINT)"
                ).alias("prune_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    verdict = (
        F.when(
            F.col("n_partitions") > max_partitions,
            F.lit("too_many_partitions"),
        )
        .when(
            F.col("max_share_ppm") > max_share_ppm, F.lit("skewed")
        )
        .otherwise(F.lit("ok"))
    )
    return out.withColumn("verdict", verdict).orderBy("part_col")
