"""Semi-structured (JSON) column operators: field promotion and schema
inventory at scan speed.

Event pipelines carry a free-form JSON properties column next to the
typed ones (the ``events.props`` shape); before anything downstream can
use it, two questions need distributed answers: WHAT keys exist (and how
consistently), and what a PROMOTED field's values look like. Both run as
JVM JSON intrinsics (``get_json_object`` / ``json_object_keys``) — no
Python, no UDF, full scan speed — and both have DuckDB-native twins
(``json_extract_string`` / ``json_keys``), so the catalog oracle checks
them value-for-value.

Malformed JSON and missing keys surface as NULL (never an error): at
100 TB the props column WILL contain garbage rows, and a promotion pass
that throws on the first one is useless — the parse-failure count is
part of the report instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.numeric import money_avg


def json_field(json_col: Column, path: str, dtype: str = "string") -> Column:
    """Extract ``path`` (``$.key`` syntax) from a JSON string column and
    cast — NULL on malformed JSON, missing key, or uncastable value
    (``try_cast``: ANSI mode makes a plain cast THROW on the first
    garbage value, which a 100 TB props column will contain)."""
    return F.get_json_object(json_col, path).try_cast(dtype)


def json_field_stats(
    df: DataFrame,
    json_col: str,
    path: str,
    group_cols: list[str],
    dtype: str = "double",
) -> DataFrame:
    """Per-group profile of a promoted JSON field: row count, parsed
    count (failures = rows − parsed: malformed JSON, absent key, or
    cast failure — the promotion-readiness signal), min/max, and a
    decimal-exact mean rounded to 6 dp. One map-side-combined
    aggregation at group cardinality."""
    v = json_field(F.col(json_col), path, dtype)
    return (
        df.withColumn("__v", v)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("__v").alias("n_parsed"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
            money_avg("__v").alias("mean_v"),
        )
    )


def json_key_inventory(
    df: DataFrame, json_col: str, total_rows_col: str = "coverage"
) -> DataFrame:
    """Top-level key inventory of a JSON column — the schema-inference
    lite every props column needs before field promotion: (key, n,
    coverage) where coverage = n / total rows (malformed/null JSON rows
    count in the denominator; they are exactly the rows a promoted
    field will be NULL for). One explode + key-cardinality aggregation
    plus a one-row broadcast total.
    """
    total = df.agg(F.count(F.lit(1)).alias("__t"))
    keys = (
        df.select(
            F.explode(F.json_object_keys(F.col(json_col))).alias("key")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        keys.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("__t"), 6).alias(total_rows_col),
        )
        .orderBy("key")
    )


def json_schema_drift(
    old_df: DataFrame, new_df: DataFrame, json_col: str
) -> DataFrame:
    """Schema drift between two slices of a JSON column -- the alarm
    that fires BEFORE a promoted field silently goes all-NULL: which
    top-level keys appeared, which vanished, and how much each key's
    coverage moved (producers add/rename fields without telling the
    consumers; this is the consumer's tripwire). Per key:
    (key, n_old, n_new, cov_old_ppm, cov_new_ppm, drift_ppm, status
    'added'/'removed'/'common'), coverage in integer ppm of each
    slice's TOTAL rows (malformed/null JSON counts in the denominator
    -- those rows are exactly where a promoted field reads NULL).

    Two key-inventory passes (one explode + key-cardinality aggregation
    each, totals broadcast) and one key-sized full-outer merge --
    key cardinality is schema-sized, never row-sized.
    """
    def inv(df: DataFrame, n_name: str, c_name: str) -> DataFrame:
        total = df.agg(F.count(F.lit(1)).alias("__t"))
        return (
            df.select(
                F.explode(
                    F.json_object_keys(F.col(json_col))
                ).alias("key")
            )
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("bigint").alias(n_name))
            .crossJoin(F.broadcast(total))
            .select(
                "key",
                n_name,
                F.expr(
                    f"CAST(1000000 * {n_name} div __t AS BIGINT)"
                ).alias(c_name),
            )
        )

    o = inv(old_df, "n_old", "cov_old_ppm")
    n = inv(new_df, "n_new", "cov_new_ppm")
    status = (
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    return (
        o.join(n, "key", "full_outer")
        .select(
            "key",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.coalesce("cov_old_ppm", F.lit(0))
            .cast("bigint")
            .alias("cov_old_ppm"),
            F.coalesce("cov_new_ppm", F.lit(0))
            .cast("bigint")
            .alias("cov_new_ppm"),
            (
                F.coalesce("cov_new_ppm", F.lit(0))
                - F.coalesce("cov_old_ppm", F.lit(0))
            ).cast("bigint").alias("drift_ppm"),
            status.alias("status"),
        )
        .orderBy("key")
    )


def schema_key_cells(
    df: DataFrame, json_col: str, slice_col: Column
) -> DataFrame:
    """Per-batch (key, slice, cnt) JSON-key inventory cells — the
    streaming-foldable map half of ``json_schema_drift``: key counts
    fold ADDITIVELY across micro-batches, so a foreachBatch ledger +
    ``schema_drift_from_cells`` equals the one-shot drift readout (the
    psi/ks/kappa fold discipline, tests/test_streaming.py). A NULL-key
    row per slice carries the batch's TOTAL row count (including
    malformed/null JSON rows — exactly the denominator the batch
    operator uses; JSON keys are never NULL, so the sentinel cannot
    collide). ``slice_col`` evaluates 0 (old) / 1 (new)."""
    s = slice_col.cast("int")
    keys = (
        df.select(
            F.explode(F.json_object_keys(F.col(json_col))).alias("key"),
            s.alias("slice"),
        )
        .groupBy("key", "slice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    totals = (
        df.select(s.alias("slice"))
        .groupBy("slice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.lit(None).cast("string").alias("key"), "slice", "cnt"
        )
    )
    return keys.unionByName(totals)


def schema_drift_from_cells(cells: DataFrame) -> DataFrame:
    """Schema-drift readout from a PRE-AGGREGATED (key, slice, cnt)
    ledger (see ``schema_key_cells``; NULL-key rows are the per-slice
    row totals). Folds duplicate cells first; coverage ppm uses the
    same exact integer ``div`` as ``json_schema_drift``, so the folded
    readout is row-identical to the one-shot operator."""
    folded = (
        cells.select(
            "key",
            F.col("slice").cast("int").alias("slice"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
        .groupBy("key", "slice")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    totals = folded.filter(F.col("key").isNull()).select(
        "slice", F.col("cnt").alias("__t")
    )
    keyed = folded.filter(F.col("key").isNotNull()).join(
        F.broadcast(totals), "slice"
    )
    inv = keyed.select(
        "key",
        "slice",
        "cnt",
        F.expr("CAST(1000000 * cnt div __t AS BIGINT)").alias("__cov"),
    )
    o = inv.filter(F.col("slice") == 0).select(
        "key",
        F.col("cnt").alias("n_old"),
        F.col("__cov").alias("cov_old_ppm"),
    )
    n = inv.filter(F.col("slice") == 1).select(
        "key",
        F.col("cnt").alias("n_new"),
        F.col("__cov").alias("cov_new_ppm"),
    )
    status = (
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .otherwise(F.lit("common"))
    )
    return (
        o.join(n, "key", "full_outer")
        .select(
            "key",
            F.coalesce("n_old", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("bigint").alias("n_new"),
            F.coalesce("cov_old_ppm", F.lit(0))
            .cast("bigint")
            .alias("cov_old_ppm"),
            F.coalesce("cov_new_ppm", F.lit(0))
            .cast("bigint")
            .alias("cov_new_ppm"),
            (
                F.coalesce("cov_new_ppm", F.lit(0))
                - F.coalesce("cov_old_ppm", F.lit(0))
            ).cast("bigint").alias("drift_ppm"),
            status.alias("status"),
        )
        .orderBy("key")
    )
