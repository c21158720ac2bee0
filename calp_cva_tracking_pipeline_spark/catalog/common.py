"""Shared helpers for the query catalog."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from calp_cva_tracking_pipeline_spark.session import normalize_session


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table (driver-provided sf_dir).

    events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized parquet
    reader rejects; it is read with nanosAsLong and converted to a proper
    timestamp (testdata values are exact microseconds, so the narrowing is
    lossless).
    """
    normalize_session(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts AS BIGINT) div 1000)")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# SQL fragments for the deterministic-float discipline (DuckDB dialect, but
# ANSI-conforming): exact decimal accumulation cast back to double.
def SQL_MONEY_SUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def SQL_PRODUCT_SUM(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE)"


def SQL_MONEY_AVG(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
