"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship pricing-summary query at sf0.001; queries() /
oracle_sql() expose the full operator catalog (SURVEY.md §2 inventory +
scale-tier operators) with DuckDB oracle SQL generated from the same
constants as the Spark plans. See calp_cva_tracking_pipeline_spark/catalog/.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from calp_cva_tracking_pipeline_spark import catalog as _catalog
from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.functions.numeric import (
    money_avg,
    money_sum,
    product_sum,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from pyspark.sql import functions as F

    li = T(spark, "/root/testdata/sf0.001", "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            product_sum(disc_price).alias("sum_disc_price"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ scale tier)."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query."""
    return _catalog.oracle_sql()
