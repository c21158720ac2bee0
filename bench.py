#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is timed end-to-end (plan + execute + collect-to-driver count),
mirroring how the engine would be driven in production. Headliners span the
engine's main cost classes: scan+agg, broadcast join, window, explode,
cascade, MinHash dedup, ANN, sessionization, text featurization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from calp_cva_tracking_pipeline_spark.session import get_spark

HEADLINE = [
    "flagship_pricing_summary",
    "j2_broadcast_enrich",
    "a3_group_sum_millions",
    "d1_priority_dedup",
    "w1_cumprod",
    "x1_equal_split_explode",
    "cc3_amount_cascade",
    "j10_fuzzy_levenshtein",
    "ep2_cva_by_location",
    "dd_minhash_lsh",
    "ann_brute_topk",
    "tx_features",
    "st_sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="calp-cva-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["flagship_pricing_summary"] = _flagship

    # warm the JVM/session so the first headline doesn't pay startup cost
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


def _flagship(spark, sf_dir):
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.functions.numeric import (
        money_avg,
        money_sum,
        product_sum,
    )

    li = T(spark, sf_dir, "lineitem")
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
    )


if __name__ == "__main__":
    main()
