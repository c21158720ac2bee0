"""FtsFlowsDataSource: year-sharded partitions, nextLink pagination, canned
offline mode — the DataSource V2 form of S1/S2/S9."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.sources.fts_datasource import (
    FtsFlowsDataSource,
)


def _write_canned(tmp_path):
    def flow(i, amt, year):
        return {
            "id": i,
            "amountUSD": amt,
            "boundary": "incoming",
            "onBoundary": "single",
            "status": "paid",
            "description": f"flow {i}",
            "destinationObjects": [{"type": "Location", "name": "Kenya"}],
        }

    # 2023: two pages chained by nextLink; 2024: one page
    (tmp_path / "2023_page1.json").write_text(json.dumps({
        "data": {"flows": [flow(1, 10.0, 2023), flow(2, 20.0, 2023)]},
        "meta": {"nextLink": str(tmp_path / "2023_page2.json")},
    }))
    (tmp_path / "2023_page2.json").write_text(json.dumps({
        "data": {"flows": [flow(3, 30.0, 2023)]},
        "meta": {},
    }))
    (tmp_path / "2024_page1.json").write_text(json.dumps({
        "data": {"flows": [flow(7, None, 2024)]},
        "meta": {},
    }))


def test_datasource_reads_year_shards(spark, tmp_path):
    _write_canned(tmp_path)
    spark.dataSource.register(FtsFlowsDataSource)
    df = (
        spark.read.format("fts_flows")
        .option("years", "2023,2024")
        .option("canned_dir", str(tmp_path))
        .load()
    )
    rows = {r["id"]: r for r in df.collect()}
    assert set(rows) == {1, 2, 3, 7}
    assert rows[3]["year"] == 2023            # page 2 followed via nextLink
    assert rows[7]["amountUSD"] is None       # null amount survives
    assert "Kenya" in rows[1]["objects_json"]  # nested objects preserved
    # partition count == year count (one nextLink chain per executor shard)
    assert df.rdd.getNumPartitions() == 2
    # filters compose downstream (engine-side pushdown beyond the URL)
    assert df.filter(F.col("year") == 2023).count() == 3


def test_datasource_requires_years(spark, tmp_path):
    spark.dataSource.register(FtsFlowsDataSource)
    with pytest.raises(Exception):
        spark.read.format("fts_flows").option(
            "canned_dir", str(tmp_path)
        ).load().collect()
