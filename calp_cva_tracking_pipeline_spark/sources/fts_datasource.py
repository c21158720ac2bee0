"""FTS flows as a Spark Python DataSource (DataSource V2 API, S1/S2/S9).

The reference fetches the paginated FTS API in one driver-side loop
(code/01_fts_get_flows.R:31-46). ``sources.rest`` keeps that shape for
small pulls; THIS module is the cluster-scale path: a registered Spark data
source whose partitions are (year) shards, each executor following its own
shard's ``meta.nextLink`` chain in parallel. Predicate pushdown (S2) is the
option set — year/plan/cluster filters become URL parameters
(code/01:8-29), so the server filters before bytes move.

Offline/test mode: pass ``canned_dir`` and each partition reads
``{canned_dir}/{year}_page{N}.json`` files instead of the network — the
pagination protocol (nextLink following) is identical. No network is
touched unless ``canned_dir`` is absent.

Usage::

    spark.dataSource.register(FtsFlowsDataSource)
    df = (spark.read.format("fts_flows")
          .option("years", "2023,2024")
          .option("canned_dir", "/path/to/json")   # or live base_url
          .load())
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from calp_cva_tracking_pipeline_spark.sources.rest import (
    FTS_BASE,
    build_flow_url,
)

# Core columns of the raw flows payload (FIXTURES.md §1 subset); the full
# nested objects ride along as a JSON string for downstream X4/X5 flattening.
FLOWS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("year", IntegerType(), False),
        StructField("amountUSD", DoubleType(), True),
        StructField("boundary", StringType(), True),
        StructField("onBoundary", StringType(), True),
        StructField("status", StringType(), True),
        StructField("description", StringType(), True),
        StructField("objects_json", StringType(), True),
    ]
)


class _YearPartition(InputPartition):
    def __init__(self, year: int):
        self.year = year


class FtsFlowsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.years = [
            int(y) for y in str(options.get("years", "")).split(",") if y
        ]
        if not self.years:
            raise ValueError("fts_flows requires option 'years' (csv of ints)")
        self.canned_dir = options.get("canned_dir")
        self.base_url = options.get("base_url", FTS_BASE)
        self.page_size = int(options.get("page_size", 1000))
        self.plan_id = options.get("plan_id")

    def partitions(self):
        # one shard per year: each executor walks its own nextLink chain
        return [_YearPartition(y) for y in self.years]

    # --- page protocol -----------------------------------------------------

    def _first_url(self, year: int) -> str:
        if self.canned_dir:
            return f"{self.canned_dir}/{year}_page1.json"
        return build_flow_url(
            base=self.base_url,
            year=year,
            plan_id=int(self.plan_id) if self.plan_id else None,
            page_size=self.page_size,
        )

    def _fetch(self, url: str) -> dict:
        if self.canned_dir:
            with open(url, encoding="utf-8") as fh:
                return json.load(fh)
        from urllib.request import urlopen  # pragma: no cover (live mode)

        with urlopen(url) as resp:  # pragma: no cover
            return json.load(resp)

    def read(self, partition: _YearPartition) -> Iterator[tuple]:
        url = self._first_url(partition.year)
        while url:
            page = self._fetch(url)
            data = page.get("data", {})
            for flow in data.get("flows", data.get("rows", [])):
                yield (
                    int(flow["id"]),
                    partition.year,
                    float(flow["amountUSD"])
                    if flow.get("amountUSD") is not None
                    else None,
                    flow.get("boundary"),
                    flow.get("onBoundary"),
                    flow.get("status"),
                    flow.get("description"),
                    json.dumps(
                        {
                            k: v
                            for k, v in flow.items()
                            if k.endswith("Objects")
                        }
                    )
                    if any(k.endswith("Objects") for k in flow)
                    else None,
                )
            url = (page.get("meta") or {}).get("nextLink")


class FtsFlowsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "fts_flows"

    def schema(self) -> StructType:
        return FLOWS_SCHEMA

    def reader(self, schema: StructType) -> FtsFlowsReader:
        return FtsFlowsReader(self.options)
