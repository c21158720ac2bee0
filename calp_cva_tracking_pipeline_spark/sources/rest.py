"""Paginated REST JSON sources (SURVEY.md S1/S2/S9/S10).

The reference fetches the UN OCHA FTS API with a driver-side pagination loop
(code/01_fts_get_flows.R:31-46, page size 1000) and per-project GET loops
(code/06_fetch_projects.R:34-49). Here:

- Query-parameter pushdown (S2) builds the URL from a filter spec, so the
  server — not the cluster — does the filtering (code/01:8-29).
- Page fetching is injectable (``fetcher``), so tests and offline runs use a
  canned fetcher; no network is touched unless one is supplied.
- Per-entity fan-out fetch (S9) distributes the id list across executors
  with mapInPandas — thousands of HTTP GETs run cluster-wide, not on the
  driver.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[str], dict]

FTS_BASE = "https://api.hpc.tools/v1/public/fts/flow"


def http_json_fetcher(
    timeout: float = 30.0,
    retries: int = 3,
    backoff_s: float = 0.5,
    user_agent: str = "calp-cva-spark/1.0",
    sleep=None,
) -> Fetcher:
    """Default ``Fetcher``: stdlib urllib GET → parsed JSON dict.

    Retries transient failures (HTTP 5xx, connection/timeout errors) with
    exponential backoff; client errors (4xx) raise immediately — a bad URL
    is a bug, not weather. Serializable-by-construction (closes over plain
    values only) so the same fetcher works driver-side (S1 pagination) and
    inside executors (S9 ``fetch_entities_distributed``), where each Python
    worker re-creates its connection state independently.

    The reference's transport is R httr GET with no retry
    (code/01_fts_get_flows.R:31-46); retry-with-backoff is table stakes for
    a cluster-wide fan-out where thousands of workers hit one API.
    """
    import time as _time
    import urllib.error
    import urllib.request

    do_sleep = sleep if sleep is not None else _time.sleep
    retries = max(1, retries)  # retries=0 would raise None below

    def fetch(url: str) -> dict:
        last: Exception | None = None
        for attempt in range(retries):
            try:
                req = urllib.request.Request(
                    url, headers={"User-Agent": user_agent}
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as exc:
                if exc.code < 500:
                    raise
                last = exc
            except (urllib.error.URLError, TimeoutError, OSError) as exc:
                last = exc
            if attempt < retries - 1:
                do_sleep(backoff_s * (2**attempt))
        raise last  # type: ignore[misc]

    return fetch


def build_flow_url(
    base: str = FTS_BASE,
    year: int | None = None,
    plan_id: int | None = None,
    emergency_id: int | None = None,
    global_cluster_id: int | None = None,
    destination_location_id: int | None = None,
    page_size: int = 1000,
) -> str:
    """S2 — encode filters into the request URL (predicate pushdown to the
    source; reference code/01_fts_get_flows.R:8-29)."""
    params = [f"format=json&limit={page_size}"]
    if year is not None:
        params.append(f"year={year}")
    if plan_id is not None:
        params.append(f"planid={plan_id}")
    if emergency_id is not None:
        params.append(f"emergencyid={emergency_id}")
    if global_cluster_id is not None:
        params.append(f"globalclusterid={global_cluster_id}")
    if destination_location_id is not None:
        params.append(f"destinationlocationid={destination_location_id}")
    return base + "?" + "&".join(params)


def fetch_paginated(url: str, fetcher: Fetcher) -> list[dict]:
    """S1 — follow meta.nextLink until exhausted, concatenating page data
    (reference code/01_fts_get_flows.R:31-46)."""
    rows: list[dict] = []
    next_url: str | None = url
    while next_url:
        page = fetcher(next_url)
        data = page.get("data", {})
        rows.extend(data.get("flows", data.get("rows", [])))
        next_url = (page.get("meta") or {}).get("nextLink")
    return rows


def paginated_json_df(
    spark: SparkSession, url: str, fetcher: Fetcher, schema=None
) -> DataFrame:
    """Driver-side paginated fetch → DataFrame (permissive JSON parsing).

    Raw API ingestion is driver-side by design: the FTS API caps page size at
    1000 and rate-limits, so the bottleneck is the remote service; the
    cluster takes over from the first DataFrame on.
    """
    rows = fetch_paginated(url, fetcher)
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    # permissive raw-layer parsing (SURVEY §1.3): a malformed record lands
    # in _corrupt_record instead of failing the batch
    rdd = spark.sparkContext.parallelize([json.dumps(r) for r in rows])
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(rdd)
    )


def fetch_entities_distributed(
    ids: DataFrame,
    id_col: str,
    url_template: str,
    fetcher: Fetcher,
    out_schema,
    parse: Callable[[int, dict], list[dict]],
    partitions: int = 32,
) -> DataFrame:
    """S9 — per-entity GET loop distributed over executors.

    ``ids`` (distinct entity ids) is repartitioned and each partition issues
    its own HTTP GETs inside mapInPandas — the reference's serial
    per-project loop (code/06_fetch_projects.R:34-49) becomes
    cluster-parallel. ``parse`` maps one (id, response) to output rows.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for entity_id in pdf[id_col]:
                resp = fetcher(url_template.format(id=entity_id))
                out.extend(parse(entity_id, resp))
            yield pd.DataFrame(out, columns=[f.name for f in out_schema.fields])

    return (
        ids.select(id_col)
        .distinct()
        .repartition(partitions)
        .mapInPandas(run, out_schema)
    )
