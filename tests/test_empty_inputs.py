"""Every catalog query must SURVIVE zero-row inputs.

At production scale an empty slice is routine — a date partition with no
data yet, a tenant with no documents, a changelog with no changes — and
Spark's ANSI mode turns a missing guard (x/0, max of nothing fed into
arithmetic, Python-side division by a collected count) into a job-killer.
Each query must build and execute against a fully empty star schema; the
row count may be anything (grids and report rows can legitimately be
empty or constant-shaped), but nothing may throw. Caught live:
gr_pagerank divided by a zero node count at plan-build time.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sf_empty")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(
            str(tmp / f"{t}.parquet")
        )
    return str(tmp)


def test_every_catalog_query_survives_empty_tables(spark, empty_dir):
    errs = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, empty_dir).count()
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            errs[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
    assert not errs, f"queries crashing on empty inputs: {errs}"
