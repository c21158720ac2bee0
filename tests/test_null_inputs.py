"""Every catalog query must survive null-riddled inputs.

Real ingested data is never clean: optional columns arrive null in
bursts (a feed drops a field, a tenant never fills one in). This sweep
nulls ~30% of every non-key column across the whole star schema —
deterministically, so failures reproduce — and requires every catalog
query to build and execute without throwing. Complements
test_empty_inputs (zero rows) with the dirty-but-present case; together
they pin the guard discipline (null-safe compares, coalesce waterfalls,
when(den > 0) divisions) the oracle parity suite exercises only lightly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive

_KEYS = {
    "r_regionkey", "n_nationkey", "c_custkey", "s_suppkey", "p_partkey",
    "o_orderkey", "l_orderkey", "l_linenumber", "event_id", "doc_id",
    "vec_id",
}


@pytest.fixture(scope="module")
def nully_dir(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sf_nully")
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        for c in df.columns:
            if c in _KEYS:
                continue
            df = df.withColumn(
                c,
                F.when(
                    F.xxhash64(F.lit(c), F.monotonically_increasing_id())
                    % 10
                    < 3,
                    F.lit(None),
                ).otherwise(F.col(c)),
            )
        df.write.mode("overwrite").parquet(str(tmp / f"{t}.parquet"))
    return str(tmp)


def test_every_catalog_query_survives_null_bursts(spark, nully_dir):
    errs = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, nully_dir).count()
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            errs[name] = (
                f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
            )
    assert not errs, f"queries crashing on null-burst inputs: {errs}"
