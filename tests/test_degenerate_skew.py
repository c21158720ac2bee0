"""Catalog-wide sweep at MAXIMUM skew: every document identical, every
embedding identical, every event from one user.

This is the degenerate end of the skew spectrum the 8× replication
probes (SCALE.md) sample the middle of: one key owns everything. The
dedup tiers' exact pre-collapse + per-bucket caps, the ANN tiers' cell
caps, and the keyed windows must BOUND the work — every query must
finish fast (no quadratic pair blowup materializes) and return a sane
row count, not merely avoid crashing. A regression that drops a skew
guard turns the identical-document corpus into ~125k pairs from 500
docs; the row-count ceiling catches it.
"""

from __future__ import annotations

import random
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entrymod

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive

_ONE_TEXT = (
    "the same document body repeated everywhere with several words to "
    "shingle properly across the corpus"
)


@pytest.fixture(scope="module")
def skew_dir(spark, sf_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sf_skew")
    for t in "region nation customer supplier part orders lineitem".split():
        shutil.copy(f"{sf_dir}/{t}.parquet", str(tmp / f"{t}.parquet"))
    pq.write_table(
        pa.table({
            "doc_id": pa.array(list(range(500)), pa.int64()),
            "text": pa.array([_ONE_TEXT] * 500, pa.string()),
            "lang": pa.array(["en"] * 500, pa.string()),
            "source": pa.array(["web"] * 500, pa.string()),
            "n_chars": pa.array([len(_ONE_TEXT)] * 500, pa.int64()),
        }),
        str(tmp / "documents.parquet"),
    )
    rng = random.Random(1)
    vec = [rng.random() for _ in range(32)]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(list(range(400)), pa.int64()),
            "embedding": pa.array([vec] * 400, pa.list_(pa.float32())),
            "label": pa.array(["cls0"] * 400, pa.string()),
        }),
        str(tmp / "embeddings.parquet"),
    )
    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT event_id, ts, CAST(0 AS BIGINT) AS user_id, "
        f"event_type, value, props FROM "
        f"read_parquet('{sf_dir}/events.parquet')) "
        f"TO '{tmp}/events.parquet' (FORMAT PARQUET)"
    )
    return str(tmp)


def test_every_catalog_query_bounded_under_total_skew(spark, skew_dir):
    bad = {}
    for name, fn in entrymod.queries().items():
        try:
            n = fn(spark, skew_dir).count()
            if n > 2_000_000:
                bad[name] = f"row blowup: {n} rows"
        except Exception as exc:  # noqa: BLE001 - collecting all failures
            bad[name] = (
                f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
            )
    assert not bad, f"queries degrading under total skew: {bad}"
