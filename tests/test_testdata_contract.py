"""Canary for driver-side testdata regeneration.

The round-4 regeneration silently changed events.ts from TIMESTAMP(NANOS)
to un-flagged TIMESTAMP(MICROS), which broke 3 correctness rows AND the
entire bench run (BENCH_r04.json recorded nothing). This pins the schema
every catalog query assumes, as seen THROUGH the T() loader, so the next
drift fails here with a readable diff instead of deep inside a plan."""

from __future__ import annotations

import pytest

from calp_cva_tracking_pipeline_spark.catalog.common import T

EXPECTED = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        # naive parquet timestamps read as NTZ; queries compare them to
        # string/timestamp literals, which is NTZ-safe under the UTC
        # session — only events.ts needs loader normalization (window
        # arithmetic + streaming need a zoned TIMESTAMP there)
        "o_orderdate": {"timestamp_ntz", "timestamp", "date"},
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": {"timestamp_ntz", "timestamp", "date"},
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # T() must normalize every physical encoding
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_contract(spark, sf_dir, table):
    df = T(spark, sf_dir, table)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = EXPECTED[table]
    assert set(got) == set(want), (
        f"{table}: columns drifted: got {sorted(got)}, "
        f"expected {sorted(want)}"
    )
    for col, typ in want.items():
        ok = got[col] in typ if isinstance(typ, set) else got[col] == typ
        assert ok, f"{table}.{col}: {got[col]!r} not in contract {typ!r}"
