"""Declared StructTypes for the engine's central table contracts.

The reference infers schemas dynamically (fread type-guessing,
rbindlist(fill=T) — SURVEY.md §1.3); at 100 TB the curated-flows schema is
the engine's contract and must be explicit. Column names match the reference
exactly, dots included (FIXTURES.md §1), because downstream join keys and
outputs depend on them.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(name: str) -> StructField:
    return StructField(name, StringType(), True)


# One row per (flow × usage-year × destination-location) after curate —
# the reference's fts_curated_{year}.csv shape (code/04_fts_curated_flows.R:87-119).
CURATED_FLOWS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("amountUSD", DoubleType(), True),
        _s("boundary"),
        _s("onBoundary"),
        _s("status"),
        _s("method"),
        _s("newMoney"),
        _s("description"),
        _s("destinationObjects_UsageYear.name"),
        _s("destinationObjects_Location.name"),
        _s("destinationObjects_Cluster.name"),
        _s("destinationObjects_GlobalCluster.name"),
        _s("destinationObjects_Organization.name"),
        _s("destinationObjects_Organization.organizationSubTypes"),
        _s("destinationObjects_Project.id"),
        _s("sourceObjects_Organization.id"),
        _s("sourceObjects_Organization.name"),
        StructField("year", IntegerType(), True),
        StructField("multiyear", BooleanType(), True),
        _s("destination_org_country"),
        _s("destination_org_iso3"),
        _s("source_org_country"),
        _s("source_org_iso3"),
        _s("FTS_source_orgtype"),
        StructField("deflator", DoubleType(), True),
        StructField("amountUSD_defl", DoubleType(), True),
        StructField("amountUSD_defl_millions", DoubleType(), True),
    ]
)

def conform(df, schema: StructType):
    """Align a DataFrame to a declared contract: columns selected in schema
    order, cast to the declared types, missing columns null-filled — the
    hardened Spark analog of rbindlist(fill=TRUE) at a WRITE boundary
    (SURVEY §1.3). Extra columns are dropped; the result always has exactly
    the contract's shape, so downstream readers never see drift.
    """
    from pyspark.sql import functions as F

    cols = []
    present = set(df.columns)
    for field in schema.fields:
        if field.name in present:
            cols.append(
                F.col(f"`{field.name}`").cast(field.dataType).alias(field.name)
            )
        else:
            cols.append(
                F.lit(None).cast(field.dataType).alias(field.name)
            )
    return df.select(*cols)


# Classifier I/O contract (classifier_code/fts_to_inference_output.csv).
INFERENCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("predicted_class", StringType(), True),
        StructField("predicted_confidence", DoubleType(), True),
    ]
)
