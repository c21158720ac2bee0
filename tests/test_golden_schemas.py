"""Golden-schema parity with the reference's committed output CSVs.

SURVEY.md §5 names the reference's shipped outputs as schema oracles: their
VALUES depend on the confidential survey workbook, but their column headers
are committed in the reference repo and are exactly what a downstream
consumer would diff first when switching engines. These tests pin our sink
DataFrames' column names (and order) to those headers:

  output/cva_agg.csv              <- plans.matching.subtract_subgrants[0]
                                     (sink: code/10_global_cva_analysis.R:323)
  output/cva_agg_org_type.csv     <- plans.matching.subtract_subgrants[1]
                                     (sink: code/10_global_cva_analysis.R:324)
  output/fts_cva_USA_analysis.csv <- plans.pipelines.usa_comparison
                                     (sink: code/11_refresh_2024_sample_analysis.R:89)

The headers are inlined (they ARE the contract); when the reference checkout
is present the inlined copies are cross-checked against the files so drift
in either direction fails loudly.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from calp_cva_tracking_pipeline_spark.plans.matching import subtract_subgrants
from calp_cva_tracking_pipeline_spark.plans.pipelines import usa_comparison

_REF_OUTPUT_DIR = "/root/reference/output"

# Committed header of output/cva_agg.csv (19 columns). The first 17 come
# from the survey-workbook merge (code/10:30-36,86-110); subtract_subgrants
# appends the last two.
CVA_AGG_HEADER = [
    "clean_org",
    "Year",
    "newMoney",
    "Organisation",
    "Org_type",
    "Local_type",
    "PC.USD.m",
    "TV.USD.m",
    "Cash.USD",
    "Vouchers.USD",
    "Source.PC",
    "Source.TV",
    "Comment",
    "Reasons.for.year-on-year.change",
    "source",
    "destinationObjects_Organization.organizationSubTypes",
    "destinationObjects_Organization.name",
    "PC.USD.m_subgrant",
    "PC.USD.m_undoubled",
]

CVA_AGG_ORG_TYPE_HEADER = ["Year", "Org_type", "PC.USD.m", "TV.USD.m"]

FTS_CVA_USA_HEADER = [
    "destinationObjects_Location.name",
    "CVAamount",
    "CVAamount_USA",
    "CVAamount_USA_pc",
]


def _committed_header(filename: str) -> list[str] | None:
    path = os.path.join(_REF_OUTPUT_DIR, filename)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        return fh.readline().rstrip("\n").split(",")


def test_inlined_headers_match_reference_checkout():
    """When the reference repo is on disk, the inlined contracts above must
    be byte-identical to its committed CSV headers."""
    for filename, inlined in [
        ("cva_agg.csv", CVA_AGG_HEADER),
        ("cva_agg_org_type.csv", CVA_AGG_ORG_TYPE_HEADER),
        ("fts_cva_USA_analysis.csv", FTS_CVA_USA_HEADER),
    ]:
        committed = _committed_header(filename)
        if committed is not None:
            assert committed == inlined, filename


def _survey_cva_agg(spark):
    """A cva_agg input shaped exactly like the survey-merge product: the
    committed header minus the two columns subtract_subgrants appends."""
    cols = CVA_AGG_HEADER[:-2]
    row = {
        "clean_org": "org a",
        "Year": 2023,
        "newMoney": "FALSE",
        "Organisation": "Org A",
        "Org_type": "NGO",
        "Local_type": None,
        "PC.USD.m": 10.0,
        "TV.USD.m": 12.0,
        "Cash.USD": 8.0,
        "Vouchers.USD": 2.0,
        "Source.PC": "survey",
        "Source.TV": "survey",
        "Comment": None,
        "Reasons.for.year-on-year.change": None,
        "source": "survey",
        "destinationObjects_Organization.organizationSubTypes": None,
        "destinationObjects_Organization.name": "Org A",
    }
    schema = ", ".join(
        f"`{c}` " + (
            "int" if c == "Year"
            else "double" if row[c] is not None and isinstance(row[c], float)
            else "string"
        )
        for c in cols
    )
    return spark.createDataFrame([tuple(row[c] for c in cols)], schema)


def test_cva_agg_sinks_golden_schema(spark):
    cva_agg = _survey_cva_agg(spark)
    sub_grants = spark.createDataFrame(
        [("Org A!", 2023, 4.0)],
        "recipient_name string, Year int, amount double",
    )
    mapping = spark.createDataFrame(
        [("org a", "org a")], "name string, matched_name string"
    )
    pc_tv = spark.createDataFrame(
        [(2023, 0.5)], "Year int, PC_average_used double"
    )
    undoubled, rollup = subtract_subgrants(
        cva_agg, sub_grants, mapping, pc_tv
    )
    # name AND order parity with the committed headers
    assert undoubled.columns == CVA_AGG_HEADER
    assert rollup.columns == CVA_AGG_ORG_TYPE_HEADER
    # type parity on the engine-computed money columns
    u_types = dict(undoubled.dtypes)
    assert u_types["PC.USD.m_subgrant"] == "double"
    assert u_types["PC.USD.m_undoubled"] == "double"
    r_schema = {f.name: f.dataType for f in rollup.schema.fields}
    assert isinstance(r_schema["PC.USD.m"], DoubleType)
    assert isinstance(r_schema["TV.USD.m"], DoubleType)
    # and the plan still computes (smoke: one row in, one row out per sink)
    assert undoubled.count() == 1 and rollup.count() == 1


def test_fts_cva_usa_sink_golden_schema(spark):
    cva = spark.createDataFrame(
        [
            (2024, "paid", "USAID", "Kenya", 60.0),
            (2024, "paid", "Other", "Kenya", 40.0),
        ],
        "year int, status string, `sourceObjects_Organization.name` string,"
        " `destinationObjects_Location.name` string, CVAamount double",
    )
    out = usa_comparison(cva, ["USAID"], year=2024)
    assert out.columns == FTS_CVA_USA_HEADER
    types = {f.name: f.dataType for f in out.schema.fields}
    for col in ["CVAamount", "CVAamount_USA", "CVAamount_USA_pc"]:
        assert isinstance(types[col], DoubleType), col
    assert out.count() == 1
