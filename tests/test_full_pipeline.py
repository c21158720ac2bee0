"""Capstone: EP1 → EP2 → EP3 composed end-to-end on one fixture set.

Raw API-shaped flows run through curate (04) → project features (07) →
classify + amounts (08/ML/09) → location slice and USA comparison (11) →
org matching + double-count removal (10) as ONE chain of lazy plans — the
whole reference pipeline with no intermediate files, plus the schema
contract conformance check at the write boundary.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.plans.constants import (
    ALL_CASH_TERMS,
    COMMON_WORDS,
)
from calp_cva_tracking_pipeline_spark.plans.matching import (
    match_org_names,
    subtract_subgrants,
)
from calp_cva_tracking_pipeline_spark.plans.pipelines import (
    classify_cva,
    curate_flows,
    cva_by_location,
    usa_comparison,
)
from calp_cva_tracking_pipeline_spark.plans.projects import (
    build_project_features,
)
from calp_cva_tracking_pipeline_spark.plans.schemas import (
    CURATED_FLOWS_SCHEMA,
    conform,
)

YEAR_COL = "destinationObjects_UsageYear.name"
LOC_COL = "destinationObjects_Location.name"
CLUSTER_COL = "destinationObjects_Cluster.name"
PROJECT_COL = "destinationObjects_Project.id"
ORG_ID_COL = "sourceObjects_Organization.id"
ORG_NAME_COL = "sourceObjects_Organization.name"

CASH_CLUSTER = "Multi-Purpose Cash Assistance"


def test_full_reference_pipeline(spark):
    raw = spark.createDataFrame(
        [
            # id, amt, boundary, onB, years, locs, orgid, orgname, desc, proj, cluster, status
            (1, 1000.0, "incoming", "single", "2024", "Kenya", "O1",
             "United States Agency for International Development",
             "cash transfer programme", "P1", CASH_CLUSTER, "paid",
             "Traditional aid"),
            (2, 600.0, "incoming", "single", "2024; 2025", "Kenya; Somalia",
             "O2", "Other Donor", "food aid", None, "Health", "paid",
             "Traditional aid"),
            (3, 300.0, "outgoing", "single", "2024", "Kenya", "O1",
             "USAID", "dropped", None, "", "paid", "Traditional aid"),
        ],
        f"id long, amountUSD double, boundary string, onBoundary string,"
        f" `{YEAR_COL}` string, `{LOC_COL}` string, `{ORG_ID_COL}` string,"
        f" `{ORG_NAME_COL}` string, description string,"
        f" `{PROJECT_COL}` string, `{CLUSTER_COL}` string, status string,"
        f" method string",
    )
    isos = spark.createDataFrame(
        [("Kenya", "KEN"), ("Somalia", "SOM")],
        "countryname_fts string, iso3 string",
    )
    orgs = spark.createDataFrame(
        [("O1", "United States", "USA", "Govt"),
         ("O2", "Germany", "DEU", "Govt")],
        f"`{ORG_ID_COL}` string, source_org_country string,"
        f" source_org_iso3 string, FTS_source_orgtype string",
    )
    deflators = spark.createDataFrame(
        [("USA", 2024, 1.0), ("DEU", 2024, 1.0)],
        "iso3 string, year int, gdp_defl double",
    )
    dac = spark.createDataFrame(
        [(2024, 1.25), (2025, 1.25)], "year int, gdp_defl double"
    )

    # --- EP1: curate -------------------------------------------------------
    curated = curate_flows(raw, isos, orgs, deflators, dac)
    contract = conform(curated, CURATED_FLOWS_SCHEMA)
    assert [f.name for f in contract.schema.fields] == [
        f.name for f in CURATED_FLOWS_SCHEMA.fields
    ]

    # --- 07: project features from Q&A ------------------------------------
    qa = spark.createDataFrame(
        [("P1", "q_pct", "80%", "Project One", "objective one")],
        "project_id string, question string, answer string,"
        " project_name string, project_objective string",
    )
    labels = spark.createDataFrame(
        [("q_pct", "quantC")], "question string, question_type string"
    )
    features = build_project_features(qa, labels).join(
        qa.select("project_id", "project_objective").withColumnRenamed(
            "project_objective", "project_text"
        ).dropDuplicates(),
        "project_id",
    )

    # --- EP2: classify + amounts ------------------------------------------
    decisions = spark.createDataFrame([(999, True)], "id long, accepted boolean")
    cva = classify_cva(
        curated,
        features,
        decisions,
        cash_clusters=[CASH_CLUSTER],
        keywords=ALL_CASH_TERMS,
        common_words=COMMON_WORDS,
    ).cache()
    rows = {(r["id"], r[LOC_COL]): r for r in cva.collect()}
    # flow 1: exact cash cluster -> CC1 Full -> full amount
    r1 = rows[(1, "Kenya")]
    assert r1["sector_method_cluster_relevance"] == "Full"
    assert r1["CVAamount"] == 1000.0
    assert r1["keyword_match"] is True  # 'cash transfer' in the 31-term regex
    # flow 1's CC2 relevance overridden by the project's 0.8 pct
    assert r1["relevance"] == "Full"
    assert r1["relevance_method"] == "Project CVA Percentage"
    # flow 2 exploded: 4 rows of 150, no cash signals -> 0 amounts
    assert rows[(2, "Somalia")]["CVAamount"] == 0.0

    # --- EP3 sample slice + USA comparison --------------------------------
    by_loc = cva_by_location(cva)
    loc = {r["location"]: r["cva_usd_m"] for r in by_loc.collect()}
    assert loc["Kenya"] == pytest.approx(0.001)  # 1000 USD in millions
    comp = usa_comparison(
        cva.withColumn("year", F.lit(2024)),
        ["United States Agency for International Development"],
    )
    c = {r[LOC_COL]: r for r in comp.collect()}
    assert c["Kenya"]["CVAamount_USA"] == 1000.0
    assert c["Kenya"]["CVAamount_USA_pc"] == pytest.approx(1.0)

    # --- EP3 global: match + subtract -------------------------------------
    cva_agg = (
        cva.filter(F.col("CVAamount") > 0)
        .groupBy(
            F.lower(F.col(f"`{ORG_NAME_COL}`")).alias("clean_org"),
            F.lit(2024).alias("Year"),
            F.lit("FALSE").alias("newMoney"),
            F.lit("Govt").alias("Org_type"),
        )
        .agg((F.sum("CVAamount") / 1e6).alias("PC.USD.m"))
    )
    sub_grants = spark.createDataFrame(
        [("United states agency for international development!", 2024, 400.0)],
        "recipient_name string, Year int, amount double",
    )
    mapping = match_org_names(
        sub_grants.select("recipient_name"),
        cva_agg.select("clean_org"),
    )
    pc_tv = spark.createDataFrame(
        [(2024, 0.5)], "Year int, PC_average_used double"
    )
    undoubled, rollup = subtract_subgrants(
        cva_agg, sub_grants.withColumn(
            "amount", F.col("amount") / 1e6
        ), mapping, pc_tv
    )
    u = {r["clean_org"]: r for r in undoubled.collect()}
    usaid = "united states agency for international development"
    # 0.001m - 0.0004m subgrant = 0.0006m
    assert u[usaid]["PC.USD.m_undoubled"] == pytest.approx(0.0006)
    r = rollup.collect()[0]
    assert r["TV.USD.m"] == pytest.approx(0.0003)
