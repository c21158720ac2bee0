"""EP1/EP2 pipeline tests over FIXTURES.md-shaped synthetic frames.

The catalog's ep2_cva_by_location is driver-oracle-checked; these tests run
the SAME plans on reference-schema fixtures (dotted column names, packed
strings, shared-boundary duplicates) and assert the §5 golden invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.plans.pipelines import (
    classify_cva,
    curate_flows,
    cva_by_location,
    parse_project_qa,
    usa_comparison,
)

YEAR_COL = "destinationObjects_UsageYear.name"
LOC_COL = "destinationObjects_Location.name"
CLUSTER_COL = "destinationObjects_Cluster.name"
PROJECT_COL = "destinationObjects_Project.id"
ORG_COL = "sourceObjects_Organization.id"


@pytest.fixture()
def raw_flows(spark):
    rows = [
        # id, amount, boundary, onBoundary, years, locations, src org
        (1, 300.0, "incoming", "single", "2023", "Kenya", "O1"),
        (2, 600.0, "incoming", "single", "2023; 2024", "Kenya; Somalia", "O1"),
        (3, 100.0, "outgoing", "single", "2023", "Kenya", "O1"),   # dropped F1
        (4, 400.0, "internal", "shared", "2024", "Somalia", "O2"), # D1 loser
        (4, 400.0, "incoming", "shared", "2024", "Somalia", "O2"), # D1 winner
        (5, 500.0, "incoming", "single", "2024", "Atlantis", "O9"),  # no dims
    ]
    return spark.createDataFrame(
        rows,
        f"id long, amountUSD double, boundary string, onBoundary string,"
        f" `{YEAR_COL}` string, `{LOC_COL}` string, `{ORG_COL}` string",
    )


@pytest.fixture()
def dims(spark):
    isos = spark.createDataFrame(
        [("Kenya", "KEN"), ("Somalia", "SOM")], "countryname_fts string, iso3 string"
    )
    orgs = spark.createDataFrame(
        [("O1", "United States", "USA", "Govt"),
         ("O2", "Somalia", "SOM", "NGO")],
        f"`{ORG_COL}` string, source_org_country string,"
        f" source_org_iso3 string, FTS_source_orgtype string",
    )
    deflators = spark.createDataFrame(
        [("USA", 2023, 0.5), ("SOM", 2024, 2.0)],
        "iso3 string, year int, gdp_defl double",
    )
    dac = spark.createDataFrame(
        [(2023, 1.0), (2024, 1.25)], "year int, gdp_defl double"
    )
    return isos, orgs, deflators, dac


def test_ep1_curate_invariants(raw_flows, dims):
    isos, orgs, deflators, dac = dims
    out = curate_flows(raw_flows, isos, orgs, deflators, dac).cache()
    rows = out.collect()

    # F1: outgoing flow 3 gone; D1: exactly one row set for shared id 4,
    # and it is the incoming one
    ids = {r["id"] for r in rows}
    assert 3 not in ids
    id4 = [r for r in rows if r["id"] == 4]
    assert {r["boundary"] for r in id4} == {"incoming"}
    assert len(id4) == 1

    # X1 sum preservation: per-id amounts sum to the (deduped) originals
    sums = {
        r["id"]: r["s"]
        for r in out.groupBy("id").agg(F.sum("amountUSD").alias("s")).collect()
    }
    assert sums == {
        1: pytest.approx(300.0),
        2: pytest.approx(600.0),
        4: pytest.approx(400.0),
        5: pytest.approx(500.0),
    }
    # flow 2 exploded to 2 years x 2 locations = 4 rows of 150 each;
    # multiyear flag set before the explode
    id2 = [r for r in rows if r["id"] == 2]
    assert len(id2) == 4
    for r in id2:
        assert r["amountUSD"] == pytest.approx(150.0)
    assert all(r["multiyear"] for r in id2)
    assert not [r for r in rows if r["id"] == 1][0]["multiyear"]

    # J2: destination iso resolved; unknown location left null
    by_loc = {(r["id"], r[LOC_COL]): r for r in rows}
    assert by_loc[(1, "Kenya")]["destination_org_iso3"] == "KEN"
    assert by_loc[(5, "Atlantis")]["destination_org_iso3"] is None

    # J3: source org enrichment
    assert by_loc[(1, "Kenya")]["source_org_iso3"] == "USA"
    assert by_loc[(5, "Atlantis")]["source_org_iso3"] is None

    # J4: deflator by (SOURCE iso3, year) where present, DAC by year else
    assert by_loc[(1, "Kenya")]["deflator"] == 0.5  # (USA, 2023)
    assert by_loc[(1, "Kenya")]["amountUSD_defl"] == pytest.approx(600.0)
    k23 = [r for r in id2 if r[LOC_COL] == "Kenya" and r["year"] == 2023][0]
    k24 = [r for r in id2 if r[LOC_COL] == "Kenya" and r["year"] == 2024][0]
    assert k23["deflator"] == 0.5   # (USA, 2023)
    assert k24["deflator"] == 1.25  # DAC 2024 fallback (no USA 2024 row)
    id4_row = id4[0]
    assert id4_row["deflator"] == 2.0  # (SOM, 2024)
    id5 = [r for r in rows if r["id"] == 5][0]
    assert id5["deflator"] == 1.25  # org unknown -> DAC by year


def test_ep2_classify_and_aggregate(spark):
    flows = spark.createDataFrame(
        [
            # id, amount, method, desc, project, cluster, location
            (1, 100.0, "Cash transfer programming (CTP)", "x", None, "", "Kenya"),
            (2, 200.0, "Traditional aid", "no match", "P1", "MPCA", "Kenya"),
            (3, 300.0, "Traditional aid", "cash grant", None, "", "Somalia"),
            (4, 400.0, "Traditional aid", "dull", None, "", "Somalia"),
            (5, None, "Traditional aid", "null amount", None, "", "Kenya"),
        ],
        f"id long, amountUSD double, method string, description string,"
        f" `{PROJECT_COL}` string, `{CLUSTER_COL}` string,"
        f" `{LOC_COL}` string",
    )
    projects = spark.createDataFrame(
        [("P1", "project text", 0.5, True)],
        "project_id string, project_text string, cva_percentage double,"
        " cva boolean",
    )
    decisions = spark.createDataFrame([(4, True)], "id long, accepted boolean")
    out = classify_cva(
        flows,
        projects,
        decisions,
        cash_clusters=["MPCA"],
        keywords=["cash", "voucher"],
        common_words=["cash", "voucher", "cva"],
    ).cache()
    rows = {r["id"]: r for r in out.collect()}

    assert 5 not in rows  # F9 dropna on amount
    assert rows[1]["relevance"] == "Full"  # CC1 method rule
    assert rows[1]["CVAamount"] == 100.0
    # id 2: CC1 says Full (exact cash cluster) but the project's 0.5
    # percentage band OVERRIDES it to Partial (code/08:139-148 rule order)
    assert rows[2]["relevance"] == "Partial"
    assert rows[2]["relevance_method"] == "Project CVA Percentage"
    # ...yet the AMOUNT cascade keys off CC1, not CC2 (code/09:32-41):
    # the exact-cash-cluster Full takes the whole amount
    assert rows[2]["CVAamount"] == 200.0
    assert rows[2]["CVAamount_type"] == "Sector, method, cluster"
    # id 3: keyword match, ML decides; id 4: manual decision folds back
    assert rows[3]["keyword_match"] is True
    assert rows[4]["CVAamount_type"] in ("Manual", "ML high predicted relevance", "")

    agg = cva_by_location(out)
    got = {r["location"]: r["n_flows"] for r in agg.collect()}
    assert got.get("Kenya", 0) >= 2


def test_ep2_classifier_input_is_description_only(spark):
    # The reference builds fts_to_inference.csv from description ALONE
    # (code/08:152-154: keep = c('id','description') renamed to text) while
    # keyword matching runs over all_text (code/08:131). Two flows with the
    # same description but different project_text must get identical
    # predictions; a different-length description must change them.
    flows = spark.createDataFrame(
        [
            (1, 100.0, "Traditional aid", "same desc", "P1", "", "Kenya"),
            (2, 100.0, "Traditional aid", "same desc", "P2", "", "Kenya"),
            (3, 100.0, "Traditional aid", "a longer description", None, "", "Kenya"),
        ],
        f"id long, amountUSD double, method string, description string,"
        f" `{PROJECT_COL}` string, `{CLUSTER_COL}` string,"
        f" `{LOC_COL}` string",
    )
    projects = spark.createDataFrame(
        [("P1", "short", None, False), ("P2", "a very different long project text", None, False)],
        "project_id string, project_text string, cva_percentage double,"
        " cva boolean",
    )
    decisions = spark.createDataFrame([], "id long, accepted boolean")
    out = classify_cva(
        flows, projects, decisions,
        cash_clusters=["MPCA"], keywords=["cash"], common_words=["cash"],
    )
    rows = {r["id"]: r for r in out.collect()}
    # all_text differs between 1 and 2 (different project_text)…
    assert rows[1]["all_text"] != rows[2]["all_text"]
    # …but predictions are identical: the classifier saw only description
    assert rows[1]["predicted_confidence"] == rows[2]["predicted_confidence"]
    assert rows[1]["predicted_class"] == rows[2]["predicted_class"]
    assert rows[3]["predicted_confidence"] != rows[1]["predicted_confidence"]

    # and with no real model loadable, the stub path is a pure JVM
    # expression — NO Python stage of any kind in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_parse_project_qa_branches():
    payload = {
        "data": {
            "name": "Proj",
            "objective": "obj",
            "currentRequestedFunds": 100.0,
            "globalClusters": [{"name": "Food"}, {"name": "Cash"}],
            "organizations": [{"id": 1, "name": "Org A"}],
            "plans": [{
                "planVersion": {"id": 5, "name": "Plan5"},
                "conditionFields": [
                    {"id": 11, "name": "Q-cash-pct"},
                    {"id": 12, "name": "Q-flag"},
                ],
            }],
            "projectVersionPlans": [{
                "projectVersionFields": [
                    {"conditionFieldId": 11, "value": "25%"},
                    {"conditionFieldId": 99, "value": "orphan"},  # bad def
                    {"conditionFieldId": 12, "value": None},      # null value
                ],
            }],
        }
    }
    rows = parse_project_qa(7, payload)
    assert len(rows) == 1  # one good field; bad ones skipped, no fallback
    assert rows[0]["question"] == "Q-cash-pct" and rows[0]["answer"] == "25%"
    assert rows[0]["global_clusters"] == "Food | Cash"
    assert rows[0]["plan_name"] == "Plan5"

    # no fields at all -> fallback row
    empty = {"data": {"name": "P", "plans": [{}],
                      "projectVersionPlans": [{}]}}
    rows = parse_project_qa(8, empty)
    assert [r["question"] for r in rows] == ["No field questions"]

    # fields present but ALL broken -> fallback row too
    broken = {"data": {"name": "P", "plans": [{"conditionFields": []}],
                       "projectVersionPlans": [{"projectVersionFields": [
                           {"conditionFieldId": 1, "value": "x"}]}]}}
    rows = parse_project_qa(9, broken)
    assert [r["question"] for r in rows] == ["No field questions"]


def test_usa_comparison(spark):
    cva = spark.createDataFrame(
        [
            (2024, "paid", "USAID", "Kenya", 60.0),
            (2024, "paid", "Other Org", "Kenya", 40.0),
            (2024, "pledge", "USAID", "Kenya", 999.0),   # pledge dropped
            (2023, "paid", "USAID", "Kenya", 999.0),     # wrong year
            (2024, "paid", "Other Org", "Somalia", 50.0),
        ],
        "year int, status string, `sourceObjects_Organization.name` string,"
        " `destinationObjects_Location.name` string, CVAamount double",
    )
    out = usa_comparison(cva, ["USAID"], year=2024)
    loc_col = "destinationObjects_Location.name"
    rows = {r[loc_col]: r for r in out.collect()}
    assert rows["Kenya"]["CVAamount"] == 100.0
    assert rows["Kenya"]["CVAamount_USA"] == 60.0
    assert rows["Kenya"]["CVAamount_USA_pc"] == pytest.approx(0.6)
    assert rows["Somalia"]["CVAamount_USA"] == 0.0
    assert rows["Somalia"]["CVAamount_USA_pc"] == 0.0
    assert [r[loc_col] for r in out.collect()] == ["Kenya", "Somalia"]


def test_orgs_dimension_flatten(spark):
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )
    from calp_cva_tracking_pipeline_spark.plans.pipelines import (
        orgs_dimension,
    )

    org_schema = StructType([
        StructField("id", LongType()),
        StructField("categories", ArrayType(StructType(
            [StructField("name", StringType())]))),
        StructField("locations", ArrayType(StructType(
            [StructField("id", LongType()),
             StructField("name", StringType())]))),
    ])
    raw = spark.createDataFrame(
        [
            (1, [{"name": "Govt"}], [{"id": 10, "name": "United States"}]),
            (2, [], []),                       # empty nested lists -> nulls
            (3, [{"name": "NGO"}, {"name": "Other"}],
             [{"id": 99, "name": "Atlantis"}]),  # unknown location id
        ],
        org_schema,
    )
    locs = spark.createDataFrame(
        [(10, "USA")], "id long, iso3 string"
    )
    out = {r["sourceObjects_Organization.id"]: r
           for r in orgs_dimension(raw, locs).collect()}
    assert out["1"]["source_org_country"] == "United States"
    assert out["1"]["source_org_iso3"] == "USA"
    assert out["1"]["FTS_source_orgtype"] == "Govt"
    assert out["2"]["source_org_country"] is None
    assert out["2"]["source_org_iso3"] is None
    assert out["3"]["FTS_source_orgtype"] == "NGO"  # FIRST category
    assert out["3"]["source_org_iso3"] is None      # unmapped location
