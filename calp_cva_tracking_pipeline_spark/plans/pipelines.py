"""EP1/EP2/EP3 — the reference's three entry points as lazy DataFrame DAGs.

The reference runs these as imperative scripts with file handoffs between
stages and a pause for the external Python classifier (SURVEY.md §3). Here
each is ONE composable function: Catalyst sees the whole chain, so filters
push to the scan, dimension joins broadcast, and the classifier is an
in-DAG pandas_udf instead of a CSV side trip.

Column names follow the reference contract (plans.schemas); every step cites
the reference lines it re-expresses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.cascade import (
    cva_amount_cascade,
    multi_destination_collapse,
    relevance_with_ml,
    sector_method_cluster_relevance,
    when_cascade,
)
from calp_cva_tracking_pipeline_spark.operators.dedup import priority_dedup
from calp_cva_tracking_pipeline_spark.operators.joins import join_with_fallback
from calp_cva_tracking_pipeline_spark.operators.mlstub import classify_flows
from calp_cva_tracking_pipeline_spark.operators.reshape import split_rows_equal
from calp_cva_tracking_pipeline_spark.functions.text import keyword_flag


def curate_flows(
    raw: DataFrame,
    isos: DataFrame,
    orgs: DataFrame,
    deflators: DataFrame,
    dac_deflators: DataFrame,
    year_col: str = "destinationObjects_UsageYear.name",
    location_col: str = "destinationObjects_Location.name",
    org_id_col: str = "sourceObjects_Organization.id",
) -> DataFrame:
    """EP1 — raw flows → curated flows (code/04_fts_curated_flows.R:78-120).

    outgoing filter (F1) → shared-boundary priority dedup (D1) →
    year/multiyear derivation → equal-split explode by usage-year then
    location (X1, Σ preserved) → destination ISO broadcast join (J2) →
    multi-destination collapse (CC5 — catches residual packed values the
    '; '-split left intact) → source-org enrichment (J3) → deflator join on
    (source_org_iso3, year) with DAC fallback (J4, code/04:117-118) →
    deflated amount columns (C9, code/04:119).

    Dimension contracts: ``isos`` (countryname_fts, iso3); ``orgs``
    pre-flattened per FIXTURES.md §5 (sourceObjects_Organization.id,
    source_org_country, source_org_iso3, FTS_source_orgtype);
    ``deflators`` (iso3, year, gdp_defl); ``dac_deflators`` (year,
    gdp_defl).
    """
    flows = raw.filter(F.col("boundary") != "outgoing")  # code/04:80
    shared = flows.filter(F.col("onBoundary") == "shared")
    rest = flows.filter(
        F.col("onBoundary").isNull() | (F.col("onBoundary") != "shared")
    )
    # incoming preferred over internal per shared id (code/04:83-84)
    pri = when_cascade(
        F.lit(2),
        [(F.col("boundary") == "incoming", F.lit(0)),
         (F.col("boundary") == "internal", F.lit(1))],
    )
    deduped = priority_dedup(shared, ["id"], pri, ["boundary"])
    flows = rest.unionByName(deduped)
    # year + multiyear flags (code/04:86-88), then one row per usage-year
    # and per location with the amount split equally (code/04:89-92)
    flows = flows.withColumn(
        "multiyear", F.col(f"`{year_col}`").contains(";")
    )
    flows = split_rows_equal(flows, year_col, ["amountUSD"])
    flows = split_rows_equal(flows, location_col, ["amountUSD"])
    flows = flows.withColumn("year", F.col(f"`{year_col}`").cast("int"))
    # destination ISO enrichment (code/04:95-96) — broadcast dimension join
    iso_dim = isos.select(
        F.col("countryname_fts").alias(location_col),
        F.col("iso3").alias("destination_org_iso3"),
    )
    flows = flows.join(F.broadcast(iso_dim), [location_col], "left")
    # CC5 multi-destination collapse (code/04:97-98)
    name, iso = multi_destination_collapse(
        F.col(f"`{location_col}`"), F.col("destination_org_iso3")
    )
    flows = flows.withColumn("destination_org_country", name).withColumn(
        "destination_org_iso3", iso
    )
    # J3 source-org enrichment (code/04:101-106) — broadcast join
    flows = flows.join(F.broadcast(orgs), [org_id_col], "left")
    # J4 deflator on SOURCE org iso3 with DAC fallback (code/04:109-118)
    flows = join_with_fallback(
        flows,
        deflators.select(
            F.col("iso3").alias("source_org_iso3"), "year", "gdp_defl"
        ),
        ["source_org_iso3", "year"],
        dac_deflators.select("year", "gdp_defl"),
        ["year"],
        "gdp_defl",
        out_col="deflator",
    )
    return flows.withColumn(
        "amountUSD_defl", F.col("amountUSD") / F.col("deflator")
    ).withColumn(
        "amountUSD_defl_millions", F.col("amountUSD_defl") / 1e6
    )


def orgs_dimension(
    raw_orgs: DataFrame,
    locations: DataFrame,
) -> DataFrame:
    """S10 — the org/location master lists flattened into curate's source-org
    dimension (code/04_fts_curated_flows.R:101-106).

    ``raw_orgs`` carries the API's nested shape: (id,
    categories: array<struct<name,...>>, locations: array<struct<id,name,...>>);
    the reference takes the FIRST element of each nested list (NA-safe) and
    resolves the location id to iso3 through the locations master
    (id, iso3). Pure element_at projections + one broadcast join — no
    explode, no shuffle of the org list.
    """
    # try_element_at: empty nested lists yield null (ANSI element_at throws)
    first_cat = F.try_element_at(F.col("categories"), F.lit(1))
    first_loc = F.try_element_at(F.col("locations"), F.lit(1))
    flat = raw_orgs.select(
        F.col("id").cast("string").alias("sourceObjects_Organization.id"),
        first_loc.getField("name").alias("source_org_country"),
        first_loc.getField("id").alias("__loc_id"),
        first_cat.getField("name").alias("FTS_source_orgtype"),
    )
    loc_dim = locations.select(
        F.col("id").alias("__loc_id"), F.col("iso3").alias("source_org_iso3")
    )
    return flat.join(F.broadcast(loc_dim), "__loc_id", "left").select(
        "`sourceObjects_Organization.id`",
        "source_org_country",
        "source_org_iso3",
        "FTS_source_orgtype",
    )


def classify_cva(
    flows: DataFrame,
    projects: DataFrame,
    decisions: DataFrame,
    cash_clusters: list[str],
    keywords: list[str],
    common_words: list[str],
    flow_id_col: str = "id",
    project_key_col: str = "destinationObjects_Project.id",
    cluster_col: str = "destinationObjects_Cluster.name",
) -> DataFrame:
    """EP2 — curated flows → per-flow CVA amounts (scripts 08 → ML → 09).

    J7 project-features left join (string-cast keys, code/08:38,47-48) →
    all_text concat (C7, code/08:50) → C1 keyword flag (code/08:131) →
    CC1 relevance (code/08:121-128) → M1 in-DAG classifier
    (classifier_code/flow_inference.py, no file pause) → CC2
    relevance/relevance_method (code/08:139-148,175-182) → C4 cluster count
    (code/09:26-27) → CC3 amount cascade incl. manual fold-back
    (code/09:29-54,84-86). F9: flows with null amountUSD are dropped up
    front (the reference's complete-cases guard).

    The classifier input is the DESCRIPTION column, not all_text: the
    reference builds fts_to_inference.csv from description alone
    (code/08:152-154, keep = c('id','description') renamed to text), while
    keyword/common-words matching runs over all_text (code/08:131,
    code/09:50). tests/test_plans.py pins the distinction.

    ``projects`` must expose (project_id, project_text, cva_percentage, cva);
    ``decisions`` (id, accepted:boolean).
    """
    flows = flows.dropna(subset=["amountUSD"])  # F9
    proj = projects.select(
        F.col("project_id").cast("string").alias("__pkey"),
        "project_text",
        F.col("cva_percentage").alias("project_cva_percentage"),
        F.col("cva").alias("project_cva"),
    )
    out = flows.join(
        F.broadcast(proj),
        F.col(f"`{project_key_col}`").cast("string") == F.col("__pkey"),
        "left",
    ).drop("__pkey")
    # Column groups are batched into the FEWEST withColumns calls the
    # dependency chain allows: every DataFrame method is a full analyzer
    # pass over the (wide, growing) plan, measured at 15-100ms of driver
    # time each on this pipeline. all_text is emitted AND inlined into the
    # two keyword flags (withColumns entries cannot reference siblings;
    # Catalyst CSEs the duplicate concat), and the CC2 relevance columns
    # ride in the same pass as the CC3 amounts after the decisions join —
    # neither consumes the other.
    all_text = F.concat_ws(" ", F.col("description"), F.col("project_text"))
    cluster = F.col(f"`{cluster_col}`")
    out = out.withColumns(
        {
            "all_text": all_text,
            "keyword_match": keyword_flag(all_text, keywords),
            "sector_method_cluster_relevance": (
                sector_method_cluster_relevance(
                    F.col("method"), cluster, cash_clusters
                )
            ),
            # C4 (code/09:26-27) + code/09:50
            "destinationClusterCount": F.when(
                cluster.isNull() | (cluster == ""), F.lit(0)
            ).otherwise(F.size(F.split(cluster, ";"))),
            "common_words_match": keyword_flag(all_text, common_words),
        }
    )
    # M1, in-DAG, over description only (code/08:152-154); native-expression
    # stub when no model is loadable — no Python stage in the benched plan
    out = classify_flows(out, "description")
    dec = decisions.select(
        F.col("id").alias(flow_id_col),
        F.col("accepted").alias("__accepted"),
    )
    out = out.join(F.broadcast(dec), [flow_id_col], "left")
    relevance, rel_method = relevance_with_ml(
        F.col("sector_method_cluster_relevance"),
        F.col("project_cva_percentage"),
        F.col("keyword_match"),
        F.coalesce(F.col("project_cva"), F.lit(False)),
        F.col("predicted_class"),
    )
    # CC3 keys off CC1's sector/method/cluster relevance, NOT CC2's
    # ML-augmented relevance (code/09:32-41 indexes
    # sector_method_cluster_relevance); CC2's relevance/relevance_method
    # ride along as output columns (fts_output_CVA.csv contract).
    amount, amount_type = cva_amount_cascade(
        relevance=F.col("sector_method_cluster_relevance"),
        amount=F.col("amountUSD"),
        cluster_count=F.col("destinationClusterCount"),
        pct=F.col("project_cva_percentage"),
        confidence=F.col("predicted_confidence"),
        common_words=F.col("common_words_match"),
        manual_accept=F.coalesce(F.col("__accepted"), F.lit(False)),
    )
    return out.withColumns(
        {
            "relevance": relevance,
            "relevance_method": rel_method,
            "CVAamount": amount,
            "CVAamount_type": amount_type,
        }
    ).drop("__accepted")


def parse_project_qa(project_id: int, payload: dict) -> list[dict]:
    """X6 parse for one project API payload → long Q&A rows
    (code/06_fetch_projects.R:60-141). Designed as the ``parse`` callable
    of sources.rest.fetch_entities_distributed (S9), so thousands of
    project JSONs decode cluster-wide inside mapInPandas.

    Emits one row per (conditionField definition, field value) pair; the
    placeholder row ("No field questions"/"No field answers") appears when
    the project has no field values OR every field references a missing
    definition — the reference's two fallback branches.
    """
    project = (payload or {}).get("data", payload) or {}
    plans = project.get("plans") or [{}]
    plan = plans[0]
    base = {
        "project_id": project_id,
        "project_name": project.get("name"),
        "project_objective": project.get("objective"),
        "currently_requested_funds": project.get("currentRequestedFunds"),
        "plan_id": (plan.get("planVersion") or {}).get("id"),
        "plan_name": (plan.get("planVersion") or {}).get("name"),
        "global_clusters": " | ".join(
            c.get("name", "") for c in project.get("globalClusters") or []
        ),
        "organisation_ids": " | ".join(
            str(o.get("id", "")) for o in project.get("organizations") or []
        ),
        "organisation_names": " | ".join(
            o.get("name", "") for o in project.get("organizations") or []
        ),
    }
    defs = {
        str(d.get("id")): d for d in plan.get("conditionFields") or []
    }
    pvp = project.get("projectVersionPlans") or [{}]
    fields = pvp[0].get("projectVersionFields") or []
    rows, errors = [], 0
    for field in fields:
        d = defs.get(str(field.get("conditionFieldId")))
        if d is not None and field.get("value") is not None:
            rows.append(
                {**base, "question": d.get("name"), "answer": field["value"]}
            )
        else:
            errors += 1
    if not fields or (fields and errors == len(fields)):
        rows.append(
            {
                **base,
                "question": "No field questions",
                "answer": "No field answers",
            }
        )
    return rows


def usa_comparison(
    cva: DataFrame,
    usa_source_orgs: list[str],
    year: int = 2024,
    location_col: str = "destinationObjects_Location.name",
    source_org_col: str = "sourceObjects_Organization.name",
) -> DataFrame:
    """EP3 sample analysis (code/11_refresh_2024_sample_analysis.R:44-89):
    year + non-pledge filters (F2/F3) → global and USA-source (F4)
    per-location sums (A6) → full-outer comparison (J13) with zero fill
    for the USA side only → USA share ratio → alphabetical order.

    Matches the reference's asymmetric fill: a location with USA money but
    somehow no global rows keeps a null (not zero) global amount, and the
    ratio divides by it faithfully (null → null share). A zero global total
    yields a null share (R would produce NaN/Inf; null avoids ANSI division
    errors and is dropped the same way downstream).

    Output columns are the reference sink's exact header
    (output/fts_cva_USA_analysis.csv): the location keeps its source
    column name (``destinationObjects_Location.name`` by default), then
    CVAamount, CVAamount_USA, CVAamount_USA_pc — pinned by
    tests/test_golden_schemas.py.
    """
    base = cva.filter(
        (F.col("year") == year) & (F.col("status") != "pledge")
    )
    loc = F.col(f"`{location_col}`")
    total = base.groupBy(loc.alias("location")).agg(
        F.sum("CVAamount").alias("CVAamount")
    )
    usa = (
        base.filter(F.col(f"`{source_org_col}`").isin(usa_source_orgs))
        .groupBy(loc.alias("location"))
        .agg(F.sum("CVAamount").alias("CVAamount_USA"))
    )
    return (
        total.join(usa, "location", "full_outer")
        .fillna(0, subset=["CVAamount_USA"])
        .withColumn(
            "CVAamount_USA_pc",
            F.when(
                F.col("CVAamount") != 0,
                F.col("CVAamount_USA") / F.col("CVAamount"),
            ),
        )
        .orderBy("location")
        .withColumnRenamed("location", location_col)
    )


def cva_by_location(
    cva: DataFrame,
    location_col: str = "destinationObjects_Location.name",
) -> DataFrame:
    """EP3 sample-analysis slice — CVA by destination location
    (code/11_refresh_2024_sample_analysis.R:44-89): positive-finite filter
    (F7, code/09:89) → per-location sum in millions (A6, code/11:62-67) →
    deterministic ordering (code/11:86)."""
    amt = F.col("CVAamount")
    return (
        cva.filter((amt > 0) & ~F.isnan(amt) & (amt < float("inf")))
        .groupBy(F.col(f"`{location_col}`").alias("location"))
        .agg(
            F.count("*").alias("n_flows"),
            F.round(
                F.sum(amt.cast("decimal(27,6)")).cast("double") / 1e6, 6
            ).alias("cva_usd_m"),
        )
        .orderBy("location")
    )
