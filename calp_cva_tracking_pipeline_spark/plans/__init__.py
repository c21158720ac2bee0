"""End-to-end pipeline builders (SURVEY.md §3 entry points).

Each builder composes the ``operators`` kernels into one lazy DataFrame DAG
mirroring a reference entry point — EP1 curate (scripts 01-05), EP2 classify
(06-09), EP3 global analysis (10-11) — with no intermediate file handoffs:
what the reference does as CSV-pause-resume (including the R→Python
classifier side trip) is a single Catalyst plan here.
"""

from calp_cva_tracking_pipeline_spark.plans.deflators import build_deflators
from calp_cva_tracking_pipeline_spark.plans.fx import (
    build_usd_exchange_rates,
)
from calp_cva_tracking_pipeline_spark.plans.matching import (
    match_org_names,
    subtract_subgrants,
)
from calp_cva_tracking_pipeline_spark.plans.pipelines import (
    classify_cva,
    curate_flows,
    cva_by_location,
    orgs_dimension,
    parse_project_qa,
    usa_comparison,
)
from calp_cva_tracking_pipeline_spark.plans.projects import (
    build_project_features,
    project_text,
)
from calp_cva_tracking_pipeline_spark.plans.schemas import CURATED_FLOWS_SCHEMA

__all__ = [
    "CURATED_FLOWS_SCHEMA",
    "build_deflators",
    "build_project_features",
    "build_usd_exchange_rates",
    "classify_cva",
    "curate_flows",
    "cva_by_location",
    "match_org_names",
    "orgs_dimension",
    "parse_project_qa",
    "project_text",
    "subtract_subgrants",
    "usa_comparison",
]
