"""Conditional-update cascades (SURVEY.md §2.10).

The reference's most distinctive operator: ordered, mutually-overwriting
conditional assignments (CC1-CC3). In an eager engine those are sequential
in-place updates; under lazy evaluation they must compile to ONE
deterministic expression per column. ``when_cascade`` does that: rules are
given in application order (later rules override earlier ones), and the
builder emits a single when/otherwise chain checking the LAST rule first —
exactly equivalent to sequential overwrites as long as conditions reference
only input columns (the CC3 "remaining == 0" guards are encoded by callers
as explicit negations of prior-rule predicates).

Single-projection, no shuffle, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def when_cascade(init: Column, rules: list[tuple[Column, Column]]) -> Column:
    """Sequential-overwrite semantics as one expression.

    ``rules`` in application order; row value = value of the LAST rule whose
    condition holds, else ``init``.
    """
    expr = None
    for cond, value in reversed(rules):
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return init if expr is None else expr.otherwise(init)


# --- CC1: sector/method/cluster relevance ---------------------------------
# Reference: code/08_fts_keyword_searching_cash.R:121-128. The subtle rule:
# a multi-cluster list *containing* a cash cluster downgrades Full → Partial
# (the last rule overrides).

CASH_METHOD = "Cash transfer programming (CTP)"


def sector_method_cluster_relevance(
    method: Column, cluster: Column, cash_clusters: list[str]
) -> Column:
    exact_cash = cluster.isin(cash_clusters)
    multi = cluster.contains(";")
    contains_cash = F.lit(False)
    for c in cash_clusters:
        contains_cash = contains_cash | cluster.contains(c)
    return when_cascade(
        F.lit("None"),
        [
            (method == CASH_METHOD, F.lit("Full")),
            (exact_cash, F.lit("Full")),
            (multi & contains_cash, F.lit("Partial")),
        ],
    )


# --- CC3: CVA amount cascade ----------------------------------------------
# Reference: code/09_calculate_cva.R:29-54,84-86. Each later rule fires only
# where all earlier rules left the amount at 0 — encoded as accumulated
# negations so the chain stays a single expression.


def cva_amount_cascade(
    relevance: Column,
    amount: Column,
    cluster_count: Column,
    pct: Column,
    confidence: Column,
    common_words: Column,
    manual_accept: Column,
) -> tuple[Column, Column]:
    """Returns (CVAamount, CVAamount_type) columns."""
    r_full = relevance == "Full"
    r_partial = relevance == "Partial"
    taken = r_full | r_partial
    pct_rule = ~taken & pct.isNotNull() & (pct > 0)
    taken2 = taken | pct_rule
    ml_rule = ~taken2 & (confidence >= 0.8) & common_words
    taken3 = taken2 | ml_rule
    manual_rule = ~taken3 & manual_accept

    amount_col = when_cascade(
        F.lit(0.0),
        [
            (r_full, amount),
            (r_partial, amount / cluster_count),
            (pct_rule, amount * pct),
            (ml_rule, amount),
            (manual_rule, amount),
        ],
    )
    type_col = when_cascade(
        F.lit(""),
        [
            (r_full, F.lit("Sector, method, cluster")),
            (r_partial, F.lit("Partial cluster")),
            (pct_rule, F.lit("Project CVA percentage")),
            (ml_rule, F.lit("ML high predicted relevance")),
            (manual_rule, F.lit("Manual")),
        ],
    )
    return amount_col, type_col


def multi_destination_collapse(
    name: Column, iso3: Column
) -> tuple[Column, Column]:
    """CC5 — '; '-packed destination country → MULTI sentinel
    (code/04_fts_curated_flows.R:97-98)."""
    is_multi = name.contains(";")
    return (
        F.when(is_multi, F.lit("Multi-destination_org_country")).otherwise(name),
        F.when(is_multi, F.lit("MULTI")).otherwise(iso3),
    )
