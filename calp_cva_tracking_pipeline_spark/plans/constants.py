"""The reference's curated domain constants, verbatim, so the plans are
drop-in runnable without re-deriving them.

Sources (public reference repo):
- CASH_KEYWORDS / CASH_ACRONYMS: code/08_fts_keyword_searching_cash.R:53-90.
  The regex built from them lowercases everything and matches
  case-insensitively (code/08:92-96,131) — the acronym list is
  case-sensitive *in intent* but lowercased in practice; SURVEY §2.9 C1
  mandates reproducing the code behavior.
- CASH_CLUSTERS: code/08:99-119 (19 cluster names).
- COMMON_WORDS_PATTERN terms: code/09:50.
- USA_SOURCE_ORGS: code/11:47-51.
- MANUAL_ORG_OVERRIDES / MANUAL_ORG_PATTERN_OVERRIDES: code/10:226-285
  (hand-curated match fixes; two rules are regex-based in the reference).
- FUZZY_VETO: code/10:158 ('drc' must not fuzzy-match 'nrc').
"""

from __future__ import annotations

CASH_KEYWORDS = [
    "cash", "voucher", "cash transfer", "cash grant", "unconditional cash",
    "money", "conditional cash transfer", "argent", "monetaires", "bons",
    "espèces", "monnaie", "monétaires", "monétaire", "tokens", "coupons",
    "cupones", "public works programme", "social assistance",
    "social safety net", "social transfer", "social protection",
]

CASH_ACRONYMS = [
    "CCT", "UCT", "CTP", "CFW", "CFA", "SSN", "ESSN", "MPC", "MPCT", "CVA",
]

# code/08:92-96: everything lowercased into one (?i) word-boundary
# alternation — pass to functions.text.keyword_flag
ALL_CASH_TERMS = [k.lower() for k in CASH_KEYWORDS] + [
    a.lower() for a in CASH_ACRONYMS
]

CASH_CLUSTERS = [
    "Basic Needs / Multi-Purpose Cash",
    "Cash à usage multiple",
    "Multi Purpose Cash",
    "Multi-cluster/Multi-Purpose Cash",
    "Multi-Purpose Cash & Social Protection",
    "Multipurpose Cash Assistance (MPC)",
    "Multi-Purpose Cash Assistance (MPCA)",
    "Multipurpose cash/ IDPs/ multisector",
    "Multi-sector Cash/Social Protection COVID-19",
    "Cash",
    "Multi-purpose Cash",
    "Multipurpose cash assistance",
    "Multi-Purpose Cash Assistance",
    "Multipurpose Cash Assistance COVID-19",
    "Multi-Purpose Cash Assistance COVID-19",
    "Multi-purpose Cash COVID-19",
    "Multipurpose cash",
    "Protection: Multi-Purpose Cash Assistance",
    "Cash Transfer COVID-19",
]

COMMON_WORDS = ["cash", "voucher", "vouchers", "cva", "coupon"]

USA_SOURCE_ORGS = [
    "United States of America, Government of",
    "United States Department of State",
    "United States Agency for International Development",
]

_UNRWA = (
    "united nations relief and works agency for palestine refugees"
    " in the near east"
)

# exact canonical-name overrides (code/10:226-285)
MANUAL_ORG_OVERRIDES = [
    ("care bangladesh", "care international"),
    ("wfp", "world food programme"),
    ("save the childrensave the children", "save the children"),
    ("wvi", "world vision international"),
    ("acf", "action against hunger"),
    ("action contre la faim espagne", "action against hunger"),
    ("cww", "concern worldwide"),
    ("dan church aid", "dca"),
    ("drc", "danish refugee council"),
    ("norwegian refugee council", "nrc"),
    ("pin", "people in need"),
    ("unrwa", _UNRWA),
    ("unrwa united nations relief and wor", _UNRWA),
    ("the united nations relief and works", _UNRWA),
    ("united nations children s fund", "unicef"),
    ("plan malawi", "plan international"),
    ("adra romania", "adventist development and relief agency"),
    ("somali cash consortium", "concern worldwide"),
]

# regex-based overrides (reference grepl rules, code/10:239-241,280-282)
MANUAL_ORG_PATTERN_OVERRIDES = [
    ("world vision|vision mund", "world vision international"),
    ("red (cross|crescent)", "red cross and red crescent movement"),
]

FUZZY_VETO = ["drc"]
