"""The COVERAGE map must stay total and truthful: every SURVEY.md §2
operator id maps to a covering artifact, every referenced catalog query
exists in the driver-facing catalog, every referenced test file exists,
and the first 50 catalog entries (the external driver's correctness
gate) stay a frozen, fully-oracled prefix — extras append after it and
are verified by the local parity suite instead."""

from __future__ import annotations

import re
from pathlib import Path

import __spark_entry__ as entrymod
from calp_cva_tracking_pipeline_spark.catalog.relational import COVERAGE

SURVEY_IDS = (
    [f"S{i}" for i in range(1, 14)]
    + [f"F{i}" for i in range(1, 13)]
    + [f"D{i}" for i in range(1, 5)]
    + [f"J{i}" for i in range(1, 16)]
    + [f"A{i}" for i in range(1, 11)]
    + [f"W{i}" for i in range(1, 6)]
    + [f"X{i}" for i in range(1, 8)]
    + [f"SO{i}" for i in range(1, 4)]
    + [f"C{i}" for i in range(1, 13)]
    + [f"CC{i}" for i in range(1, 7)]
    + [f"M{i}" for i in range(1, 5)]
    + ["EP1", "EP2", "EP3"]
)

REPO = Path(__file__).resolve().parent.parent


def test_every_survey_operator_is_covered():
    missing = [op for op in SURVEY_IDS if op not in COVERAGE]
    assert not missing, f"SURVEY §2 ids missing from COVERAGE: {missing}"


def test_coverage_references_exist():
    queries = set(entrymod.queries())
    for op, ref in COVERAGE.items():
        if "out of engine scope" in ref:
            continue
        tests = re.findall(r"tests/\w+\.py", ref)
        names = re.findall(r"\b[a-z][a-z0-9]*(?:_[a-z0-9]+)+\b", ref)
        qhits = [n for n in names if n in queries]
        plan_hits = re.findall(r"plans\.\w+", ref)
        assert qhits or tests or plan_hits, f"{op}: dangling reference {ref!r}"
        for t in tests:
            assert (REPO / t).exists(), f"{op}: missing test file {t}"


def test_no_unreferenced_query_definitions():
    """Every public (spark, sf_dir) query def and every public *_SQL oracle
    string in the catalog modules must be registered — dead catalog code
    (like round 2's orphaned cc5_multi_collapse/CC5_SQL) fails here."""
    import inspect

    import calp_cva_tracking_pipeline_spark.catalog.relational as R
    import calp_cva_tracking_pipeline_spark.catalog.scale as S
    from calp_cva_tracking_pipeline_spark.catalog import ALL_QUERIES

    registered_fns = {spec[0] for spec in ALL_QUERIES.values()}
    registered_sql = {spec[1] for spec in ALL_QUERIES.values()}
    for mod in (R, S):
        for name, obj in vars(mod).items():
            if name.startswith("_"):
                continue
            if (
                inspect.isfunction(obj)
                and obj.__module__ == mod.__name__
                and list(inspect.signature(obj).parameters) == ["spark", "sf_dir"]
            ):
                assert obj in registered_fns, (
                    f"unregistered query def {mod.__name__}.{name}"
                )
            if isinstance(obj, str) and name.endswith("_SQL"):
                assert obj in registered_sql, (
                    f"unregistered oracle SQL {mod.__name__}.{name}"
                )


# Queries whose result is an algorithmic assignment with no SQL
# formulation — the ONLY ones allowed to ship without an oracle twin
# (rows-only checks; their invariants are pinned by dedicated tests).
NON_SQL_QUERIES = {"pk_sequences"}


def test_driver_gate_is_first_fifty_fully_oracled():
    """The external driver's correctness gate reads exactly the first 50
    queries() entries. Those 50 must stay a stable, fully-oracled set —
    a reordering would silently swap which queries get driver rows.
    Entries beyond 50 are allowed (verified by the local parity suite at
    every sf instead) but must keep the gate prefix intact."""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    gate = qs[:50]
    # the gate has ended at st_sessionize since round 3; new entries may
    # only APPEND past it
    assert gate[-1] == "st_sessionize", (
        f"driver-gate prefix changed: 50th entry is {gate[-1]!r} — "
        "appending new queries is fine, reordering the first 50 is not"
    )
    missing = [n for n in gate if n not in oracles]
    assert not missing, f"gate queries without oracle twins: {missing}"
    extras = qs[50:]
    no_oracle = [
        n for n in extras if n not in oracles and n not in NON_SQL_QUERIES
    ]
    assert not no_oracle, (
        f"extra queries must carry oracles or be declared in "
        f"NON_SQL_QUERIES: {no_oracle}"
    )


def test_scale_tier_table_references_exist():
    """SURVEY §2.13 declares the engine-added scale tier; every catalog
    query it names must exist, and every named test file must exist —
    the same no-dangling-claims rule the §2 COVERAGE map lives under."""
    queries = set(entrymod.queries())
    text = (REPO / "SURVEY.md").read_text()
    start = text.index("### 2.13")
    section = text[start : text.index("## 3.", start)]
    rows = [
        line
        for line in section.splitlines()
        if line.startswith("| T")
    ]
    assert len(rows) >= 20
    for line in rows:
        for q in re.findall(r"`([a-z][a-z0-9_]+)`", line.split("|")[4]):
            if q.endswith(".py"):
                continue
            assert q in queries, f"§2.13 dangling catalog query {q!r}"
        for t in re.findall(r"test_\w+\.py", line):
            assert (REPO / "tests" / t).exists(), f"§2.13 missing {t}"
