"""Round-14 wave properties: weighted HITS degenerates to HITS on a
simple graph, the gate sweep is monotone, the script census conserves
docs, and the MAD profile agrees with a python reference."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hits_weighted_equals_hits_on_simple_graph(spark):
    """On a graph with NO parallel edges every weight is 1, so weighted
    HITS must reproduce hits() bit-for-bit (same decimal rounds, same
    normalization)."""
    from calp_cva_tracking_pipeline_spark.operators.graph import (
        hits,
        hits_weighted,
    )

    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 11) for i in range(11)] + [(2, 5), (7, 1)],
        "src long, dst long",
    )
    a = [tuple(r) for r in hits(e).collect()]
    b = [tuple(r) for r in hits_weighted(e).collect()]
    assert a == b


def test_hits_weighted_multiplicity_shifts_authority(spark):
    """Duplicating one edge 5x must strictly raise the authority of its
    destination relative to the unweighted run — the semantics hits()'s
    docstring declares out of scope."""
    from calp_cva_tracking_pipeline_spark.operators.graph import (
        hits_weighted,
    )

    base = [(1, 2), (1, 3), (4, 2), (4, 3), (2, 4)]
    flat = spark.createDataFrame(base, "src long, dst long")
    heavy = spark.createDataFrame(
        base + [(1, 3)] * 5, "src long, dst long"
    )
    a_flat = {r.node: r.auth_nano for r in hits_weighted(flat).collect()}
    a_heavy = {r.node: r.auth_nano for r in hits_weighted(heavy).collect()}
    assert a_heavy[3] > a_flat[3]


def test_gate_sweep_monotone_and_conserving(spark, sf_dir):
    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        gate_threshold_sweep,
    )

    rows = gate_threshold_sweep(
        T(spark, sf_dir, "documents")
    ).collect()
    assert rows, "sweep produced no thresholds"
    n_total = {r.n_total for r in rows}
    assert len(n_total) == 1, "n_total must be threshold-invariant"
    kept = [r.n_kept for r in rows]  # ordered by min_quality asc
    assert kept == sorted(kept, reverse=True), "kept must be monotone"
    toks = [r.kept_tokens for r in rows]
    assert toks == sorted(toks, reverse=True)
    assert all(0 <= r.kept_ppm <= 1_000_000 for r in rows)


def test_script_mix_census_conserves_and_flags(spark):
    from calp_cva_tracking_pipeline_spark.operators.textops import (
        script_mix_census,
    )

    docs = spark.createDataFrame(
        [
            ("a", "plain ascii text here"),
            ("a", "сmеshed homоglyph tеxt"),  # cyrillic о/е smuggled in
            ("a", "文档 质量 审核 报告"),
            ("a", None),
            ("b", "1234 !!! ---"),
        ],
        "source string, text string",
    )
    rows = {r.source: r for r in script_mix_census(docs).collect()}
    a = rows["a"]
    assert (
        a.n_latin_dom + a.n_cyrillic_dom + a.n_han_dom + a.n_noscript
        == a.n_docs
        == 4
    )
    assert a.n_han_dom == 1
    assert a.n_homoglyph >= 1
    assert a.n_mixed >= 1
    b = rows["b"]
    assert b.n_noscript == 1 and b.n_mixed == 0


def test_mad_profile_matches_python_reference(spark):
    import statistics

    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        mad_profile,
    )

    vals = [float(v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = mad_profile(df, ["x"], k=3).collect()[0]
    med = statistics.median(vals)
    mad = statistics.median(sorted(abs(v - med) for v in vals))
    assert row.median == round(med, 6)
    assert row.mad == round(mad, 6)
    assert row.n_outliers == sum(
        1 for v in vals if abs(v - med) > 3 * mad
    )
    assert row.n == len(vals)
