"""Round-12 advisor-flagged edge cases, pinned as regressions.

Round-11 advisor findings (ADVICE.md):
1. dp_noisy_counts shipped md5-derived deterministic "noise" with a
   default seed under a differential-privacy name — by default anyone
   could recompute and subtract the noise, so the release provided
   zero privacy. Fixed: the DEFAULT noise source is now unseeded
   ``F.rand()`` (non-replayable); the md5 path requires an explicit
   keyword-only ``deterministic_noise=True`` opt-in (the path the
   catalog/oracle use so the mechanism stays verifiable). Pinned:
   default releases differ run-to-run; opt-in releases replay exactly.
2. pagerank's sentinel dangling-mass formulation (one-round lag vs
   classic PageRank for n_iter >= 2) must stay documented where bench
   consumers see it — pinned: bench detail carries a variant_notes
   entry naming gr_pagerank.
3. bench heavy tier took 5 timed rounds, leaving 4 warm runs after the
   cold discard — warm[len//2] on an even list picks the upper-middle
   value (slight upward bias) while comments said "median-of-5".
   Fixed: 6 timed heavy rounds so 5 warm runs remain. Pinned on the
   bench source (the run protocol itself runs only in the isolated
   bench process).
4. matryoshka_recall with an empty prefix_dims list raised IndexError
   at parts[0]. Fixed: ValueError("prefix_dims must be non-empty") up
   front, matching the snippet_extract guard style.
5. mmr_rerank did not filter NULL rel_micro / NULL id rows; int(NaN)
   inside the applyInPandas worker crashed the whole query. Fixed:
   NULL id / rel_micro rows are dropped by contract before the
   groupBy (NULL token sets remain legal — they score as empty sets).
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

# r16: catalog-wide sweep / historical-pin tier — excluded from the
# driver's default run (see pytest.ini); run with -m exhaustive.
pytestmark = pytest.mark.exhaustive


# ---------------------------------------------------------------------------
# 1. dp_noisy_counts: real randomness by default, replay only on opt-in.
# ---------------------------------------------------------------------------


def _dp_release(spark, **kw):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [("a", i) for i in range(40)] + [("b", i) for i in range(25)],
        "grp string, v int",
    )
    rows = dp_noisy_counts(df, ["grp"], epsilon_milli=1000, **kw).collect()
    return {r.grp: r.noisy_count for r in rows}


def test_dp_default_noise_is_not_replayable(spark):
    a = _dp_release(spark)
    b = _dp_release(spark)
    # unseeded rand(): two releases of the same data draw fresh noise.
    # P(all groups identical across runs) is ~0 for a continuous draw.
    assert a != b
    # ...but the noise is still CENTERED noise, not garbage: counts stay
    # within the 1e-9-clamped Laplace tail bound |z| <= ln(1e9)/eps.
    for grp, true_n in (("a", 40), ("b", 25)):
        assert abs(a[grp] - true_n) <= 21.0


def test_dp_deterministic_opt_in_replays_exactly(spark):
    a = _dp_release(spark, seed=42, deterministic_noise=True)
    b = _dp_release(spark, seed=42, deterministic_noise=True)
    assert a == b
    c = _dp_release(spark, seed=43, deterministic_noise=True)
    assert a != c  # seed participates in the hash key


def test_dp_deterministic_is_keyword_only(spark):
    from calp_cva_tracking_pipeline_spark.operators.profiling import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame([("a", 1)], "grp string, v int")
    with pytest.raises(TypeError):
        dp_noisy_counts(df, ["grp"], 1000, 42, True)  # noqa: FBT003


# ---------------------------------------------------------------------------
# 2. pagerank variant note is published in the bench detail.
# ---------------------------------------------------------------------------


def test_bench_detail_carries_pagerank_variant_note():
    src = open("/root/repo/bench.py").read()
    assert "variant_notes" in src
    assert "gr_pagerank" in src and "ONE-ROUND LAG" in src


# ---------------------------------------------------------------------------
# 3. heavy tier runs 6 timed rounds -> 5 warm runs -> true median.
# ---------------------------------------------------------------------------


def test_bench_heavy_tier_has_odd_warm_run_count():
    src = open("/root/repo/bench.py").read()
    m = re.search(r"range\((\d+) if heavy else (\d+)\)", src)
    assert m, "heavy-tier run loop not found"
    heavy_extra, light_extra = int(m.group(1)), int(m.group(2))
    # heavy: 1 first-timed + extra runs, minus warm-up (runs[0]) and
    # cold (runs[1]) -> warm count must be odd for a true median
    assert (1 + heavy_extra - 2) % 2 == 1
    assert (1 + light_extra - 1) % 2 == 1
    assert "median-of-5" not in src  # stale comment removed


# ---------------------------------------------------------------------------
# 4. matryoshka_recall guards empty prefix_dims.
# ---------------------------------------------------------------------------


def test_matryoshka_empty_prefix_dims_raises_value_error(spark):
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        matryoshka_recall,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "id long, vec array<double>"
    )
    q = spark.createDataFrame([(10, [1.0, 0.1])], "qid long, qv array<double>")
    with pytest.raises(ValueError, match="prefix_dims must be non-empty"):
        matryoshka_recall(emb, q, "id", "vec", "qid", "qv", [], k=1)


# ---------------------------------------------------------------------------
# 5. mmr_rerank drops NULL id / rel_micro rows instead of crashing.
# ---------------------------------------------------------------------------


def test_mmr_rerank_null_rel_and_id_rows_dropped(spark):
    from calp_cva_tracking_pipeline_spark.operators.retrieval import (
        mmr_rerank,
    )

    df = spark.createDataFrame(
        [
            ("q1", 1, 900000, ["a", "b"]),
            ("q1", 2, None, ["a", "b"]),      # NULL relevance: dropped
            ("q1", None, 800000, ["c"]),       # NULL id: dropped
            ("q1", 3, 700000, None),           # NULL toks: legal, empty set
            ("q2", 4, None, ["z"]),            # whole query goes NULL-only
        ],
        "query string, id long, rel_micro long, toks array<string>",
    )
    out = mmr_rerank(df, "query", "id", "rel_micro", "toks", k=3).collect()
    got = [(r.query, r.id, r.mmr_rank) for r in out]
    # q1 keeps ids 1 and 3 (rank by MMR objective); q2 vanishes entirely
    assert got == [("q1", 1, 1), ("q1", 3, 2)]
    assert all(r.rel_micro is not None for r in out)
