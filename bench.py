#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line as the LAST stdout line:
  {"metric": "headline_suite_seconds", "value": <total sec at target sf>,
   "unit": "sec", "queries": {name: median sec, ...}, "sf": <sf>}

Everything else — per-run arrays, the sf0.01 sweep, scaling ratios, the
DuckDB-proxy self-audit — is written to BENCH_DETAIL.json next to this
file. Rounds 4-5 packed all of that into the single stdout line, which
outgrew the driver's ~4KB stdout tail window: the driver captured a
mid-line fragment and recorded "parsed": null two rounds running, so two
rounds of real speedups never reached the official record. The stdout
line must stay well under ~2KB; detail goes to the file.

The reported per-query number is the MEDIAN of 3 timed runs taken AFTER one
untimed warm-up run at the same SF (runs[0] in the persisted array — kept
visible, excluded from the median); queries whose warm-up run is >= 2s take
5 timed runs at the target SF (round-9: gr_triangles' 3-run spread of
4.3-10.8s swamped suite deltas), and the raw per-run arrays are persisted
in BENCH_DETAIL.json so a round-over-round delta can be attributed to noise
vs regression (round-3 verdict: a best-of-2 harness cannot distinguish them —
ann_ivf "+22%" and st_sessionize "+34%" were unanswerable without run
arrays; round-4 arrays then showed the first timed run +20-50% over the
median, motivating the explicit warm-up run).

Each query is timed end-to-end (plan + execute + NOOP-SINK write — every
output column computed, rows discarded), mirroring how the engine would be
driven in production. ROUND-13 METHODOLOGY BREAK: rounds 1-12 timed
.count(), under which Catalyst prunes aggregate expressions to the grouping
keys and eliminates joins feeding only pruned value columns — so
summary-shaped queries timed a SKELETON while the DuckDB proxy paid full
materialization (flagship_pricing_summary 0.2s under count() vs 1.5s real;
corpus_release_audit 0.66s vs 3.6s). Per-query numbers and suite totals are
therefore NOT comparable to r12 and earlier; the proxy side is unchanged,
so vs_proxy_suite is the honest cross-round metric from here on. Headliners
span the engine's main cost classes: scan+agg, broadcast join, window,
explode, cascade, MinHash dedup, ANN, sessionization, text featurization.

The suite runs at BOTH sf0.01 and the target SF: with 14 queries the sf0.1
totals are job-floor-dominated, so the per-query scaling ratio (10x data)
is the signal that plans stay linear — a ratio near 1 means overhead-bound,
near 10 means linear scan-bound, and >>10 means a plan that degrades
super-linearly and would not survive the next 100x.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from calp_cva_tracking_pipeline_spark.session import get_spark

HEADLINE = [
    "flagship_pricing_summary",
    "j2_broadcast_enrich",
    "a3_group_sum_millions",
    "d1_priority_dedup",
    "w1_cumprod",
    "x1_equal_split_explode",
    "cc3_amount_cascade",
    "j10_fuzzy_levenshtein",
    "ep2_cva_by_location",
    "dd_minhash_lsh",
    "ann_brute_topk",
    "ann_ivf_topk",
    "ann_ivf_search",
    "tx_features",
    "st_sessionize",
    # round 5 additions (suite totals are not comparable to r4 without
    # subtracting these): temporal as-of join, benchmark decontamination,
    # continuous-aggregate rollup cascade
    "tj_asof_join",
    "dd_decontam",
    "rt_rollup_hierarchy",
    # round 6 additions (ditto for r5 totals), each a distinct cost class:
    # explode + count-distinct vocab agg, single-pass profiling with
    # percentile buffering, per-dimension embedding stats
    "tx_vocab",
    "pf_profile",
    "emb_dim_stats",
    # round 6 late additions (ditto for earlier totals), new cost classes:
    # MG-sketch + broadcast-semi verify, corpus-LM train+score (reused
    # bigram exchange), span-hash bucketed pair expansion, two-retriever
    # fusion
    "pf_heavy_hitters",
    "tx_lm_score",
    "dd_passage_overlap",
    "rt_hybrid_rrf",
    # round 6 final additions (ditto for earlier totals), new cost
    # classes: within-cell self-join semantic dedup, two-phase CDF
    # windows for the KS sup-gap
    "dd_semantic",
    "pf_ks",
    # round 6 fourth-wave additions (ditto), new cost classes: window-
    # only SCD2 run collapse, pure-bit-arithmetic layout agg, iterative
    # keyed join/agg (PageRank), degree-oriented wedge self-join
    "cdc_scd2",
    "lx_zorder",
    "gr_pagerank",
    "gr_triangles",
    # round 7 additions (suite totals are not comparable to r6 without
    # subtracting these), the wave-7/8 cost classes: tie-safe RANGE-frame
    # rolling window, zero-window OHLC hash agg, per-key applyInPandas
    # integer recurrence, blocked pandas-UDF pair-kernel join (skew cap
    # live), posting-list build with WindowGroupLimit rank cut
    "tj_rolling_window",
    "rt_ohlc",
    "ts_ewma",
    "jx_jaro_join",
    "rt_posting_lists",
    # round 7 wave-9/12 additions (ditto), each a distinct cost class:
    # session-collapse path mining over a WindowGroupLimit cut, shingle
    # first-occurrence attribution join, HLL register-grid sliding
    # window, within-cell kNN self-join + rank cut
    "ev_paths",
    "tx_novelty",
    "ev_sliding_distinct",
    "emb_knn_graph",
    # round 8 additions (suite totals are not comparable to r7 without
    # subtracting these), the four cost classes the r7 verdict flagged
    # as still-untimed: RANGE-window integer-stat anomaly scan, CMS
    # register-grid sketch aggregation, iterative decimal-exact Lloyd
    # refinement, scan-speed JSON field promotion
    "ev_anomaly",
    "pf_cms",
    "emb_kmeans",
    "ev_json_stats",
    # round 9 additions (suite totals are not comparable to r8 without
    # subtracting these), the new cost classes: real-codec pandas decode
    # + hamming-block pair join (image), real-codec decode + fingerprint
    # hash agg (audio), stacked-lead n-gram window, rank-window integer
    # Gini, 4-stage broadcast-NL matcher waterfall. gr_neighbor_sim is
    # deliberately NOT a headliner: its wedge volume is the SAME cost
    # class gr_triangles already times, and on the dense sf0.1
    # co-purchase graph both engines pay tens of seconds — a suite-
    # ballooning duplicate measurement (documented, not hidden).
    "mm_phash_neardup",
    "mm_audio_dedup",
    "ev_motifs",
    "pf_gini",
    "ep3_org_match",
    "ep3_global_agg",
    # round 9 wave-22 additions (suite totals are not comparable without
    # subtracting these), new cost classes: winnowed-fingerprint window-
    # min + bucket pair expansion (the sampled counterpart of
    # dd_passage_overlap), explode + triple-reused-exchange divergence
    # aggregation, full per-group sort with order-statistic cuts.
    # pf_kappa/ev_survival/ts_seasonal/rt_eval_metrics are deliberately
    # NOT headliners: tiny-cardinality aggregates (<=20 output rows over
    # already-timed scan/agg shapes) or cost classes ann_brute_topk
    # already times.
    "dd_winnow",
    "tx_jsd",
    "pf_winsorize",
    # round 9 wave-23/25 additions (ditto), new cost classes: B=32
    # per-row hash-replica aggregation (bootstrap), bin-explode range
    # join. ts_holt (applyInPandas recurrence — ts_ewma's class),
    # pf_mannwhitney (value-grid window — pf_ks's class) and the
    # centroid/kmeans eval pair (emb_kmeans's class) are deliberately
    # not duplicated.
    "pf_bootstrap",
    "tj_range_join",
    # round 10 additions (suite totals are not comparable to r9 without
    # subtracting these), the two genuinely new cost classes: span
    # explode + GLOBAL-document-frequency window (boilerplate), and
    # per-position ROWS rolling hit count + scan-rooted snippet
    # re-slice join. mm_image_stats/mm_audio_stats (mm_phash's decode
    # class), pf_mutual_info/pf_anova/mx_* (small aggregates over
    # already-timed shapes) and ann_recall_eval (a composition of two
    # timed ANN headliners) are deliberately not duplicated.
    "tx_boilerplate_spans",
    "rt_snippet_extract",
    # round 11 additions (suite totals are not comparable to r10 without
    # subtracting these), the two genuinely new cost classes: the
    # shared-lineage four-corner release composition (card + per-source
    # profile off ONE cell exchange + JSD + leakage kernels over the
    # same scan), and cross-doc gram-hash span merging (count + join-back
    # + gaps-and-islands). mm_video_neardup (mm_frame_dedup's decode
    # class), rt_mmr/ann_mrl_eval/pf_ldiversity/ts_twap/ev_lag_features
    # (small aggregates or already-timed brute/window shapes) are
    # deliberately not duplicated.
    "pf_release_report",
    "dd_substring_spans",
    # round 12 additions (suite totals are not comparable to r11 without
    # subtracting these), three genuinely new cost classes: the
    # SERVING-path k-NN graph on prebuilt centroids (VERDICT r11 ask #3
    # — emb_knn_graph keeps timing the cold build+search fusion; this
    # times the steady-state reload path a 100 TB deployment actually
    # runs), the four-tier duplicate census (shared digest-cell
    # exchange + two checkpoint-cut bucketed pair tiers in ONE
    # composition), and the sign-bit hamming scan (integer bit_count
    # XOR ranking — the binary-embedding memory-bandwidth class no
    # float tier times). ann_nprobe_frontier (3× the timed IVF class),
    # wave-45's window/cell audits (already-timed shapes) and the
    # bounded lsh-recall eval are deliberately not duplicated.
    "emb_knn_graph_serve",
    "dd_dup_census",
    "emb_sign_hamming",
    # round 12 waves 47-54 additions (ditto), two genuinely new cost
    # classes: real-WAV decode + posexplode + gaps-and-islands VAD
    # segmentation (the per-frame Python→JVM boundary no other audio
    # headliner crosses), and the chunk-explode + global-digest-window
    # dedup census (chunk-grain row amplification the span auditors
    # don't time). gr_squares (gr_triangles' wedge class at ~20x the
    # volume — a suite-ballooning duplicate), the tile/conversion/
    # stickiness/backtest audits (small aggregates over timed shapes)
    # and dd_lsh_tuner (3x the timed LSH class on a bounded slice) are
    # deliberately not duplicated.
    "mm_audio_vad",
    "dd_chunk_dedup",
    # round 13 additions (suite totals are not comparable to r12 without
    # subtracting these), two genuinely new cost classes: the FULL T18
    # curation composition (gates → exact dedup → banding → Jaccard
    # verify → per-source reduce in ONE query — no other headliner
    # times the end-to-end recipe) and the graph-ANN serving frontier
    # (hop-join beam expansion over the k-NN graph — a bounded-join
    # serving class beside the build-path headliners). dd_norm_unicode
    # (the timed digest-groupBy class + a translate), pf_calibration /
    # mx_kfold / ev_sprt / lx_partition_advisor (small counters over
    # timed shapes) are deliberately not duplicated.
    "corpus_release_audit",
    "ann_graph_frontier",
    # round 14 adds NO headliners by the established not-duplicated
    # rule: tx_gate_sweep / pf_fdr (small aggregates over timed
    # scan+agg shapes), tx_script_mix (tx_features' regex-ratio class),
    # tx_templates (dd_norm_exact's digest-census class), pf_mad
    # (pf_profile's percentile-kernel class run twice), and
    # gr_hits_weighted (gr_hits' weighted sibling — same 2-joins/round
    # class, already timed via gr_pagerank/gr_hits).
    # round 15 likewise adds NO headliners: gr_pagerank_weighted
    # (gr_pagerank's 2-exchanges/round class with a weight column),
    # pf_mad_by / pf_group_quantiles (the grouped percentile kernel —
    # pf_profile's class over grouped keys), ev_cuped (two keyed
    # aggregations of bounded moments), cdc_release_diff (the digest
    # union+groupBy class dd_norm_exact/dd_dup_census already time).
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="calp-cva-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["flagship_pricing_summary"] = _flagship
    qs["ann_ivf_search"] = _ivf_search_prebuilt
    qs["emb_knn_graph_serve"] = _knn_graph_serve

    # Steady-state warmup: run the suite once at the smallest SF so plan
    # compilation, whole-stage-codegen JIT, the Python worker pool, and the
    # broadcast machinery are all warm. The bench measures sustained
    # throughput — the metric that scales to a long-lived cluster — not
    # single-query JVM cold-start (which at sf0.1 dwarfs the actual work:
    # ep2 is ~9s cold and ~3s warm on identical data).
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm_dir = os.environ.get(
        "SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"
    )
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).count()
            except Exception as exc:  # warmup must never fail the bench
                print(f"# warmup {name}: {exc}", file=sys.stderr)

    # One UNTIMED warm-up run per query at the measured SF, then
    # median-of-3: run arrays across rounds showed the first timed run
    # +20-50% over the median (AQE stage re-planning, broadcast rebuild,
    # residual JIT) even after the small-SF warm-up suite — which left
    # round-over-round medians hostage to where that residual landed. The
    # warm-up run is reported in the JSON (runs[0], excluded from the
    # median) so cold cost stays visible without polluting the
    # steady-state metric.
    # Heavy queries (>= HEAVY_CUTOFF_S on their warm-up run) take 6 timed
    # runs instead of 3: the round-9 verdict found gr_triangles' timed
    # runs spreading 4.3-10.8s, which swamped round-over-round suite
    # deltas — after discarding the cold round, a median over the 5
    # remaining warm runs pulls the published number back inside a
    # +-20% band of the true median (GC/stage-scheduling noise scales
    # with query weight, so only the heavy tier pays the extra runs).
    # Round 12 (advisor): the heavy tier previously ran 5 timed rounds,
    # leaving 4 warm after the cold discard — an even list whose
    # upper-middle pick biased slightly high; one more timed round makes
    # the warm count odd so warm[len//2] is the true median again.
    # Round 11 (VERDICT r10 ask #7): the heavy tier ALSO discards its
    # FIRST timed round from the median — r10's run arrays showed it
    # still carrying residual cold cost (gr_triangles 4.89s vs a
    # 3.31-3.92 warm band, gr_pagerank 3.52 vs ~2.2) even after the
    # untimed warm-up. It is published separately as "cold" in
    # BENCH_DETAIL so the cost stays visible, and "spread" covers only
    # the warm runs the median is drawn from.
    HEAVY_CUTOFF_S = 2.0

    # Round 12 (VERDICT r11 ask #2): the DuckDB proxy runs INTERLEAVED
    # with each query's Spark runs in this same process, not as a
    # separate trailing loop. Round 11 showed the suite drifting
    # 37.95s -> 53.68s with zero code change on most regressed queries —
    # environment variance the old protocol could not attribute, because
    # the Spark and proxy measurements were taken minutes apart. With
    # per-round interleaving, whatever the box is doing (GC pressure,
    # thermal/cgroup throttling, page-cache state) hits both engines in
    # the same window, so the per-query RATIO in "interleaved_ratio" is
    # the round-over-round metric; the absolute times remain published
    # beside it. The proxy keeps its warm-up + median-of-3 protocol
    # (its 3 timed runs ride the first 3 Spark rounds; the heavy tier's
    # extra Spark rounds run after, Spark-only).
    def run_suite(
        run_dir: str,
        label: str,
        extra_heavy_runs: bool = False,
        proxy_con=None,
        oracles: dict[str, str] | None = None,
    ) -> tuple[
        dict[str, float],
        dict[str, list[float]],
        dict[str, float],
        dict[str, float],
        dict[str, list[float]],
    ]:
        timings: dict[str, float] = {}
        raw: dict[str, list[float]] = {}
        cold: dict[str, float] = {}
        proxy: dict[str, float] = {}
        proxy_runs: dict[str, list[float]] = {}
        # Timed action is a NOOP SINK write, not .count(): under count()
        # Catalyst prunes aggregate expressions to the grouping keys and
        # eliminates joins feeding only pruned value columns, so
        # summary-shaped queries (per-source audits, frontier curves)
        # timed a SKELETON while the DuckDB proxy paid full
        # materialization (round-13 catch: corpus_release_audit 0.66s
        # under count() vs 4.8s real). The noop sink executes the full
        # plan with every output column computed and discards rows —
        # the standard Spark benchmarking spelling, symmetric with the
        # proxy's fetchall(). Row counts for the log line come from one
        # untimed count after the timed runs.
        def run_full(fn):
            fn(spark, run_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        for name in HEADLINE:
            fn = qs[name]
            sql = (oracles or {}).get(name) if proxy_con is not None else None
            t0 = time.time()
            run_full(fn)
            runs = [round(time.time() - t0, 3)]
            heavy = extra_heavy_runs and runs[0] >= HEAVY_CUTOFF_S
            pruns: list[float] = []
            if sql:
                # proxy warm-up (excluded from its median, like runs[0])
                t0 = time.time()
                proxy_con.execute(sql).fetchall()
                pruns.append(round(time.time() - t0, 3))
            for _ in range(6 if heavy else 3):
                t0 = time.time()
                run_full(fn)
                runs.append(round(time.time() - t0, 3))
                if sql and len(pruns) < 4:
                    t0 = time.time()
                    proxy_con.execute(sql).fetchall()
                    pruns.append(round(time.time() - t0, 3))
            n = fn(spark, run_dir).count()  # untimed, for the log line
            raw[name] = runs
            if heavy:
                cold[name] = runs[1]
            warm = sorted(runs[2:] if heavy else runs[1:])
            timings[name] = warm[len(warm) // 2]
            if sql and len(pruns) == 4:
                proxy_runs[name] = pruns
                proxy[name] = sorted(pruns[1:])[1]
            print(
                f"# [{label}] {name}: {timings[name]}s ({n} rows; runs "
                f"{runs}"
                + (f"; proxy {pruns}" if pruns else "")
                + ")",
                file=sys.stderr,
            )
        return timings, raw, cold, proxy, proxy_runs

    small_dir = os.environ.get(
        "SPARK_GRAFT_SMALL_SF_DIR", "/root/testdata/sf0.01"
    )
    m2 = re.search(r"sf([0-9.]+)", small_dir)
    sf_small = float(m2.group(1)) if m2 else -1.0
    if os.path.isdir(small_dir):
        small, small_raw, _, _, _ = run_suite(small_dir, f"sf{sf_small}")
    else:
        small, small_raw = {}, {}

    # Self-audit vs the single-process DuckDB proxy (the judge's baseline
    # methodology): each headline query's oracle SQL over the same parquet,
    # interleaved run-for-run with the Spark side (see run_suite) so the
    # published ratios survive environment drift. Never fails the bench —
    # the proxy is context, the Spark timings are the product.
    proxy_con, proxy_err = None, None
    if os.environ.get("SPARK_GRAFT_BENCH_PROXY", "1") != "0":
        try:
            import duckdb

            proxy_con = duckdb.connect()
            for t in (
                "region nation customer supplier part orders lineitem "
                "events documents embeddings"
            ).split():
                proxy_con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')"
                )
        except Exception as exc:  # pragma: no cover
            proxy_err = str(exc)

    timings, raw, cold, proxy, proxy_runs = run_suite(
        sf_dir,
        f"sf{sf}",
        extra_heavy_runs=True,
        proxy_con=proxy_con,
        oracles=entrymod.oracle_sql() if proxy_con is not None else None,
    )
    ratios = {
        name: round(timings[name] / small[name], 2)
        for name in timings
        if small.get(name)
    }

    total = round(sum(timings.values()), 3)
    # Full detail to a file; the stdout line must stay parseable within the
    # driver's ~4KB tail window (see module docstring).
    detail = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "sf_small": sf_small,
        "queries_small": small,
        "scaling_ratio": ratios,
        "runs": raw,
        "runs_small": small_raw,
        # per-query spread of the WARM timed runs (warm-up runs[0]
        # excluded; for the heavy tier the first timed round — published
        # in "cold" — is excluded too): the permanent drift-vs-noise
        # separator the round-7 verdict asked for — a round-over-round
        # median delta inside the other round's [min, max] band is
        # noise, outside it is drift worth attributing.
        "spread": {
            n: (
                [min(r[2:]), max(r[2:])]
                if n in cold
                else [min(r[1:]), max(r[1:])]
            )
            for n, r in raw.items()
        },
        "spread_small": {
            n: [min(r[1:]), max(r[1:])] for n, r in small_raw.items()
        },
        # heavy-tier first timed rounds (residual cold cost, excluded
        # from the medians — VERDICT r10 ask #7)
        "cold": cold,
        # variant notes so cross-round output deltas are attributable
        # to documented semantics changes, not suspected bugs
        "variant_notes": [
            "gr_pagerank (r11+): dangling mass redistributes via a "
            "sentinel row with a ONE-ROUND LAG — diverges from classic "
            "same-round PageRank for n_iter >= 2; the oracle moved in "
            "lockstep, so rank deltas vs r10 outputs or external "
            "PageRank implementations are the variant, not a defect.",
            "emb_kmeans A/B (r15, VERDICT r14 ask #2): the all-"
            "DataFrame Lloyd loop (evolving centroid frame referenced "
            "2x/round: broadcast assign + rebuild join, crossJoin "
            "argmin + corpus re-join) read 2.1-3.2s warm at sf0.1 "
            "across sessions; the driver-resident-state rework (map-"
            "side literal argmin via one F.expr string, one (cell,dim) "
            "exchange/round, k*d-row collects) reads 1.5-1.9s with "
            "bit-identical output (parity at 3 SFs) — shipped as the "
            "ONLY path; no exact=False variant needed since the exact "
            "contract no longer costs the plan anything.",
        ],
    }
    if proxy:
        detail["proxy"] = proxy
        detail["proxy_runs"] = proxy_runs
        detail["proxy_protocol"] = (
            "interleaved per-round with spark (r12): proxy warm-up + "
            "median-of-3, each timed proxy run taken immediately after "
            "the same query's spark run in this process"
        )
        # THE round-over-round metric (VERDICT r11 ask #2): per-query
        # spark/proxy ratio from runs taken in the same time window —
        # environment drift cancels; a ratio move is a plan move.
        detail["interleaved_ratio"] = {
            n: round(timings[n] / proxy[n], 3)
            for n in proxy
            if timings.get(n) and proxy[n] > 0
        }
        detail["vs_proxy"] = {
            n: round(timings[n] / proxy[n], 2)
            for n in proxy
            if timings.get(n) and proxy[n] > 0
        }
        shared_spark = sum(timings[n] for n in proxy if n in timings)
        shared_proxy = sum(proxy.values())
        if shared_proxy > 0:
            detail["vs_proxy_suite"] = round(shared_spark / shared_proxy, 2)
        # self-gate (VERDICT r13 ask #8): the judge's weak criterion —
        # warm median >= 2s AND > 2x the interleaved proxy — emitted at
        # build time so a regression is caught here, not at judge time.
        # Schema pinned by tests/test_bench_contract.py.
        detail["perf_weak"] = perf_weak(timings, proxy)
    elif proxy_err:
        detail["proxy_error"] = proxy_err
    # Box-speed calibration (r15 verdict ask #7 / advice #4): single-core
    # md5 loop time, taken AFTER the timed suite so it cannot perturb the
    # measurements. Compare across rounds to separate box drift from plan
    # changes; the floor annotations' baselines are recorded against it
    # in plans/r16/floor_baselines.json.
    detail["calibration_md5_s"] = box_calibration()
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail, indent=1))
    print(f"# full detail (runs/scaling/proxy): {detail_path}", file=sys.stderr)

    print(format_stdout_line(timings, sf, detail.get("vs_proxy_suite")))


def box_calibration(n_rounds: int = 40000) -> float:
    """Fixed single-core calibration loop (r15 verdict ask #7): seconds
    to md5 a 4 KiB buffer ``n_rounds`` times, single-threaded. The
    sandbox's hosts vary ~2-2.5x in single-core speed session to
    session (r15: 38 of 66 "regressions" were box drift the round's
    comparisons could only rescue with an ad-hoc 8-core rerun); this
    number, emitted into BENCH_DETAIL.json each run, lets any two
    benches be normalized to the same box before a per-query delta is
    read as a plan change. Pure function — the contract test runs it
    without Spark."""
    import hashlib

    buf = bytes(range(256)) * 16  # 4 KiB, deterministic
    t0 = time.time()
    for _ in range(n_rounds):
        buf = hashlib.md5(buf).digest() * 256  # 4 KiB again
    return round(time.time() - t0, 4)


WEAK_WARM_S = 2.0
WEAK_RATIO = 2.0

# Documented floors (VERDICT r14 ask #4): queries whose weak-list entry
# is an ACCEPTED cost with a written-down scale argument, not an open
# defect. They still appear in perf_weak (the number is honest) but
# carry the floor so the list separates "fix me" from "priced in".
FLOOR_ANNOTATIONS = {
    "gr_pagerank": (
        "fixed-point floor: 2 exchanges x n_iter by construction "
        "(graph.py pagerank docstring); per-iteration cost amortizes "
        "at scale where the exchanges carry real volume, while the "
        "proxy replays the unrolled recurrence as one vectorized CTE"
    ),
    "emb_knn_graph": (
        "declared SemDeDup bound: within-IVF-cell self-join costs "
        "sum(cell^2); linear at 100 TB under the DEFAULT_CELL_SIZE "
        "cell-sizing contract (SCALE.md); the proxy pays the same "
        "pair volume without Spark's exchange/task floor"
    ),
    "pf_ks": (
        "exact value-grain sup statistic: every distinct value is a "
        "candidate argmax, so the floor is the one histogram-sized "
        "exchange + within-bucket ordered windows over ~1.2M value "
        "rows; the range pass went stack-free r15 (~8%) and the "
        "single-stacked-pass checkpoint fusion measured SLOWER "
        "(ks_drift docstring); residual gap is the exact contract vs "
        "the proxy's single-process vectorized window"
    ),
    "pf_release_report": (
        "sum of four corner kernels off one scan, each individually "
        "sub-weak (sf0.1 attribution: winnow leakage ~1.5s after the "
        "r15 compiled gram stage [-45% on the pair kernel], jsd ~0.6s, "
        "exact pairs + split joins ~0.5s, card/profile ~0.3s off one "
        "shared ReusedExchange); corners probe sub-linearly "
        "(alpha 0.37/0.48 class, SCALE.md)"
    ),
    # The next two cross the ABSOLUTE 2s bar only on slow-core sessions
    # (both ran 1.2-1.7s warm on r14-class boxes with the same plans and
    # in-class proxy ratios; this sandbox's hosts vary ~2-2.5x in
    # single-core speed session to session — OPTIMIZATION_r15.md). Their
    # structure is the documented scale-correct design, so the weak
    # entry is priced in rather than actionable:
    "ep2_cva_by_location": (
        "per-row regex/keyword cascade over the fact scan IS the "
        "operator (EP2 classification semantics): it runs pre-shuffle "
        "in whole-stage codegen off a size-capped spread scan, and the "
        "aggregation ships closed-domain 3-boolean partials (3 bits/"
        "group, never string bags) — parallelizes linearly with the "
        "scan at 100 TB; the proxy replays the same cascade in "
        "single-process RE2"
    ),
    "pf_bootstrap": (
        "one scan + one group-cardinality exchange; the per-row cost "
        "is the r14-prescribed design — ONE md5 fanned into B=32 "
        "Poisson replica draws via the universal-hash family, 2B "
        "map-side-combined aggregate expressions — CPU fixed-point "
        "that parallelizes linearly at scale; the proxy computes the "
        "identical replica arithmetic vectorized single-process"
    ),
    "pf_profile": (
        "two-phase bounded-statistics kernel (exact percentiles "
        "without a row-scale sort: per-column ranges then 1024-bucket "
        "histogram + within-bucket order statistics — exchanges are "
        "histogram-bounded); BOTH candidate fusions measured SLOWER "
        "twice (r14/r15, profile_columns docstring) and the 30-40x "
        "ratio is a tiny-proxy artifact: DuckDB's single-process exact "
        "percentile answers in ~60ms at sf0.1"
    ),
    "emb_kmeans": (
        "driver-resident Lloyd (the MLlib shape, r15 rework — A/B in "
        "variant_notes): one (cell,dim) exchange per refinement round "
        "+ k*d-row collects, oracle-exact decimal 6dp means; the "
        "per-round exchange is fixed-point cost that amortizes at "
        "scale where it carries real volume, while the proxy replays "
        "the unrolled rounds as one vectorized CTE"
    ),
}


def perf_weak(
    timings: dict[str, float], proxy: dict[str, float]
) -> list[dict]:
    """The judge's per-query weak list (warm median >= WEAK_WARM_S AND
    > WEAK_RATIO x the interleaved proxy), sorted worst-ratio first.
    Sub-second entries with high ratios are Spark's fixed job overhead
    at toy scale and deliberately not flagged. Entries in
    FLOOR_ANNOTATIONS carry their documented-floor rationale. Pure
    function so the contract test exercises it without running Spark."""
    out = []
    for name, t in timings.items():
        p = proxy.get(name)
        if p and t >= WEAK_WARM_S and t > WEAK_RATIO * p:
            row = {
                "query": name,
                "warm_s": round(t, 3),
                "proxy_s": round(p, 3),
                "ratio": round(t / p, 2),
            }
            if name in FLOOR_ANNOTATIONS:
                row["floor"] = FLOOR_ANNOTATIONS[name]
            out.append(row)
    return sorted(out, key=lambda r: -r["ratio"])


def format_stdout_line(
    timings: dict[str, float], sf: float, vs_proxy_suite: float | None = None
) -> str:
    """The driver-facing stdout contract: ONE compact JSON line, well
    under the driver's ~4KB stdout tail window (rounds 4-5 lost their
    official perf record to an oversized line — see module docstring).
    Kept as a pure function so tests/test_bench_contract.py can assert
    the budget against the FULL headline list without running Spark."""
    out = {
        "metric": "headline_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if vs_proxy_suite is not None:
        out["vs_proxy_suite"] = vs_proxy_suite
    line = json.dumps(out)
    assert len(line) < 2000, f"stdout line {len(line)}B breaches driver window"
    return line


_IVF_INDEX_CACHE: dict[str, tuple] = {}


def _ivf_search_prebuilt(spark, sf_dir):
    """SEARCH-ONLY IVF latency on a prebuilt index — the steady-state
    number for the 100 TB path, where the index is built once and persisted
    bucketed by cell (persist_ivf_index). ann_ivf_topk times build+search
    fused (what a cold ad-hoc query pays); this entry caches the trained
    centroids + cell assignment per sf_dir outside the timed region
    (mimicking a bucketed-table reload) and times only probe + cell-local
    scoring. Same operating point as ann_ivf_topk (catalog/scale.py)."""
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        IVF_CENTROIDS,
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        assign_cells,
        ivf_topk,
        train_centroids,
    )

    if sf_dir not in _IVF_INDEX_CACHE:
        e = T(spark, sf_dir, "embeddings")
        cent = train_centroids(e, "vec_id", "embedding", IVF_CENTROIDS)
        cells = assign_cells(e, cent, "vec_id", "embedding").cache()
        cent = cent.cache()
        cells.count(), cent.count()  # materialize outside the timed region
        _IVF_INDEX_CACHE[sf_dir] = (cells, cent)
    cells, cent = _IVF_INDEX_CACHE[sf_dir]
    e = T(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(
        e, q, "vec_id", "embedding", "vec_id", "embedding",
        nprobe=IVF_NPROBE, k=TOP_K, centroids=cent, cells=cells,
    )


_KNN_CENTROID_CACHE: dict[str, object] = {}


def _knn_graph_serve(spark, sf_dir):
    """SERVING-PATH k-NN graph on prebuilt centroids — the steady-state
    number for the 100 TB path (VERDICT r11 ask #3): the IVF quantizer
    is trained once and persisted (persist_ivf_index makes reloaded
    searches exchange-free); rebuilding it per query, as emb_knn_graph
    does, times quantizer training + assignment + the shared-cell
    self-join fused. This entry caches the trained centroids per sf_dir
    outside the timed region (mimicking the bucketed-index reload) and
    times assignment + pair generation + rank cut only. Same operating
    point and IDENTICAL output to emb_knn_graph (centroid training is
    deterministic, so the served edges replay the same oracle)."""
    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        KNN_K,
        KNN_NPROBE,
    )
    from calp_cva_tracking_pipeline_spark.operators.similarity import (
        DEFAULT_CELL_SIZE,
        auto_n_centroids,
        knn_graph,
        train_centroids,
    )

    e = T(spark, sf_dir, "embeddings")
    if sf_dir not in _KNN_CENTROID_CACHE:
        kcent = auto_n_centroids(e, DEFAULT_CELL_SIZE)
        cent = train_centroids(e, "vec_id", "embedding", kcent).cache()
        cent.count()  # materialize outside the timed region
        _KNN_CENTROID_CACHE[sf_dir] = cent
    return knn_graph(
        e,
        "vec_id",
        "embedding",
        k=KNN_K,
        nprobe=KNN_NPROBE,
        centroids=_KNN_CENTROID_CACHE[sf_dir],
    )


def _flagship(spark, sf_dir):
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.functions.numeric import (
        money_avg,
        money_sum,
        product_sum,
    )

    li = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            product_sum(disc_price).alias("sum_disc_price"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


if __name__ == "__main__":
    main()
