"""The bench stdout contract, regression-proofed.

Rounds 4-5 lost two rounds of official perf record because the single
stdout line outgrew the external driver's ~4KB tail window (the driver
captured a mid-line fragment and recorded ``parsed: null``). These tests
pin the contract WITHOUT running Spark: the final line must be one JSON
object, parse cleanly, stay under 2KB for the full headline list even
with worst-case-width values, and every headline name must resolve to a
catalog query.
"""

from __future__ import annotations

import json

import pytest

import __spark_entry__ as entrymod
import bench


def test_headline_names_resolve_to_catalog_queries():
    qs = set(entrymod.queries()) | {
        "flagship_pricing_summary",
        "ann_ivf_search",
        "emb_knn_graph_serve",
    }
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names without catalog queries: {missing}"


def test_stdout_line_parses_and_fits_driver_window():
    # worst-case widths: every query at a 4-digit-second, 3-dp value
    timings = {name: 9999.999 for name in bench.HEADLINE}
    line = bench.format_stdout_line(timings, sf=0.1, vs_proxy_suite=99.99)
    assert "\n" not in line
    assert len(line) < 2000, f"{len(line)}B line breaches the ~4KB window"
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_seconds"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    assert parsed["value"] == round(sum(timings.values()), 3)


def test_stdout_line_guard_trips_before_the_driver_does():
    # the in-bench assertion must fire before an oversized line ships —
    # 200 fake queries overflow the budget deliberately
    timings = {f"synthetic_query_{i:03d}": 9999.999 for i in range(200)}
    with pytest.raises(AssertionError):
        bench.format_stdout_line(timings, sf=0.1)


def test_perf_weak_schema_and_criterion():
    """The bench self-gate (VERDICT r13 ask #8): perf_weak applies the
    judge's criterion — warm >= 2s AND > 2x proxy — sorts worst-first,
    and skips sub-2s entries however bad their ratio (fixed job
    overhead at toy scale) and entries with no proxy measurement."""
    timings = {
        "slow_and_weak": 4.0,
        "slow_but_close": 4.0,
        "fast_high_ratio": 0.6,
        "worst": 6.0,
        "no_proxy": 9.0,
    }
    proxy = {
        "slow_and_weak": 1.0,
        "slow_but_close": 3.0,
        "fast_high_ratio": 0.01,
        "worst": 1.0,
    }
    weak = bench.perf_weak(timings, proxy)
    assert [w["query"] for w in weak] == ["worst", "slow_and_weak"]
    assert set(weak[0]) == {"query", "warm_s", "proxy_s", "ratio"}
    assert weak[0]["ratio"] == 6.0


def test_perf_weak_floor_annotations():
    """Documented-floor queries stay ON the weak list (the count is
    honest) but carry their written-down rationale; annotation keys
    must be real headliners so a rename can't silently orphan one."""
    for name in bench.FLOOR_ANNOTATIONS:
        assert name in bench.HEADLINE, name
    weak = bench.perf_weak({"gr_pagerank": 3.0}, {"gr_pagerank": 1.0})
    assert weak[0]["floor"].startswith("fixed-point floor")
    assert set(weak[0]) == {"query", "warm_s", "proxy_s", "ratio", "floor"}


def test_box_calibration_is_pure_and_bounded():
    """BENCH_DETAIL.json carries `calibration_md5_s` each run (r15
    verdict ask #7): a fixed single-core md5 loop whose time normalizes
    cross-round comparisons for the sandbox's ~2-2.5x session-to-session
    host-speed drift. Pure function, no Spark; a tiny round count keeps
    the test fast while pinning that it returns a positive float."""
    t = bench.box_calibration(n_rounds=200)
    assert isinstance(t, float) and t > 0.0
