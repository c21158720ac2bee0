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
