"""Round-12 property pins: serving-path equivalences and bench-protocol
invariants added for VERDICT r11 asks #2/#3."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


def test_knn_graph_serve_path_identical_to_cold_build(spark):
    """The bench's emb_knn_graph_serve entry (prebuilt cached centroids)
    must emit EXACTLY the cold build+search edges — centroid training is
    deterministic, so reusing the quantizer may change only the timing,
    never the graph."""
    import bench
    from calp_cva_tracking_pipeline_spark.catalog.scale import (
        emb_knn_graph,
    )

    bench._KNN_CENTROID_CACHE.clear()
    cold = {tuple(r) for r in emb_knn_graph(spark, SF_DIR).collect()}
    served = {
        tuple(r) for r in bench._knn_graph_serve(spark, SF_DIR).collect()
    }
    assert served == cold and len(cold) > 0
    # second call reuses the cache (no retrain) and still matches
    served2 = {
        tuple(r) for r in bench._knn_graph_serve(spark, SF_DIR).collect()
    }
    assert served2 == cold
    bench._KNN_CENTROID_CACHE.clear()


def test_interleaved_ratio_is_published_when_proxy_runs():
    """The bench detail contract: when the proxy executes, the detail
    carries interleaved_ratio (the r12 round-over-round metric) — pinned
    on the source so the contract can't silently regress without a
    bench run."""
    src = open(Path(__file__).resolve().parents[1] / "bench.py").read()
    assert '"interleaved_ratio"' in src
    assert "interleaved per-round with spark" in src
