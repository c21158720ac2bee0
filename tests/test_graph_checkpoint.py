"""Reliable-checkpoint flag for iterative graph ops (VERDICT r13 ask
#6): the documented dynamic-allocation caveat — localCheckpoint blocks
die with their executor — is now a parameter. 'reliable' routes every
lineage cut through RDD checkpoint() into the session's checkpoint dir
(fault-tolerant storage), refused loudly when no dir is set."""

from __future__ import annotations

import pytest

OPS = [
    "pagerank",
    "hits",
    "hits_weighted",
    "kcore",
    "label_propagation",
    "bfs_layers",
]


def _edges(spark):
    return spark.createDataFrame(
        [(i, (i * 2 + 1) % 9) for i in range(9)] + [(1, 2), (2, 3)],
        "src long, dst long",
    )


def test_reliable_requires_checkpoint_dir(spark):
    """Order-independent (ADVICE r14): the sibling identity test sets a
    checkpoint dir on the shared context, so this test clears the
    (mutable) SparkContext var for its duration and restores it, rather
    than asserting a precondition that depends on in-file ordering."""
    from calp_cva_tracking_pipeline_spark.operators import graph as G

    jsc = spark.sparkContext._jsc.sc()
    set_dir = getattr(jsc, "checkpointDir_$eq")
    saved = jsc.getCheckpointDir()
    none = getattr(
        getattr(spark.sparkContext._jvm, "scala.None$"), "MODULE$"
    )
    set_dir(none)
    try:
        assert jsc.getCheckpointDir().isEmpty()
        with pytest.raises(ValueError, match="setCheckpointDir"):
            G.pagerank(_edges(spark), checkpoint="reliable")
    finally:
        set_dir(saved)


def test_bad_checkpoint_value_refused(spark):
    from calp_cva_tracking_pipeline_spark.operators import graph as G

    with pytest.raises(ValueError, match="local.*reliable"):
        G.hits(_edges(spark), checkpoint="turbo")


def test_reliable_path_matches_local(spark, tmp_path):
    """Every flagged op produces IDENTICAL results under
    checkpoint='reliable' (cuts are semantics-free by construction —
    this pins that the reliable spelling actually executes)."""
    from calp_cva_tracking_pipeline_spark.operators import graph as G

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    e = _edges(spark)
    seeds = spark.createDataFrame([(1,)], "node long")
    for op in OPS:
        fn = getattr(G, op)
        if op == "bfs_layers":
            local = fn(e, seeds, checkpoint="local").collect()
            rel = fn(e, seeds, checkpoint="reliable").collect()
        else:
            local = fn(e, checkpoint="local").collect()
            rel = fn(e, checkpoint="reliable").collect()
        assert local == rel, f"{op}: reliable != local"
    # note: the dir stays set for the remainder of the shared session —
    # nothing else in the suite depends on it being absent, and the
    # precondition test above runs earlier in this file
