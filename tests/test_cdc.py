"""CDC operator tests: SCD2 history build and changeset merge.

Semantics pinned here (invariants the oracle's value-hash can't see on
its own): interval chaining, run-length collapse, partition-independence,
delete handling, and the change-beats-base tie rule.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.operators.cdc import (
    apply_changeset,
    as_of_snapshot,
    scd2_history,
)


def _changelog(spark):
    rows = [
        # entity 1: A, A, B, B, A — three runs (A, B, A)
        (1, dt.datetime(2024, 1, 1), "A"),
        (1, dt.datetime(2024, 1, 2), "A"),
        (1, dt.datetime(2024, 1, 3), "B"),
        (1, dt.datetime(2024, 1, 4), "B"),
        (1, dt.datetime(2024, 1, 5), "A"),
        # entity 2: one observation — one open version
        (2, dt.datetime(2024, 2, 1), "X"),
        # entity 3: null attr then value then null — null-safe runs
        (3, dt.datetime(2024, 3, 1), None),
        (3, dt.datetime(2024, 3, 2), None),
        (3, dt.datetime(2024, 3, 3), "Y"),
        (3, dt.datetime(2024, 3, 4), None),
    ]
    return spark.createDataFrame(rows, "id bigint, ts timestamp, attr string")


def test_scd2_collapses_runs_and_chains_intervals(spark):
    out = scd2_history(
        _changelog(spark), ["id"], "ts", ["attr"]
    ).orderBy("id", "version")
    rows = [tuple(r) for r in out.collect()]
    d = dt.datetime
    assert rows == [
        (1, "A", d(2024, 1, 1), d(2024, 1, 3), 1, False),
        (1, "B", d(2024, 1, 3), d(2024, 1, 5), 2, False),
        (1, "A", d(2024, 1, 5), None, 3, True),
        (2, "X", d(2024, 2, 1), None, 1, True),
        (3, None, d(2024, 3, 1), d(2024, 3, 3), 1, False),
        (3, "Y", d(2024, 3, 3), d(2024, 3, 4), 2, False),
        (3, None, d(2024, 3, 4), None, 3, True),
    ]


def test_scd2_intervals_partition_time_per_entity(spark, sf_dir):
    """On real data: per entity exactly one open version; closed versions
    chain with zero gap/overlap (effective_to == next effective_from)."""
    h = scd2_history(
        T(spark, sf_dir, "orders"),
        ["o_custkey"], "o_orderdate",
        ["o_orderstatus", "o_orderpriority"], ["o_orderkey"],
    ).cache()
    n_entities = h.select("o_custkey").distinct().count()
    assert h.filter("is_current").count() == n_entities
    assert h.filter("effective_to IS NULL AND NOT is_current").count() == 0
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("version")
    gaps = (
        h.withColumn("nxt", F.lead("effective_from").over(w))
        .filter(F.col("effective_to").isNotNull())
        .filter(~(F.col("effective_to") == F.col("nxt")))
    )
    assert gaps.count() == 0
    # consecutive versions always differ in at least one tracked attr
    same = (
        h.withColumn("pa", F.lag("o_orderstatus").over(w))
        .withColumn("pp", F.lag("o_orderpriority").over(w))
        .filter(
            F.col("pa").eqNullSafe(F.col("o_orderstatus"))
            & F.col("pp").eqNullSafe(F.col("o_orderpriority"))
        )
    )
    assert same.count() == 0
    h.unpersist()


def test_scd2_partition_independent(spark):
    base = scd2_history(_changelog(spark), ["id"], "ts", ["attr"])
    shuffled = scd2_history(
        _changelog(spark).repartition(7), ["id"], "ts", ["attr"]
    )
    assert sorted(map(tuple, base.collect()), key=repr) == sorted(
        map(tuple, shuffled.collect()), key=repr
    )


def test_as_of_snapshot_reads_one_version_per_entity(spark):
    h = scd2_history(_changelog(spark), ["id"], "ts", ["attr"])
    snap = as_of_snapshot(h, F.lit(dt.datetime(2024, 1, 3, 12)))
    got = {(r.id, r.attr) for r in snap.collect()}
    assert got == {(1, "B")}  # entities 2/3 not yet born at that instant
    snap_now = as_of_snapshot(h, F.lit(dt.datetime(2030, 1, 1)))
    assert snap_now.count() == 3  # exactly one current row per entity


def _merge_fixture(spark):
    base = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10.0),
         (2, dt.datetime(2024, 1, 1), 20.0),
         (3, dt.datetime(2024, 1, 1), 30.0)],
        "id bigint, ts timestamp, val double",
    )
    changes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2), 11.0, False),   # update wins (newer)
         (2, dt.datetime(2024, 1, 2), 0.0, True),     # delete
         (3, dt.datetime(2023, 12, 1), 99.0, False),  # stale: base wins
         (4, dt.datetime(2024, 1, 2), 40.0, False)],  # insert
        "id bigint, ts timestamp, val double, is_deleted boolean",
    )
    return base, changes


def test_apply_changeset_upsert_delete_insert_stale(spark):
    base, changes = _merge_fixture(spark)
    out = apply_changeset(
        base, changes, ["id"], "ts", delete_col="is_deleted"
    )
    got = {(r.id, r.val) for r in out.collect()}
    assert got == {(1, 11.0), (3, 30.0), (4, 40.0)}


def test_apply_changeset_same_ts_change_beats_base(spark):
    base, _ = _merge_fixture(spark)
    changes = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 111.0, False)],
        "id bigint, ts timestamp, val double, is_deleted boolean",
    )
    out = apply_changeset(
        base, changes, ["id"], "ts", delete_col="is_deleted"
    )
    assert {(r.id, r.val) for r in out.filter("id = 1").collect()} == {
        (1, 111.0)
    }


def test_apply_changeset_without_delete_col_is_pure_upsert(spark):
    base, changes = _merge_fixture(spark)
    out = apply_changeset(base, changes.drop("is_deleted"), ["id"], "ts")
    got = {(r.id, r.val) for r in out.collect()}
    # id 2's "delete" row is just a newer value without the flag
    assert got == {(1, 11.0), (2, 0.0), (3, 30.0), (4, 40.0)}


def test_apply_changeset_idempotent_reapply(spark):
    """Re-applying the same changeset to the merged snapshot is a no-op —
    the foreachBatch retry/replay safety property."""
    base, changes = _merge_fixture(spark)
    once = apply_changeset(
        base, changes, ["id"], "ts", delete_col="is_deleted"
    )
    twice = apply_changeset(
        once, changes, ["id"], "ts", delete_col="is_deleted"
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_foreachbatch_cdc_snapshot_maintenance(spark, tmp_path):
    """The streaming MERGE loop: foreachBatch applies each micro-batch
    of changes to the persisted snapshot with apply_changeset — the same
    operator body as the batch path. After the stream drains, the
    maintained snapshot must equal applying ALL changes in one batch
    (order-insensitivity of latest-wins merge), with deletes honored."""
    import os

    src = str(tmp_path / "changes_src")
    snap_a, snap_b = str(tmp_path / "snap_a"), str(tmp_path / "snap_b")
    schema = "id bigint, ts timestamp, val double, is_deleted boolean"

    base = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), float(i)) for i in range(1, 21)],
        "id bigint, ts timestamp, val double",
    )
    # 40 change rows over 25 ids: updates, inserts (21-25), deletes (%7)
    changes = spark.createDataFrame(
        [
            (
                (i % 25) + 1,
                dt.datetime(2024, 1, 2) + dt.timedelta(minutes=i),
                100.0 + i,
                (i % 25 + 1) % 7 == 0,
            )
            for i in range(40)
        ],
        schema,
    )
    changes.repartition(5).write.parquet(src)

    snap_paths = [snap_a, snap_b]
    state = {"cur": 0}

    def process(batch_df, batch_id):
        from calp_cva_tracking_pipeline_spark.operators.cdc import (
            apply_changeset,
        )

        s = batch_df.sparkSession
        cur, nxt = snap_paths[state["cur"]], snap_paths[1 - state["cur"]]
        snap = (
            s.read.parquet(cur)
            if os.path.exists(cur)
            else base.select("id", "ts", "val")
        )
        merged = apply_changeset(
            snap, batch_df, ["id"], "ts",
            tiebreak_cols=["val"], delete_col="is_deleted",
        )
        merged.write.mode("overwrite").parquet(nxt)
        state["cur"] = 1 - state["cur"]

    q = (
        spark.readStream.schema(changes.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()

    from calp_cva_tracking_pipeline_spark.operators.cdc import (
        apply_changeset,
    )

    streamed = spark.read.parquet(snap_paths[state["cur"]])
    oneshot = apply_changeset(
        base.select("id", "ts", "val"), changes, ["id"], "ts",
        tiebreak_cols=["val"], delete_col="is_deleted",
    )
    assert sorted(map(tuple, streamed.collect()), key=repr) == sorted(
        map(tuple, oneshot.collect()), key=repr
    )
    # ids ≡ 0 (mod 7) only ever see delete rows → absent (21 was an
    # insert-then-never-born); other inserts (22-25) present
    ids = {r.id for r in streamed.collect()}
    assert {22, 23, 24, 25} <= ids
    assert ids.isdisjoint({7, 14, 21})


def test_apply_changeset_joined_equals_window_formulation(spark):
    """The joined (bucketed-base) variant must produce exactly the
    union+window result whenever the base is a proper snapshot (one row
    per key) — randomized updates/inserts/deletes/stale rows."""
    import random

    from calp_cva_tracking_pipeline_spark.operators.cdc import (
        apply_changeset_joined,
    )

    rng = random.Random(555)
    base = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randint(0, 5)),
             float(i))
            for i in range(40)
        ],
        "id bigint, ts timestamp, val double",
    )
    changes = spark.createDataFrame(
        [
            (
                rng.randint(0, 55),
                dt.datetime(2024, 1, 1) + dt.timedelta(hours=rng.randint(0, 10)),
                100.0 + j,
                rng.random() < 0.25,
            )
            for j in range(120)
        ],
        "id bigint, ts timestamp, val double, is_deleted boolean",
    )
    a = apply_changeset(
        base, changes, ["id"], "ts", ["val"], "is_deleted"
    )
    b = apply_changeset_joined(
        base, changes, ["id"], "ts", ["val"], "is_deleted"
    )
    assert sorted(map(tuple, a.collect()), key=repr) == sorted(
        map(tuple, b.collect()), key=repr
    )


def test_apply_changeset_joined_bucketed_base_shuffles_changes_only(
    spark, tmp_path
):
    """THE claim this variant exists for: with the snapshot stored as a
    bucketed table on the key, the merge plan shuffles only the
    changeset — no Exchange sits anywhere above the base table scan."""
    from calp_cva_tracking_pipeline_spark.operators.cdc import (
        apply_changeset_joined,
    )
    from calp_cva_tracking_pipeline_spark.sources.bucketed import (
        write_bucketed,
    )

    base = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), float(i)) for i in range(2000)],
        "id bigint, ts timestamp, val double",
    )
    write_bucketed(base, "cdc_base_bucketed", ["id"], num_buckets=8)
    try:
        snap = spark.table("cdc_base_bucketed")
        changes = spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 2), 1000.0 + i, i % 7 == 0)
                for i in range(0, 3000, 3)
            ],
            "id bigint, ts timestamp, val double, is_deleted boolean",
        )
        merged = apply_changeset_joined(
            snap, changes, ["id"], "ts", delete_col="is_deleted"
        )
        merged.count()
        plan = (
            merged._jdf.queryExecution().executedPlan().toString()
        )
        # base side: the scan of the bucketed table must NOT feed an
        # exchange — split the plan at the table scan and check the
        # operator chain above it on that branch
        assert "cdc_base_bucketed" in plan
        assert "SortMergeJoin" in plan
        # exactly ONE shuffle in the whole plan: the changes side
        # (window + join repartition share it); bucketed side contributes
        # zero
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan
        # and the result is right: updates applied, deletes gone
        assert merged.filter("id = 3").first().val == 1003.0
        # in-changeset ids divisible by 7 are deletes (21 from base,
        # 2100 a deleted insert); id 7 itself is not in the step-3 feed
        assert merged.filter("id IN (0, 21, 2100)").count() == 0
        assert merged.filter("id = 7").first().val == 7.0  # untouched
        assert merged.filter("id = 2001").first().val == 3001.0  # insert
    finally:
        spark.sql("DROP TABLE IF EXISTS cdc_base_bucketed")
