"""Change-data-capture operators: SCD2 history build and changeset merge.

Neither exists in the reference (its pipelines re-derive full snapshots
every run — SURVEY.md §2.10 EP1/EP2); they are engine additions for the
incremental-maintenance side of a large-scale pipeline, the batch
equivalents of warehouse MERGE INTO / dimension versioning:

- ``scd2_history`` turns an append-only changelog (one row per observed
  version of an entity) into a type-2 slowly-changing dimension: one row
  per RUN of consecutive identical attribute values, effective-dated
  ``[effective_from, effective_to)`` with an open (null) end for the
  current version.
- ``apply_changeset`` merges a changeset into a base snapshot with
  latest-wins upsert + delete semantics — the foreachBatch body of a CDC
  sink, usable identically in batch backfill and streaming incremental
  runs (pairs with ``dedup_incremental``'s persisted-state pattern).

Scale design:

- ``scd2_history`` is window-only: the changelog is hash-shuffled ONCE on
  the entity key, change rows are detected with a null-safe lag compare
  and filtered IN PLACE (filter preserves the exchange's partitioning,
  so the second window — lead() for the effective_to horizon and
  row_number() for the version — reuses the same distribution; the
  executed plan carries exactly one hashpartitioning exchange, pinned in
  tests/test_plan_shapes.py). No self-join, no groupBy re-exchange, no
  row amplification: cost at 100 TB is one shuffle of the changelog plus
  a per-entity sort, and entity skew behaves like any keyed window.
- ``apply_changeset`` is union + one keyed window (latest-wins pick),
  then a delete filter — the merge never joins base against changes, so
  a 100 TB base with a 1 GB changeset shuffles each side once on the
  key and nothing else. NOTE: a union erases any distribution the base
  brought, so bucketing the base does NOT help this formulation; for
  the repeated-merge maintenance loop over a bucketed snapshot use
  ``apply_changeset_joined``, which shuffles ONLY the collapsed
  changeset (base side provably exchange-free — plan-pinned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PREV = "__scd2_prev"
_SRC = "__cdc_src"
_RN = "__cdc_rn"


def scd2_history(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse a changelog into SCD2 version rows.

    ``df`` holds one row per observation: entity ``keys``, observation
    time ``ts_col``, tracked attributes ``attr_cols``. Consecutive
    observations (per entity, ordered by ``ts_col`` then
    ``tiebreak_cols``) with identical attribute values — null-safely
    compared — belong to one version. Output: ``keys + attr_cols`` plus

    - ``effective_from``: the version's first observation time,
    - ``effective_to``: the NEXT version's ``effective_from`` (null for
      the entity's current version — half-open intervals chain exactly),
    - ``version``: 1-based per entity in time order,
    - ``is_current``: ``effective_to IS NULL``.

    The (ts, tiebreak) ordering must be a total order within each entity
    or run boundaries are partition-order-dependent (same contract as
    every keyed window here — see tests/test_plan_shapes.py's w1 note).
    """
    tiebreak_cols = tiebreak_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    # Null-safe change detector: first row per entity has lag NULL and
    # eqNullSafe(NULL-struct) is false there, so it always starts a run.
    changed = ~attrs.eqNullSafe(F.lag(attrs).over(w))
    starts = df.withColumn(_PREV, changed).filter(F.col(_PREV)).drop(_PREV)
    return (
        starts.withColumn("effective_from", F.col(ts_col))
        .withColumn("effective_to", F.lead("effective_from").over(w))
        .withColumn("version", F.row_number().over(w))
        .withColumn("is_current", F.col("effective_to").isNull())
        .select(
            *keys, *attr_cols,
            "effective_from", "effective_to", "version", "is_current",
        )
    )


def apply_changeset(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge of ``changes`` into ``base`` (MERGE INTO shape).

    Both sides share the ``base`` schema (plus an optional boolean
    ``delete_col`` on ``changes``; absent means pure upsert). Per entity
    key the row with the greatest (``ts_col``, ``tiebreak_cols``,
    change-beats-base) wins; a winning change row flagged deleted drops
    the entity from the snapshot entirely. Ties on the full ordering are
    broken in favor of the CHANGE side (a same-timestamp correction
    supersedes the base row it corrects).

    Incremental caveat: applying changesets one batch at a time is
    equivalent to one big merge ONLY while changes for an entity arrive
    in non-decreasing (ts, tiebreak) order across batches. A winning
    delete drops the entity's row entirely, so a LATER batch carrying an
    OLDER change for that entity would resurrect it (the one-shot merge
    would not). If the change feed can deliver out of order across
    batches, persist delete tombstones in the snapshot (keep the row
    with a ``deleted`` flag and filter on read) instead of physically
    dropping — same operator, ``delete_col=None`` plus a downstream
    filter. Pinned by tests/test_cdc.py's stream-vs-oneshot compare.
    """
    tiebreak_cols = tiebreak_cols or []
    out_cols = base.columns
    del_flag = (
        F.coalesce(F.col(delete_col), F.lit(False))
        if delete_col
        else F.lit(False)
    )
    b = base.select(*out_cols).withColumn("__del", F.lit(False)).withColumn(
        _SRC, F.lit(0)
    )
    c = changes.select(*out_cols, del_flag.alias("__del")).withColumn(
        _SRC, F.lit(1)
    )
    w = Window.partitionBy(*keys).orderBy(
        *[
            F.col(c_).desc()
            for c_ in (ts_col, *tiebreak_cols)
        ],
        F.col(_SRC).desc(),
    )
    return (
        b.unionByName(c)
        .withColumn(_RN, F.row_number().over(w))
        .filter((F.col(_RN) == 1) & ~F.col("__del"))
        .select(*out_cols)
    )


def apply_changeset_joined(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """``apply_changeset`` restructured for a BUCKETED base snapshot —
    the repeated-merge maintenance loop at scale.

    PRECONDITION: ``base`` holds at most one row per key (the snapshot
    invariant the maintenance loop guarantees; ``apply_changeset`` does
    not require it, this variant does). Semantics are then identical
    (same latest-wins ordering, same change-beats-base tie rule, same
    delete handling — equality is test-pinned against the union+window
    formulation on randomized inputs).

    Why a second formulation: the union+window shape shuffles
    base+changes TOGETHER every merge — a union erases any distribution
    the base brought, so storing the base bucketed buys nothing there.
    Here changes are first collapsed latest-per-key (a window over the
    SMALL side only), then full-outer joined to the base: when the base
    is a bucketed table on the key, the planner proves its side's
    distribution and only the collapsed changeset shuffles
    (plan-pinned in tests/test_cdc.py — base side exchange-free). A
    100 TB base absorbs a 1 GB changeset moving ~1 GB, not ~100 TB.
    """
    tiebreak_cols = tiebreak_cols or []
    out_cols = base.columns
    del_flag = (
        F.coalesce(F.col(delete_col), F.lit(False))
        if delete_col
        else F.lit(False)
    )
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in (ts_col, *tiebreak_cols)]
    )
    ch = (
        changes.select(*out_cols, del_flag.alias("__del"))
        .withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )
    payload = [c for c in out_cols if c not in keys]
    ch = ch.select(
        *keys,
        F.struct(
            *[F.col(c) for c in payload], F.col("__del")
        ).alias("__ch"),
    )
    ordkey = [ts_col, *tiebreak_cols]
    base_ord = F.struct(*[F.col(c) for c in ordkey])
    ch_ord = F.struct(*[F.col(f"__ch.{c}") for c in ordkey])
    # change wins when base is absent or its ordering key is <= the
    # change's (ties to the change side — the correction rule)
    change_wins = F.col("__ch").isNotNull() & (
        F.col(ts_col).isNull() | (base_ord <= ch_ord)
    )
    merged = base.join(ch, keys, "full_outer").select(
        *keys,
        *[
            F.when(change_wins, F.col(f"__ch.{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
        F.when(change_wins, F.col("__ch.__del"))
        .otherwise(F.lit(False))
        .alias("__del"),
    )
    return merged.filter(~F.col("__del")).select(*out_cols)


def as_of_snapshot(history: DataFrame, at: Column) -> DataFrame:
    """Point-in-time read of an ``scd2_history`` output: the version rows
    whose ``[effective_from, effective_to)`` interval contains ``at``.
    A pure filter — pushes to the scan, prunes partitions when the
    history is stored partitioned on ``effective_to`` month."""
    return history.filter(
        (F.col("effective_from") <= at)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > at))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: the exact row-level delta between two
    table versions — the audit half of the CDC tier (``apply_changeset``
    APPLIES a known changeset; this RECOVERS the changeset when all you
    kept is the snapshots, e.g. validating a migration, diffing a
    rebuilt table against production, or bootstrapping CDC onto a
    pipeline that never emitted one).

    One FULL OUTER join on the key (both sides shuffle once; at scale,
    snapshots bucketed on the key make it exchange-free) classifying
    each key as ``insert`` (new only), ``delete`` (old only) or
    ``update`` (both present, any compare column differing NULL-SAFELY —
    NULL→value and value→NULL are updates, NULL→NULL is not). Unchanged
    keys are dropped in the same pass, so output is delta-sized, never
    snapshot-sized. ``changed_cols`` lists the differing columns
    (name-sorted, comma-joined — empty for insert/delete) so downstream
    can route column-level repairs without re-diffing.

    ``compare_cols`` defaults to every shared non-key column. Keys are
    assumed unique per snapshot (it is a snapshot, not a changelog —
    run the dedup tier first otherwise).

    Engine-added; no reference counterpart.
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(c for c in shared if c not in keys)
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ko_{k}") == F.col(f"__kn_{k}")
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed = F.array_sort(
        F.filter(F.array(*diffs), lambda x: x.isNotNull())
    )
    change_type = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(F.size(changed) > 0, F.lit("update"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(
                    F.col(f"__ko_{k}"), F.col(f"__kn_{k}")
                ).alias(k)
                for k in keys
            ],
            "change_type",
            F.when(
                F.col("change_type") == "update",
                F.array_join(changed, ","),
            )
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
