"""Bounded-memory frequency sketches with exact final answers.

``heavy_hitters`` finds every key whose frequency is ≥ ``threshold_frac``
of the input — EXACTLY — without ever shuffling the full key distribution:

  phase 1 (candidates): each partition runs a Misra-Gries summary
    (k counters, batched merge rule from Agarwal et al., "Mergeable
    Summaries", PODS 2012: add the batch's exact counts, then subtract the
    (k+1)-th largest count and drop non-positive counters). An MG summary
    with k counters retains every key whose partition frequency exceeds
    n_p/(k+1); a global heavy hitter (freq ≥ s·N) must have freq ≥ s·n_p
    in at least one partition (pigeonhole), so with k ≥ 1/s the union of
    per-partition candidates is a SUPERSET of the true heavy hitters.
  phase 2 (verify): exact counts of the candidates only (broadcast
    left-semi filter → partial-aggregated groupBy), thresholded against
    the exact total.

Why not a plain groupBy? An exact groupBy shuffles O(distinct keys) rows —
for web-corpus token streams that is a vocabulary-sized exchange (billions
of keys) to answer a question about the ~1/s ≈ hundreds that matter. Here
the shuffle carries at most k·partitions candidate keys (phase 1 output)
plus the partial counts of candidate keys (phase 2); per-executor state is
k counters regardless of key cardinality. The sketch is the *pruning*
stage only — because phase 2 re-counts exactly, the output is identical to
the SQL ``GROUP BY … HAVING`` oracle, not an approximation.

The MG loop is genuinely imperative state (counter eviction), so phase 1
is an Arrow-batched ``mapInPandas`` — the one place Python belongs here.
Rows with null keys are ignored (``value_counts`` semantics); filter or
fill upstream if nulls are meaningful.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _mg_candidates(key_name: str, k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict = {}
        for pdf in batches:
            for key, c in pdf[key_name].value_counts().items():
                state[key] = state.get(key, 0) + int(c)
            if len(state) > k:
                # mergeable-summaries rule: subtract the (k+1)-th largest
                # count from every counter, drop the non-positive.
                t = sorted(state.values(), reverse=True)[k]
                state = {
                    key: c - t for key, c in state.items() if c - t > 0
                }
        yield pd.DataFrame(
            {key_name: pd.Series(list(state.keys()), dtype=object)}
        )

    return fn


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float,
    margin: float = 2.0,
) -> DataFrame:
    """All keys with frequency ≥ ``threshold_frac`` of ``df``'s rows, as
    (key, cnt, frac) with exact counts. ``margin`` scales the sketch
    capacity above the 1/s guarantee floor (headroom against near-
    threshold keys whose MG counts sit just under their true frequency).
    """
    if not 0 < threshold_frac <= 1:
        raise ValueError(f"threshold_frac in (0, 1]: {threshold_frac}")
    k = math.ceil(margin / threshold_frac)
    keyed = df.select(key_col)
    schema = StructType([keyed.schema[key_col]])
    cands = keyed.mapInPandas(
        _mg_candidates(key_col, k), schema=schema
    ).distinct()
    total = keyed.agg(F.count("*").alias("__n"))
    return (
        keyed.join(F.broadcast(cands), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(
            F.col("cnt").cast("double")
            >= F.lit(float(threshold_frac)) * F.col("__n")
        )
        .select(
            key_col,
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("__n"), 6
            ).alias("frac"),
        )
    )


def mg_merge(
    store: DataFrame,
    batch: DataFrame,
    key_col: str,
    k: int,
) -> DataFrame:
    """Merge an ingest batch into a Misra-Gries count STORE of at most
    ``k`` counters → the next store version (key, cnt). The streaming
    twin of ``heavy_hitters``'s phase 1: a continuous pipeline keeps one
    bounded summary across micro-batches (foreachBatch: read store →
    mg_merge → overwrite store), and at any point the store's keys are a
    superset of every key with stream frequency > N/(k+1) — the
    mergeable-summaries guarantee (Agarwal et al., PODS 2012) composes
    over arbitrarily many merges, so the loop never rescans history.
    Per-key undercount is bounded by the total decrement mass ≤ N/(k+1);
    report ``cnt`` as a lower bound, or verify candidates exactly
    against raw history where it is retained.

    Scale shape: the batch collapses to its exact (key, cnt) aggregate
    (map-side combined, batch-cardinality), unions with the ≤k-row
    store, and the subtract threshold — the (k+1)-th largest merged
    count — comes from a summary-sized window (driver-bounded: ≤ k +
    distinct-keys(batch) rows; the single-partition sort is over the
    SUMMARY, never the stream)."""
    batch_counts = batch.groupBy(key_col).agg(F.count("*").alias("cnt"))
    merged = (
        store.select(key_col, "cnt")
        .unionByName(batch_counts)
        .groupBy(key_col)
        .agg(F.sum("cnt").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col(key_col))
    ranked = merged.withColumn("__rn", F.row_number().over(w))
    t = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("__rn") == k + 1, F.col("cnt"))), F.lit(0)
        ).alias("__t")
    )
    return (
        ranked.crossJoin(F.broadcast(t))
        .select(key_col, (F.col("cnt") - F.col("__t")).alias("cnt"))
        .filter(F.col("cnt") > 0)
    )
