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
from pyspark.sql import DataFrame, Window
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


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (deterministic, oracle-reproducible)
# ---------------------------------------------------------------------------

HLL_P = 9                      # 2^9 = 512 buckets → ~4.6% relative error
HLL_M = 1 << HLL_P
_HLL_WBITS = 60 - HLL_P        # stable_hash64 yields 60 hash bits
_HLL_RHO_MAX = _HLL_WBITS + 1  # rho when the whole w suffix is zero
# alpha_m · m² · 2^(wbits+1): the raw-estimate numerator as ONE double
# literal so both engines evaluate a single IEEE division
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_MAX)


def hll_sketch(df: DataFrame, cols: list[str]) -> DataFrame:
    """Mergeable HyperLogLog register table for each of ``cols`` in ONE
    scan (unpivot, never one pass per column): rows (col_name, bucket,
    m) where m is the bucket's max rank-of-first-set-bit. Flajolet et
    al. 2007 HLL, but over the md5-based ``stable_hash64`` — fully
    deterministic and recomputable by the DuckDB oracle, unlike the
    engine-private hash inside ``approx_count_distinct``. The register
    table IS the persistable/mergeable state: union register tables
    from any partitioning of the data and ``hll_merge`` (bucket-wise
    MAX — idempotent, commutative, associative) gives bit-identical
    registers, the property that makes per-shard sketching at 100 TB
    embarrassingly parallel. Memory: ≤ 512 rows per column, ever.

    The rank arithmetic is integer/string-exact (msb via the length of
    the binary representation), never floating log2 — a w at an exact
    power of two must not round across engines.
    """
    from calp_cva_tracking_pipeline_spark.functions.hashing import (
        stable_hash64,
    )

    long = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "col_name", "val").filter(F.col("val").isNotNull())
    h = stable_hash64(F.col("val"))
    w_expr = f"h div {HLL_M}"
    rho = F.when(
        F.expr(w_expr) == 0, F.lit(_HLL_RHO_MAX)
    ).otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.expr(f"bin({w_expr})")))
    return (
        long.withColumn("h", h)
        .withColumn("bucket", F.expr(f"h % {HLL_M}"))
        .withColumn("rho", rho)
        .groupBy("col_name", "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables from independent shards into one sketch."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("col_name", "bucket").agg(F.max("m").alias("m"))


def hll_estimate(sketch: DataFrame) -> DataFrame:
    """(col_name, approx_distinct) from a register table. Integer-exact
    register fold: Σ 2^(rho_max − m) accumulates as BIGINT (order-
    independent, ≤ 2^61), empty buckets contribute 2^rho_max each; ONE
    double division + the standard small-range linear-counting branch,
    both mirrored literally in the SQL twin. Rounded to 6 dp."""
    w = _HLL_RHO_MAX
    return (
        sketch.groupBy("col_name")
        .agg(
            F.expr(
                f"CAST(sum(CAST(pow(2, {w} - m) AS BIGINT)) AS BIGINT)"
            ).alias("ssum"),
            F.count("*").alias("occ"),
        )
        .select(
            "col_name",
            F.expr(
                f"CAST({HLL_M} - occ AS BIGINT)"
            ).alias("zeros"),
            F.expr(
                f"ssum + ({HLL_M} - occ) * CAST(pow(2, {w}) AS BIGINT)"
            ).alias("total"),
        )
        .select(
            "col_name",
            F.round(
                F.when(
                    (F.lit(_HLL_NUM) / F.col("total") <= 2.5 * HLL_M)
                    & (F.col("zeros") > 0),
                    F.lit(float(HLL_M))
                    * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
                ).otherwise(F.lit(_HLL_NUM) / F.col("total")),
                6,
            ).alias("approx_distinct"),
        )
    )


def hll_sql(table_expr: str, cols: list[str]) -> str:
    """DuckDB twin of sketch→estimate over the same columns."""
    w = _HLL_RHO_MAX
    unions = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val "
        f"FROM {table_expr} WHERE {c} IS NOT NULL"
        for c in cols
    )
    h60 = "CAST(CAST(('0x' || substring(md5(val), 1, 15)) AS UBIGINT) AS BIGINT)"
    return f"""
WITH long AS ({unions}),
hashed AS (
  SELECT col_name, {h60} AS h FROM long),
regs AS (
  -- bin() strips leading zeros in BOTH engines (verified), so
  -- length(bin(w)) is the exact msb position and rho is integer-exact
  SELECT col_name, h % {HLL_M} AS bucket,
         MAX(CASE WHEN h // {HLL_M} = 0 THEN {w}
             ELSE {w} - length(bin(h // {HLL_M})) END) AS m
  FROM hashed GROUP BY 1, 2),
folded AS (
  SELECT col_name,
         CAST(SUM(CAST(pow(2, {w} - m) AS BIGINT)) AS BIGINT)
           + ({HLL_M} - COUNT(*)) * CAST(pow(2, {w}) AS BIGINT) AS total,
         {HLL_M} - COUNT(*) AS zeros
  FROM regs GROUP BY 1)
SELECT col_name,
       ROUND(CASE WHEN {_HLL_NUM!r} / total <= 2.5 * {HLL_M} AND zeros > 0
                  THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / zeros)
                  ELSE {_HLL_NUM!r} / total END, 6) AS approx_distinct
FROM folded
"""


# --------------------------------------------------------------------------
# Count-Min sketch: mergeable frequency estimates with a one-sided error
# --------------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 16


def _cms_bucket(r: int, val) -> "F.Column":
    """Row-r bucket of a string value: stable_hash64('r|' || val) % width.
    Salting the hash input with the row index gives CMS_DEPTH independent
    hash functions from the one md5 primitive — recomputable anywhere."""
    from calp_cva_tracking_pipeline_spark.functions.hashing import (
        stable_hash64,
    )

    return stable_hash64(F.concat(F.lit(f"{r}|"), val)) % F.lit(CMS_WIDTH)


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode–Muthukrishnan 2005) of ``key_col``'s
    frequency distribution: rows (r, bucket, cnt) — the depth × width
    counter matrix in long form, ≤ depth·width rows total regardless of
    input size.

    Each input row increments one bucket per hash row; the whole matrix
    is ONE hash aggregation with full map-side combine (a task's local
    matrix is depth·width ints, merged by addition on the wire). The
    sketch is mergeable by construction — counter matrices from disjoint
    shards ADD (``cms_merge``), bit-identically to sketching the union —
    so a 100 TB corpus sketches shard-by-shard with constant memory,
    the same contract as ``hll_sketch``/``mg_merge`` above.

    Estimates (``cms_estimate``) are one-sided: est ≥ true count always
    (hash collisions only ever inflate), with P[err > εN] ≤ (1/2)^depth
    at width = e/ε. Deterministic: the salted md5 hash family is fixed,
    so sketch AND estimates are exactly recomputable by the SQL oracle.

    ``weight_col`` (r16, guide §2.3 "aggregate before you shuffle"):
    sketch a PRE-AGGREGATED (key, count) table instead of raw rows —
    counters sum the weights, which is bit-identical to per-row
    increments (bucket sums are additive over any partition of the
    rows). Callers that also need exact counts or a probe key list can
    then compute the key aggregation ONCE and feed every consumer
    vocab-sized data, instead of fanning raw rows ×depth through the
    sketch exchange (pf_cms: 3 corpus tokenize passes → 1).
    """
    v = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    rows = df.select(
        F.explode(
            F.array(*[F.lit(r) for r in range(depth)])
        ).alias("r"),
        v.alias("__v"),
        w.alias("__w"),
    ).filter(F.col("__v").isNotNull())
    bucket = None
    for r in range(depth):
        b = _cms_bucket(r, F.col("__v"))
        bucket = (
            F.when(F.col("r") == r, b)
            if bucket is None
            else bucket.when(F.col("r") == r, b)
        )
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("r", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Add counter matrices from independent shards (exact merge)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = CMS_DEPTH
) -> DataFrame:
    """Point-query the sketch for every probe key: est = MIN over hash
    rows of the key's bucket counter. The probe side fans out to depth
    rows and equi-joins the (≤ depth·width row) sketch — broadcast, so
    estimating costs no shuffle of the probe stream at any scale."""
    v = F.col(key_col).cast("string")
    fan = probes.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r"),
    )
    bucket = None
    for r in range(depth):
        b = _cms_bucket(r, v)
        bucket = (
            F.when(F.col("r") == r, b)
            if bucket is None
            else bucket.when(F.col("r") == r, b)
        )
    fan = fan.withColumn("bucket", bucket)
    hit = fan.join(F.broadcast(sketch), ["r", "bucket"], "left").fillna(
        0, subset=["cnt"]
    )
    return hit.groupBy(key_col).agg(F.min("cnt").alias("est_n"))


def cms_sql(table_expr: str, key_expr: str, depth: int = CMS_DEPTH) -> str:
    """DuckDB twin of sketch→estimate→compare-with-exact over one key
    expression (returns key, exact_n, est_n, overcount ordered by key)."""
    h60 = (
        lambda e: f"CAST(CAST(('0x' || substring(md5({e}), 1, 15)) "
        "AS UBIGINT) AS BIGINT)"
    )
    rs = ", ".join(str(r) for r in range(depth))
    return f"""
WITH vals AS (
  SELECT CAST({key_expr} AS VARCHAR) AS v FROM {table_expr}
  WHERE {key_expr} IS NOT NULL),
fan AS (
  SELECT v, unnest([{rs}]) AS r FROM vals),
sk AS (
  SELECT r, {h60("r || '|' || v")} % {CMS_WIDTH} AS bucket,
         COUNT(*) AS cnt
  FROM fan GROUP BY 1, 2),
probes AS (SELECT DISTINCT v FROM vals),
pfan AS (
  SELECT v, unnest([{rs}]) AS r FROM probes),
est AS (
  SELECT p.v, MIN(COALESCE(s.cnt, 0)) AS est_n
  FROM (SELECT v, r, {h60("r || '|' || v")} % {CMS_WIDTH} AS bucket
        FROM pfan) p
  LEFT JOIN sk s ON s.r = p.r AND s.bucket = p.bucket
  GROUP BY 1),
exact AS (SELECT v, COUNT(*) AS exact_n FROM vals GROUP BY 1)
SELECT e.v AS token, x.exact_n, e.est_n, e.est_n - x.exact_n AS overcount
FROM est e JOIN exact x ON x.v = e.v
ORDER BY token
"""


def sliding_distinct(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Trailing-window distinct-key counts per day — (day,
    approx_distinct) for "7-day active users" style series — computed
    the ONLY way that scales: per-day HLL register tables (one scan,
    map-side combined) merged across the window by bucket-wise MAX (the
    register algebra), then estimated per day. A naive
    count_distinct-per-window re-scans every row ``window_days`` times
    and holds a per-window exact set; this holds ≤ 512 integers per day
    FOREVER, and the same register table serves every window length
    after the fact.

    Merge correctness is the HLL property ``hll_sketch`` documents
    (bucket-wise MAX is idempotent/commutative/associative), so the
    window merge is a RANGE-frame MAX per bucket over a DENSE day×bucket
    grid (days are calendar-bounded, buckets = 512 — the grid is
    register-scale, never data-scale; empty buckets fold in as
    ``coalesce(m, 0)`` ≡ the 2^rho_max empty-bucket term). Days with no
    events estimate 0 via the linear-counting branch. Determinism: the
    md5 ``stable_hash64`` register pipeline and the single-division
    estimate are the exact ones the DuckDB oracle replays.

    Output: (day date, approx_distinct double), one row per calendar day
    in the data span, ordered by day.
    """
    from calp_cva_tracking_pipeline_spark.functions.hashing import (
        stable_hash64,
    )

    w = _HLL_RHO_MAX
    day = F.datediff(
        F.to_date(F.col(ts_col)), F.to_date(F.lit("1970-01-01"))
    )
    hashed = (
        df.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(
            day.alias("__d"),
            stable_hash64(F.col(key_col).cast("string")).alias("h"),
        )
    )
    rho = F.when(F.expr(f"h div {HLL_M}") == 0, F.lit(w)).otherwise(
        F.lit(w) - F.length(F.expr(f"bin(h div {HLL_M})"))
    )
    regs = (
        hashed.withColumn("bucket", F.expr(f"h % {HLL_M}"))
        .withColumn("rho", rho)
        .groupBy("__d", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    bounds = regs.agg(F.min("__d").alias("lo"), F.max("__d").alias("hi"))
    buckets = df.sparkSession.range(HLL_M).select(
        F.col("id").alias("bucket")
    )
    grid = (
        bounds.select(
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("__d")
        )
        .crossJoin(F.broadcast(buckets))
    )
    joined = grid.join(regs, ["__d", "bucket"], "left")
    wspec = (
        Window.partitionBy("bucket")
        .orderBy("__d")
        .rangeBetween(-(window_days - 1), 0)
    )
    merged = joined.withColumn("mm", F.max("m").over(wspec))
    folded = merged.groupBy("__d").agg(
        F.expr(
            f"CAST(sum(CAST(pow(2, {w} - coalesce(mm, 0)) AS BIGINT)) "
            f"AS BIGINT)"
        ).alias("total"),
        F.expr(
            "CAST(sum(CASE WHEN mm IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("zeros"),
    )
    return (
        folded.select(
            F.date_add(
                F.to_date(F.lit("1970-01-01")), F.col("__d").cast("int")
            ).alias("day"),
            F.round(
                F.when(
                    (F.lit(_HLL_NUM) / F.col("total") <= 2.5 * HLL_M)
                    & (F.col("zeros") > 0),
                    F.lit(float(HLL_M))
                    * F.log(F.lit(float(HLL_M)) / F.col("zeros")),
                ).otherwise(F.lit(_HLL_NUM) / F.col("total")),
                6,
            ).alias("approx_distinct"),
        )
        .orderBy("day")
    )
