"""Multi-resolution time rollups (hypertable-style continuous aggregates).

A metrics store keeps the same series at several grains (1m → 1h → 1d);
recomputing each grain from raw events rescans the fact table once per
grain. This operator computes ONLY the finest grain from the facts and
derives every coarser grain from the previous one — legal because the
kept aggregates (count, decimal-exact sum, min, max) are all
re-aggregable, and the decimal money discipline makes the cascade
bit-identical to a direct aggregation at any grain (each raw value is
rounded to cents exactly once, at the finest grain; coarser sums
accumulate exact cent multiples). The catalog oracle pins exactly that
equivalence: a 1m→1h→1d cascade against DuckDB's direct daily rollup.

Scale shape: one shuffle per grain, but each level's input is the
previous level's OUTPUT — at 100 TB of events the 1-minute grain is the
only scan of the facts; the 1-hour level aggregates minutes×keys rows
(~10⁻³ of the facts), the daily level hours×keys. In a streaming
deployment the finest grain is the `windowed_agg` watermarked sink and
the coarser grains run as periodic batch re-aggregations of that sink —
the classic continuous-aggregate split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.numeric import money_sum

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 604800,
}


def _grain_seconds(grain: str) -> int:
    parts = grain.strip().split()
    if len(parts) != 2:
        raise ValueError(f"grain must look like '5 minutes': {grain!r}")
    n, unit = parts
    unit = unit.rstrip("s")
    if unit not in _UNIT_SECONDS or not n.isdigit() or int(n) <= 0:
        raise ValueError(f"unsupported grain: {grain!r}")
    return int(n) * _UNIT_SECONDS[unit]


def rollup_time_hierarchy(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("1 minute", "1 hour", "1 day"),
    keys: tuple[str, ...] = ("event_type",),
) -> dict[str, DataFrame]:
    """{grain: aggregate DataFrame} — each coarser grain derived from the
    finer one. Every level exposes (window_start, *keys, n_events,
    total_value, min_value, max_value). Grains must be strictly
    ascending and each must divide the next (tumbling windows nest only
    then — a 1-day window is exactly 24 1-hour windows).
    """
    secs = [_grain_seconds(g) for g in grains]
    for a, b in zip(secs, secs[1:]):
        if b <= a or b % a != 0:
            raise ValueError(
                f"grains must ascend and nest (each divides the next): "
                f"{grains}"
            )
    out: dict[str, DataFrame] = {}
    finest = (
        events.groupBy(
            F.window(F.col(ts_col), grains[0]).alias("__w"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum(value_col).alias("total_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
            "min_value",
            "max_value",
        )
    )
    out[grains[0]] = finest
    prev = finest
    for grain in grains[1:]:
        prev = (
            prev.groupBy(
                F.window(F.col("window_start"), grain).alias("__w"),
                *[F.col(k) for k in keys],
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                # exact: inputs are exact cent multiples from the level
                # below, so decimal re-accumulation loses nothing
                money_sum(F.col("total_value")).alias("total_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
            )
            .select(
                F.col("__w.start").alias("window_start"),
                *keys,
                "n_events",
                "total_value",
                "min_value",
                "max_value",
            )
        )
        out[grain] = prev
    return out


def rollup_incremental(
    store: DataFrame,
    new_facts: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "1 day",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Continuous-aggregate MAINTENANCE: fold a new fact batch into a
    persisted grain aggregate without rescanning history — the
    ingest-time twin of ``rollup_time_hierarchy`` (which builds the
    store) and the batch shape of a streaming materialized view refresh.

    Only windows the batch touches are re-aggregated: the batch
    collapses to its grain aggregate (batch-cardinality), the touched
    window list broadcasts into a semi/anti split of the store, and the
    merge re-aggregates ``affected ∪ batch`` only — untouched store rows
    pass through without a shuffle. Because every kept statistic is
    re-aggregable and money sums accumulate exact cent multiples
    (decimal discipline), the maintained store is BIT-IDENTICAL to a
    full recompute over history ∪ batch — which is exactly what the
    catalog oracle checks. Ingest cost: O(batch) + O(touched windows),
    independent of store size; with time-ordered arrivals the touched
    set is the last few windows.
    """
    batch_agg = (
        new_facts.groupBy(
            F.window(F.col(ts_col), grain).alias("__w"),
            *[F.col(k) for k in keys],
        )
        .agg(
            F.count("*").alias("n_events"),
            money_sum(value_col).alias("total_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            *keys,
            "n_events",
            "total_value",
            "min_value",
            "max_value",
        )
    )
    touched = batch_agg.select("window_start").distinct()
    affected = store.join(
        F.broadcast(touched), "window_start", "left_semi"
    )
    untouched = store.join(
        F.broadcast(touched), "window_start", "left_anti"
    )
    merged = (
        affected.unionByName(batch_agg)
        .groupBy("window_start", *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            money_sum(F.col("total_value")).alias("total_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return untouched.unionByName(merged)


def gap_fill_locf(
    series: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_cols: tuple[str, ...],
    grain: str = "1 hour",
) -> DataFrame:
    """Dense-grid gap filling with last-observation-carried-forward —
    the ``time_bucket_gapfill`` + ``locf`` idiom of hypertable stores:
    every key gets one row per grain slot between ITS OWN first and last
    observation; missing slots carry the most recent value, plus a
    ``filled`` flag so downstream aggregation can discount imputed rows.

    Input must be at-most-one-row-per (keys, slot) — pre-aggregate with
    ``rollup_time_hierarchy`` first (asserted via the join, which would
    duplicate grid rows otherwise). Assumes ``ts_col`` is already
    slot-aligned (a window start).

    Scale shape: the grid generates from each key's (min, max) — a
    key-cardinality aggregate exploded by ``sequence()``, rows =
    slots·keys (exactly the output size, nothing transient is bigger);
    the observation join is a co-partitioned join on (keys, slot); LOCF
    is one ``last(ignorenulls)`` running window per key — O(1) state,
    any key length streams. Carried values are copied bytes, not
    recomputed floats, so parity is exact by construction.
    """
    secs = _grain_seconds(grain)
    kcols = [F.col(k) for k in keys]
    rng = series.groupBy(*kcols).agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    )
    grid = rng.select(
        *kcols,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {secs} SECONDS"),
            )
        ).alias(ts_col),
    )
    obs = series.select(
        *kcols, F.col(ts_col), F.lit(False).alias("filled"),
        *[F.col(c) for c in value_cols],
    )
    joined = grid.join(obs, [*keys, ts_col], "left")
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*kcols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled_cols = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c)
        for c in value_cols
    ]
    return joined.select(
        *kcols,
        F.col(ts_col),
        F.coalesce(F.col("filled"), F.lit(True)).alias("filled"),
        *filled_cols,
    )


def ohlc_downsample(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    grain: str = "1 hour",
) -> DataFrame:
    """Open/high/low/close downsampling per key × time bucket (the
    financial-candlestick / hypertable ``first``/``last`` idiom).

    open/close are the value of the earliest/latest NON-NULL-value row
    in the bucket — VALUES ARE COPIED, never recomputed, so oracle
    parity is exact with no float discipline needed. Earliest/latest is
    made total by the caller-named ``tiebreak_col`` (a unique row id):
    rows tie on ``ts_col`` ⇒ the smaller/larger tie-break wins, so the
    result is partition-order independent even on non-unique timestamps.

    NULL policy (all four candles agree): rows with a NULL value are
    invisible to open/high/low/close (the struct is built only for
    non-null values, so struct min/max skips those rows exactly as
    min/max skip NULL scalars) but still count in ``n_rows``; a bucket
    of only-NULL values yields NULL candles. Without the guard the
    struct itself would be non-null and open/close could surface a NULL
    value the high/low never see.

    Implementation is a single hash aggregation — ``min``/``max`` over a
    (ts, tiebreak, value) struct resolves open/close because struct
    ordering is lexicographic and ts leads. One exchange carrying only
    (keys, bucket, struct) with full map-side combine; no window, no
    sort, no join. At 100 TB this is the cheapest possible shape: the
    shuffle volume is the number of OUTPUT buckets, not input rows.
    """
    bucket = F.window(F.col(ts_col), grain).start.alias("bucket_start")
    tagged = df.select(
        *keys,
        bucket,
        F.when(
            F.col(value_col).isNotNull(),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tb"),
                F.col(value_col).alias("v"),
            ),
        ).alias("__ohlc"),
        F.col(value_col).alias("__v"),
    )
    return tagged.groupBy(*keys, "bucket_start").agg(
        F.min("__ohlc").getField("v").alias("open_v"),
        F.max("__v").alias("high_v"),
        F.min("__v").alias("low_v"),
        F.max("__ohlc").getField("v").alias("close_v"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def resample_interpolate(
    df: DataFrame,
    keys: tuple[str, ...],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    grain: str = "1 hour",
    round_to: int = 6,
) -> DataFrame:
    """Resample an irregular series onto the regular ``grain`` grid with
    LINEAR interpolation — the numeric companion to ``gap_fill_locf``
    (LOCF holds a step function; interpolation draws the line), the
    hypertable ``interpolate()`` idiom and the standard pre-join
    alignment for sensors sampled on different clocks.

    Semantics: per key, one row per grid instant between that key's
    first and last observation (interior only — extrapolation is a
    modeling decision, not a resample). Observations are first collapsed
    to one value per (key, instant) by last-``tiebreak`` so the input to
    interpolation is a function of time; a grid instant that coincides
    with an observation COPIES its value (``exact`` = true, no float
    path at all), otherwise value = prev + (next−prev)·(t−tp)/(tn−tp)
    evaluated in one fixed double expression and rounded — the same
    cross-engine discipline as every libm-adjacent column.

    Physical shape — the union-window formulation (no join, the asof
    pattern): observations and grid rows union, ONE key exchange, a
    forward and a backward carry window over the same partitioning (two
    Sorts, zero Joins — exactly ``tj_asof_nearest``'s plan family). The
    grid explodes from per-key (min, max) — rows = output size; a
    single hot key's grid is span/grain rows regardless of its
    observation count, and the carry windows hold O(1) state.
    """
    secs = _grain_seconds(grain)
    step = secs * 1_000_000
    kcols = [F.col(k) for k in keys]
    obs = (
        df.filter(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(*kcols, F.unix_micros(F.col(ts_col)).alias("__t"))
        .agg(
            F.expr(f"max_by({value_col}, {tiebreak_col})").alias("__v")
        )
    )
    rng = obs.groupBy(*kcols).agg(
        F.min("__t").alias("__lo"), F.max("__t").alias("__hi")
    )
    # Grid bounds need TRUE ceil/floor over signed epoch micros. `div`
    # truncates toward zero, so (lo + step-1) div step is only ceil for
    # lo >= 0 — with pre-1970 timestamps (negative micros) it lands one
    # step high and drops interior grid instants. Truncation already IS
    # ceil for a negative numerator with remainder (Spark/DuckDB `%`
    # follows the dividend sign), so adjust only the other cases.
    lo_g = F.expr(
        f"(CASE WHEN __lo % {step} > 0 THEN (__lo div {step}) + 1 "
        f"ELSE __lo div {step} END) * {step}"
    )
    hi_g = F.expr(
        f"(CASE WHEN __hi % {step} < 0 THEN (__hi div {step}) - 1 "
        f"ELSE __hi div {step} END) * {step}"
    )
    grid = (
        rng.select(*kcols, lo_g.alias("__glo"), hi_g.alias("__ghi"))
        .filter(F.col("__glo") <= F.col("__ghi"))
        .select(
            *kcols,
            F.explode(
                F.sequence(F.col("__glo"), F.col("__ghi"), F.lit(step))
            ).alias("__t"),
        )
    )
    u = obs.select(
        *kcols,
        "__t",
        F.lit(0).alias("__side"),
        F.col("__v"),
        F.col("__t").alias("__ot"),
    ).unionByName(
        grid.select(
            *kcols,
            "__t",
            F.lit(1).alias("__side"),
            F.lit(None).cast("double").alias("__v"),
            F.lit(None).cast("long").alias("__ot"),
        )
    )
    w_fwd = (
        Window.partitionBy(*kcols)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy(*kcols)
        .orderBy(F.col("__t").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *kcols,
        "__t",
        "__side",
        F.last("__v", ignorenulls=True).over(w_fwd).alias("__pv"),
        F.last("__ot", ignorenulls=True).over(w_fwd).alias("__pt"),
        F.last("__v", ignorenulls=True).over(w_bwd).alias("__nv"),
        F.last("__ot", ignorenulls=True).over(w_bwd).alias("__nt"),
    )
    frac = (F.col("__t") - F.col("__pt")).cast("double") / (
        F.col("__nt") - F.col("__pt")
    ).cast("double")
    value = F.when(F.col("__t") == F.col("__pt"), F.col("__pv")).otherwise(
        F.round(
            F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac, round_to
        )
    )
    return (
        carried.filter(
            (F.col("__side") == 1)
            & F.col("__pv").isNotNull()
            & F.col("__nv").isNotNull()
        )
        .select(
            *kcols,
            F.timestamp_micros(F.col("__t")).alias(ts_col),
            value.alias(value_col),
            (F.col("__t") == F.col("__pt")).alias("exact"),
        )
    )
