"""Dataset profiling: per-column statistics in ONE scan (plus a
histogram pass for exact medians).

The pre-training sanity pass every 100 TB ingest needs — null rates, value
ranges, central tendency — emitted long-format (one row per column) so the
report is schema-stable regardless of how many columns are profiled.

Scale shape, measured not guessed (bench round 6): Spark's builtin exact
``percentile`` aggregate is an ObjectHashAggregate — it buffers every
value row-at-a-time OUTSIDE whole-stage codegen, and profiled 3 columns
of sf0.1 lineitem in 2.76s with an 8.6× sf-scaling ratio (value-buffering
is data-bound). The exact median here instead uses the histogram method:

- per-column (min, max, n) and order-aligned range-bucket counts come
  straight off the pruned raw scan with map-side combine — the
  exchanges carry ≤ _MEDIAN_BUCKETS rows per column;
- bucket-granularity prefix sums locate the straddling values, and only
  the TARGET buckets' rows (a ~1/_MEDIAN_BUCKETS slice each) flow into
  the (col, value) → count aggregation and its within-bucket sort — no
  task ever sorts (or even shuffles) a row-sized histogram; linear
  interpolation matches ``percentile_cont`` exactly.

Cost is two pruned scans plus target-slice aggregation; at full corpus
scale ``exact_median=False`` swaps in ``approx_percentile``'s bounded
sketch inside the single-pass aggregate when a second scan is too much.
The DuckDB oracle pins the exact variant (quantile_cont). Local cost at
sf0.1 beats the naive per-column-window version — and the shape is for
the 1000× version, where the naive window funnels every distinct value
through one task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.functions.numeric import money_avg

_STATS = ("n", "n_null", "min", "max", "mean", "p50")


_MEDIAN_BUCKETS = 1024


def exact_percentiles(
    df: DataFrame,
    cols: list[str],
    ps: list[float],
    round_to: int | None = 6,
) -> DataFrame:
    """→ (col_name, p, value): exact interpolated percentiles
    (percentile_cont semantics) for every column × requested fraction,
    via the two-phase value-histogram method — no per-row aggregation
    buffers AND no row-sized sort, at any number of percentiles for the
    price of one histogram.

    Driver-coordinated two-pass shape (the DuckDB/Presto exact-quantile
    pattern, with the coordinator state provably bounded):

    - Pass 1 collects per-column (min, max, n) — ≤ |cols| rows — and
      embeds them as literals in the order-aligned range-bucket
      projection.
    - Pass 2 collects per-bucket row counts — ≤ _MEDIAN_BUCKETS·|cols|
      rows, map-side-combined before the wire — and the driver's prefix
      scan locates, for EVERY requested percentile, the buckets holding
      its straddling indices (plain Python over ≤ 1024 ints/column; the
      same bounded-sufficient-statistic discipline as the BPE merge
      table and the covariance d² collect).
    - The final distributed pass aggregates (col, value) → count over
      ONLY the target buckets' rows (~2·|ps| buckets ≈ a
      1/_MEDIAN_BUCKETS data fraction each), runs the within-bucket
      running-count window, and interpolates against the broadcast
      target indices. A continuous column's full value histogram is
      row-sized; no version of it is ever shuffled or sorted in one
      task.

    (Two earlier drafts measured worse: deriving ranges/bucket totals
    from a first-class histogram DataFrame replans the histogram
    pipeline once per consumer — Spark exchange reuse does not fire
    across those subtrees, 4 scans + 4 histogram shuffles at sf0.1;
    keeping the statistics as broadcast DataFrames instead of collects
    still leaves 6 scans + 9 exchanges of independently re-planned
    subtrees. The collects make each statistic a literal, so the final
    plan is ONE linear pipeline.)
    """
    if not ps or not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError(f"percentiles must be within [0,1]: {ps}")
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)")
    ).filter(F.col("val").isNotNull())
    return _percentiles_from_long(long, ps, round_to)


def _percentiles_from_long(
    long: DataFrame,
    ps: list[float],
    round_to: int | None,
) -> DataFrame:
    """The two-phase value-histogram percentile kernel over an arbitrary
    (col_name, val) long frame — shared by ``exact_percentiles`` (key =
    column) and ``grouped_exact_medians`` (key = group × column), so the
    grouped form is the same audited machinery, not a fork. Driver
    state stays ≤ (range rows + _MEDIAN_BUCKETS·bucket counts) per
    distinct key. (A round-14 draft took a precomputed ``rng`` so
    profile_columns could skip pass 1; that fusion measured WORSE —
    2.2→3.3s, the decimal-mean job serialized onto the critical path —
    and was rejected, so the parameter was removed rather than left as
    an untested branch.)"""
    spark = long.sparkSession
    # pass 1: per-column range + count (≤ |cols| rows to the driver)
    rng = {
        r["col_name"]: (r["lo"], r["hi"], r["n"])
        for r in long.groupBy("col_name")
        .agg(
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    # columns with zero non-null rows vanish here — and from the output,
    # matching quantile_cont over an empty relation
    if not rng:
        return spark.createDataFrame(
            [], "col_name string, p double, value double"
        )
    B = _MEDIAN_BUCKETS

    # Bucket-key dispatch (advisor r13 + bench follow-up): above a few
    # dozen keys the collected ranges re-enter as a BROADCAST local
    # relation — with the grouped kernel the key count is groups·cols,
    # and a when-branch per key makes the bucket pass O(rows·keys)
    # interpreted comparisons with a multi-thousand-node expression
    # tree. For the ungrouped profile's handful of keys the literal
    # CASE chain stays (measured ~0.3s/pass cheaper at sf0.1 — no join
    # stage at all). Both spell the IDENTICAL IEEE bucket arithmetic
    # ((val−lo)/rng·B with rng pre-subtracted in Python), so the
    # dispatch cannot change results.
    if len(rng) <= 32:

        def bucketed(frame: DataFrame) -> DataFrame:
            e = None
            for c, (lo, hi, _n) in rng.items():
                if hi - lo <= 0:
                    be = F.lit(0)
                else:
                    be = F.least(
                        F.floor(
                            (F.col("val") - F.lit(lo))
                            / F.lit(hi - lo)
                            * B
                        ).cast("int"),
                        F.lit(B - 1),
                    )
                cond = F.col("col_name") == c
                e = F.when(cond, be) if e is None else e.when(cond, be)
            return frame.withColumn("__b", e)

    else:
        rng_rel = spark.createDataFrame(
            [
                (c, float(lo), float(hi - lo))
                for c, (lo, hi, _n) in rng.items()
            ],
            "col_name string, __lo double, __rng double",
        )

        def bucketed(frame: DataFrame) -> DataFrame:
            be = F.when(F.col("__rng") <= 0, F.lit(0)).otherwise(
                F.least(
                    F.floor(
                        (F.col("val") - F.col("__lo"))
                        / F.col("__rng")
                        * B
                    ).cast("int"),
                    F.lit(B - 1),
                )
            )
            return (
                frame.join(F.broadcast(rng_rel), "col_name")
                .withColumn("__b", be)
                .drop("__lo", "__rng")
            )

    # pass 2: per-bucket counts (≤ B·|cols| rows to the driver)
    btot_rows = (
        bucketed(long)
        .groupBy("col_name", "__b")
        .agg(F.count("*").alias("bcnt"))
        .collect()
    )
    buckets: dict[str, list[tuple[int, int]]] = {}
    for r in btot_rows:
        buckets.setdefault(r["col_name"], []).append((r["__b"], r["bcnt"]))
    # driver prefix scan: element k of a column lives in the bucket with
    # cum_before <= k < cum_before + bcnt, then (after a within-bucket
    # running count) in the value row with vcum - cnt <= k < vcum
    import math

    ps_sorted = sorted(set(float(p) for p in ps))
    tgt_rows = []  # (col_name, p, idx, lo_i, hi_i)
    tb_rows = []  # (col_name, __b, cum_before)
    for c, blist in buckets.items():
        blist.sort()
        cum = []
        acc = 0
        for b, cnt in blist:
            cum.append((b, acc, cnt))
            acc += cnt
        n = rng[c][2]
        want: dict[int, int] = {}
        for p in ps_sorted:
            idx = (n - 1) * p
            lo_i, hi_i = math.floor(idx), math.ceil(idx)
            tgt_rows.append((c, p, float(idx), lo_i, hi_i))
            for k in (lo_i, hi_i):
                for b, before, cnt in cum:
                    if before <= k < before + cnt:
                        want[b] = before
                        break
        tb_rows.extend((c, b, before) for b, before in sorted(want.items()))
    tb = spark.createDataFrame(
        tb_rows, "col_name string, __b int, cum_before long"
    )
    tgt = spark.createDataFrame(
        tgt_rows, "col_name string, p double, idx double, lo_i long, hi_i long"
    )
    # final pass: only target-bucket rows aggregate and sort
    wv = Window.partitionBy("col_name", "__b").orderBy("val")
    inb = (
        bucketed(long.select("col_name", "val"))
        .join(F.broadcast(tb), ["col_name", "__b"])
        .groupBy("col_name", "__b", "cum_before", "val")
        .agg(F.count("*").alias("cnt"))
        .withColumn("vcum", F.col("cum_before") + F.sum("cnt").over(wv))
    )
    j = inb.join(F.broadcast(tgt), "col_name")
    pick = lambda i: F.max(  # noqa: E731 — tiny aggregate selector
        F.when(
            ((F.col("vcum") - F.col("cnt")) <= i) & (i < F.col("vcum")),
            F.col("val"),
        )
    )
    value = F.col("__lo") + F.col("__frac") * (F.col("__hi") - F.col("__lo"))
    if round_to is not None:
        value = F.round(value, round_to)
    return (
        j.groupBy("col_name", "p")
        .agg(
            pick(F.col("lo_i")).alias("__lo"),
            pick(F.col("hi_i")).alias("__hi"),
            F.first(F.col("idx") - F.col("lo_i")).alias("__frac"),
        )
        .select("col_name", "p", value.alias("value"))
        .orderBy("col_name", "p")
    )


def _exact_medians(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, p50) — the profile_columns median via the general
    exact_percentiles kernel (unrounded here; profile_columns rounds)."""
    return exact_percentiles(df, cols, [0.5], round_to=None).select(
        "col_name", F.col("value").alias("p50")
    )


# joint-key separator + NULL-group sentinel for the grouped median kernel;
# group values may not contain chr(31)/chr(0) (the dp_noisy_counts key
# discipline — a separator occurring IN a value would alias two keys)
_GRP_SEP = "\x1f"
_GRP_NULL = "\x00\x00"


def grouped_exact_medians(
    df: DataFrame,
    group_col: str,
    cols: list[str],
    round_to: int | None = 6,
) -> DataFrame:
    """→ (group, col_name, median): EXACT interpolated per-group medians
    via the two-phase value-histogram kernel lifted to grouped form —
    the (group × column) pair becomes the histogram key, so the bounded
    driver statistics grow to groups·cols range rows and
    ≤ _MEDIAN_BUCKETS·groups·cols bucket counts (source/language groups
    are ≤ 10³ in practice — the same bounded-sufficient-statistic
    discipline as the ungrouped kernel), and NO per-group sort of row
    data ever happens: the final pass touches only the straddling
    buckets' rows, ~1/_MEDIAN_BUCKETS of each group.

    NULL groups are a real category (SQL GROUP BY semantics) — encoded
    through a sentinel and decoded back to NULL on output. NULL values
    drop per column, matching quantile_cont; a (group, column) with
    zero non-null values is absent (callers left-join and read NULL).
    """
    out = grouped_exact_percentiles(
        df, group_col, cols, [0.5], round_to=round_to
    )
    return out.select(
        group_col, "col_name", F.col("value").alias("median")
    )


def grouped_exact_percentiles(
    df: DataFrame,
    group_col: str,
    cols: list[str],
    ps: list[float],
    round_to: int | None = 6,
) -> DataFrame:
    """→ (group, col_name, p, value): EXACT interpolated per-group
    percentiles for an arbitrary percentile set — the grouped-median
    kernel generalized (``grouped_exact_medians`` is now the ps=[0.5]
    wrapper): the (group × column) pair is the histogram key, all the
    bounded-driver-statistic guarantees of that docstring apply
    unchanged, and every requested percentile reads off the SAME two
    collected passes (the multi-p discipline of ``exact_percentiles``
    — p10/p50/p90 cost one kernel run, not three)."""
    gs = F.col(group_col).cast("string")
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    long = (
        df.select(
            F.coalesce(gs, F.lit(_GRP_NULL)).alias("__g"),
            F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)"),
        )
        .filter(F.col("val").isNotNull())
        .select(
            F.concat(
                F.col("__g"), F.lit(_GRP_SEP), F.col("col_name")
            ).alias("col_name"),
            "val",
        )
    )
    out = _percentiles_from_long(long, ps, round_to)
    grp = F.substring_index("col_name", _GRP_SEP, 1)
    return out.select(
        F.when(grp == _GRP_NULL, F.lit(None).cast("string"))
        .otherwise(grp)
        .alias(group_col),
        F.substring_index("col_name", _GRP_SEP, -1).alias("col_name"),
        "p",
        "value",
    )


def profile_columns(
    df: DataFrame, cols: list[str], exact_median: bool = True
) -> DataFrame:
    """→ (col_name, n, n_null, min, max, mean, p50), one row per profiled
    numeric column, ordered by column name. mean runs through the exact
    decimal accumulator (functions.numeric.money_avg); min/max/median are
    exact doubles; everything float-y is rounded to 6 dp for cross-engine
    hash stability.

    Shape note (round-14, VERDICT r13 ask #2 — measured and kept AS-IS;
    do not re-try the rejected fusions): the exact-median profile is 3
    jobs (range collect, bucket collect, final execution whose stats
    scan and percentile scan run as PARALLEL stages of one job).
    Two "fewer scans" rewrites both measured SLOWER at sf0.1 in
    interleaved A/B runs: (a) collecting the wide stats row up front
    to feed the median kernel's ranges (2.2s → 3.3s — the decimal-mean
    job serializes onto the critical path that the lazy form overlaps
    with the final pass), and (b) stacking to a localCheckpointed
    (col_name, val) frame scanned once (2.6s → 4.5s and degrading —
    the 7× stacked materialization costs more than three pruned
    re-scans). The job-floor-bound local ratio vs DuckDB is the
    documented cost of the bounded-driver-statistic design that holds
    at 100 TB."""
    if not cols:
        raise ValueError("profile_columns: no columns given")
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.extend(
            [
                F.count(col).alias(f"{c}__n"),
                (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__n_null"),
                F.round(F.min(col), 6).alias(f"{c}__min"),
                F.round(F.max(col), 6).alias(f"{c}__max"),
                F.round(money_avg(c), 6).alias(f"{c}__mean"),
            ]
            + (
                []
                if exact_median
                else [
                    F.round(
                        F.expr(f"approx_percentile(`{c}`, 0.5d, 10000)"), 6
                    ).alias(f"{c}__p50")
                ]
            )
        )
    wide = df.agg(*aggs)
    base_stats = [s for s in _STATS if s != "p50" or not exact_median]
    stack_args = ", ".join(
        "'{c}', {fields}".format(
            c=c,
            fields=", ".join(
                f"cast(`{c}__{s}` as double)" for s in base_stats
            ),
        )
        for c in cols
    )
    stacked = wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(col_name, {', '.join(base_stats)})"
        )
    )
    if exact_median:
        med = _exact_medians(df, cols).withColumn(
            "p50", F.round("p50", 6)
        )
        stacked = stacked.join(F.broadcast(med), "col_name", "left")
    return stacked.select(
        "col_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        "min",
        "max",
        "mean",
        "p50",
    ).orderBy("col_name")


PSI_BUCKETS = 10
PSI_FLOOR = 1e-6


def population_stability(
    df: DataFrame,
    cols: list[str],
    slice_col: Column,
    n_buckets: int = PSI_BUCKETS,
    floor: float = PSI_FLOOR,
) -> DataFrame:
    """Population Stability Index between two data slices → (col_name,
    psi, n_base, n_cur): the standard drift monitor for a feature /
    training-data distribution. ``slice_col`` must evaluate to 0 (base)
    or 1 (current); PSI = Σ_buckets (p-q)·ln(p/q) over ``n_buckets``
    equal-width buckets spanning the GLOBAL min/max of both slices.
    Rule of thumb: <0.1 stable, 0.1–0.25 drifting, >0.25 broken.

    Proportions are floored at ``floor`` before the log (the standard
    empty-bucket smoothing — PSI is infinite on a bucket one slice never
    hits), so psi is defined for disjoint distributions too.

    Scale shape: one stacked scan → per-column global min/max (tiny
    broadcast) → bucket id as a pure projection → (col, bucket, slice)
    counts with map-side combine — the shuffle carries ≤ cols·buckets·2
    rows. Slice totals and per-bucket terms run on that bucket-sized
    table (windows over ≤ 2·buckets rows per column); per-bucket terms
    round to 9 dp and sum as integer nano-units, order-exact
    cross-engine.
    """
    long = _psi_long(df, cols, slice_col)
    rng = long.groupBy("col_name").agg(
        F.min("val").alias("__lo"), F.max("val").alias("__hi")
    )
    counts = _psi_cells(long, rng, n_buckets)
    return psi_from_bucket_counts(counts, floor=floor)


def population_stability_by(
    df: DataFrame,
    group_col: str,
    cols: list[str],
    slice_col: Column,
    n_buckets: int = PSI_BUCKETS,
    floor: float = PSI_FLOOR,
) -> DataFrame:
    """PER-GROUP PSI — ``population_stability`` lifted to grouped form
    (the grouped-percentile kernel's sentinel-key discipline): each
    (group × column) pair becomes the histogram key, bucket edges span
    THAT group's own global min/max, and the per-bucket nano-unit
    terms sum per (group, column). The per-segment drift monitor a
    global PSI hides (one segment drifting inside a stable aggregate).
    Group keys compare AS STRINGS; NULL groups are a real category.
    Output: (group, col_name, psi, n_base, n_cur), ordered. Engine
    addition; no reference counterpart."""
    gs = F.col(group_col).cast("string")
    keyed = df.withColumn(
        "__psi_g", F.coalesce(gs, F.lit(_GRP_NULL))
    )
    # _psi_long's stack drops extra columns — build the long frame with
    # the group key carried through
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    long = (
        keyed.select(
            "__psi_g",
            F.expr(
                f"stack({len(cols)}, {stack_args}) AS (col_name, val)"
            ),
            slice_col.cast("int").alias("slice"),
        )
        .filter(F.col("val").isNotNull())
        .select(
            F.concat(
                F.col("__psi_g"), F.lit(_GRP_SEP), F.col("col_name")
            ).alias("col_name"),
            "val",
            "slice",
        )
    )
    rng = long.groupBy("col_name").agg(
        F.min("val").alias("__lo"), F.max("val").alias("__hi")
    )
    counts = _psi_cells(long, rng, n_buckets)
    out = psi_from_bucket_counts(counts, floor=floor)
    grp = F.substring_index("col_name", _GRP_SEP, 1)
    return out.select(
        F.when(grp == _GRP_NULL, F.lit(None).cast("string"))
        .otherwise(grp)
        .alias(group_col),
        F.substring_index("col_name", _GRP_SEP, -1).alias("col_name"),
        "psi",
        "n_base",
        "n_cur",
    ).orderBy(group_col, "col_name")


def _psi_long(df: DataFrame, cols: list[str], slice_col: Column) -> DataFrame:
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    return df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)"),
        slice_col.cast("int").alias("slice"),
    ).filter(F.col("val").isNotNull())


def _psi_cells(long: DataFrame, rng: DataFrame, n_buckets: int) -> DataFrame:
    span = F.col("__hi") - F.col("__lo")
    bucket = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("val") - F.col("__lo")) / span * n_buckets
            ).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    return (
        long.join(F.broadcast(rng), "col_name")
        .select("col_name", "slice", bucket.alias("bucket"))
        .groupBy("col_name", "bucket", "slice")
        .agg(F.count("*").alias("cnt"))
    )


def psi_bucket_cells(
    df: DataFrame,
    cols: list[str],
    slice_col: Column,
    ranges: dict[str, tuple[float, float]],
    n_buckets: int = PSI_BUCKETS,
) -> DataFrame:
    """Per-batch (col_name, bucket, slice, cnt) PSI cells under FIXED
    per-column (lo, hi) ranges — the map half of the streaming PSI
    resident. Fixed edges are what make the cells fold additively
    across micro-batches; the batch operator derives edges from the
    global min/max instead (a pinned reference range is the standard
    drift-monitor setup — the monitored stream is compared against a
    KNOWN reference distribution)."""
    long = _psi_long(df, cols, slice_col)
    rng = df.sparkSession.createDataFrame(
        [(c, float(lo), float(hi)) for c, (lo, hi) in ranges.items()],
        "col_name string, __lo double, __hi double",
    )
    return _psi_cells(long, rng, n_buckets)


def psi_from_bucket_counts(
    counts: DataFrame,
    floor: float = PSI_FLOOR,
) -> DataFrame:
    """PSI readout from a PRE-AGGREGATED (col_name, bucket, slice, cnt)
    ledger — the streaming-foldable half of ``population_stability``:
    bucket cells fold ADDITIVELY across micro-batches (append per-batch
    cells, sum counts per cell) provided the bucket edges were fixed up
    front (``psi_bucket_cells``). foreachBatch ledger + this kernel ≡
    the one-shot readout — the dq_checks / kappa_from_contingency /
    cusum_fold discipline (tests/test_streaming.py)."""
    counts = (
        counts.select(
            "col_name",
            F.col("bucket").cast("int").alias("bucket"),
            F.col("slice").cast("int").alias("slice"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
        .groupBy("col_name", "bucket", "slice")
        .agg(F.sum("cnt").alias("cnt"))
    )
    tot_w = Window.partitionBy("col_name", "slice")
    frac = F.col("cnt") / F.sum("cnt").over(tot_w)
    fractions = counts.select(
        "col_name",
        "bucket",
        "slice",
        frac.alias("frac"),
        F.col("cnt"),
    )
    # one row per (col, bucket) with both slices' floored proportions;
    # buckets hit by neither slice do not exist and contribute 0 anyway
    per_bucket = fractions.groupBy("col_name", "bucket").agg(
        F.greatest(
            F.coalesce(
                F.max(F.when(F.col("slice") == 0, F.col("frac"))),
                F.lit(0.0),
            ),
            F.lit(float(floor)),
        ).alias("p"),
        F.greatest(
            F.coalesce(
                F.max(F.when(F.col("slice") == 1, F.col("frac"))),
                F.lit(0.0),
            ),
            F.lit(float(floor)),
        ).alias("q"),
        F.sum(F.when(F.col("slice") == 0, F.col("cnt"))).alias("__na"),
        F.sum(F.when(F.col("slice") == 1, F.col("cnt"))).alias("__nb"),
    )
    term = (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
    nano = F.round(F.round(term, 9) * 1e9, 0).cast("long")
    return (
        per_bucket.select(
            "col_name",
            nano.alias("__nano"),
            F.coalesce("__na", F.lit(0)).alias("__na"),
            F.coalesce("__nb", F.lit(0)).alias("__nb"),
        )
        .groupBy("col_name")
        .agg(
            F.round(F.sum("__nano") / F.lit(1e9), 6).alias("psi"),
            F.sum("__na").alias("n_base"),
            F.sum("__nb").alias("n_cur"),
        )
    )


def ks_drift(
    df: DataFrame,
    cols: list[str],
    slice_col: Column,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two data slices →
    (col_name, ks, n_base, n_cur): the exact, bucket-free companion to
    ``population_stability`` — PSI quantizes into fixed buckets (a shift
    smaller than a bucket is invisible and the statistic depends on the
    bucket count), KS is the sup-gap between the two EMPIRICAL CDFs, so
    it sees any shift and is distribution-free (D·sqrt(n) has a known
    null law, the classical drift test).

    Exactness: the sup over x of |F_base(x) − F_cur(x)| is attained at an
    observed value of either slice, evaluated after absorbing that
    value's ties — so max over the union of distinct values of the
    post-tie CDF gap IS the classical two-sided D (what scipy's ks_2samp
    computes). Gaps compare as exact integers — |cumA·nB − cumB·nA| in
    DECIMAL(38,0), one float division at the very end — so the result is
    bit-stable across engines and partitionings.

    Scale shape: same driver-coordinated discipline as
    ``exact_percentiles``, with pass 1 STACK-FREE since round 15 (the
    r13 fuse-the-passes ask): a wide aggregate — 5 expressions per
    column over the raw rows, no |cols|× stacked row blow-up —
    collects range + slice totals into bucket-projection literals, so
    only passes 2 and 3 pay the stack. Pass 2 collects per-(bucket,
    slice) counts (≤ _MEDIAN_BUCKETS·|cols| rows, map-side-combined)
    whose driver prefix scan becomes a broadcast offsets table, and
    the one genuinely histogram-sized exchange is the final pass's
    (col, value) → per-slice-count aggregation the sup-gap needs
    (every distinct value is a candidate argmax — unlike percentiles
    there is no target-bucket shrink), followed by within-bucket
    running windows. (An eager-localCheckpoint variant sharing ONE
    stacked pass between pass 2 and the final measured SLOWER
    interleaved at sf0.1 — 2.8s vs 2.6s — the materialization barrier
    plus block IO outweigh the saved scan, and checkpoint blocks die
    with their executor; measured and rejected, do not re-try.) No
    column's full histogram ever sorts in one task; the naive
    alternative — one window ordered by value partitioned only by
    column — is exactly the single-reducer sort the percentile
    kernel's docstring rules out.
    """
    spark = df.sparkSession
    # pass 1: stack-free per-column range + per-slice totals (1 row)
    s_int = slice_col.cast("int")
    wide_aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        wide_aggs += [
            F.min(v).alias(f"__lo_{c}"),
            F.max(v).alias(f"__hi_{c}"),
            F.sum(
                F.when(v.isNotNull() & (s_int == 0), 1).otherwise(0)
            ).alias(f"__na_{c}"),
            F.sum(
                F.when(v.isNotNull() & (s_int == 1), 1).otherwise(0)
            ).alias(f"__nb_{c}"),
            F.count(v).alias(f"__n_{c}"),
        ]
    wrow = df.agg(*wide_aggs).collect()[0]
    rng = {
        c: (
            wrow[f"__lo_{c}"],
            wrow[f"__hi_{c}"],
            wrow[f"__na_{c}"],
            wrow[f"__nb_{c}"],
        )
        for c in cols
        if wrow[f"__n_{c}"] > 0
    }
    if not rng:
        return spark.createDataFrame(
            [], "col_name string, ks double, n_base bigint, n_cur bigint"
        )
    B = _MEDIAN_BUCKETS
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in cols)
    long = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (col_name, val)"),
        s_int.alias("slice"),
    ).filter(F.col("val").isNotNull())
    ca_row = F.when(F.col("slice") == 0, 1).otherwise(0)
    cb_row = F.when(F.col("slice") == 1, 1).otherwise(0)

    def _bucket_expr():
        e = None
        for c, (lo, hi, _na, _nb) in rng.items():
            if hi - lo <= 0:
                be = F.lit(0)
            else:
                be = F.least(
                    F.floor(
                        (F.col("val") - F.lit(lo)) / F.lit(hi - lo) * B
                    ).cast("int"),
                    F.lit(B - 1),
                )
            cond = F.col("col_name") == c
            e = F.when(cond, be) if e is None else e.when(cond, be)
        return e

    # pass 2: per-(bucket, slice) counts → driver prefix scan →
    # broadcast offsets table (≤ B·|cols| rows)
    btot_rows = (
        long.select("col_name", _bucket_expr().alias("__b"), "slice")
        .groupBy("col_name", "__b")
        .agg(F.sum(ca_row).alias("bca"), F.sum(cb_row).alias("bcb"))
        .collect()
    )
    buckets: dict[str, list[tuple[int, int, int]]] = {}
    for r in btot_rows:
        buckets.setdefault(r["col_name"], []).append(
            (r["__b"], r["bca"], r["bcb"])
        )
    off_rows = []
    for c, blist in buckets.items():
        blist.sort()
        acc_a = acc_b = 0
        for b, bca, bcb in blist:
            na, nb = rng[c][2], rng[c][3]
            off_rows.append((c, b, acc_a, acc_b, na, nb))
            acc_a += bca
            acc_b += bcb
    off = spark.createDataFrame(
        off_rows,
        "col_name string, __b int, ca_before long, cb_before long,"
        " na long, nb long",
    )
    # final pass: the one histogram-sized exchange + within-bucket
    # CDFs. The offsets join lands AFTER the value-grain aggregation
    # (r14): joined before, every pre-shuffle row carried the 4 offset
    # longs through the exchange; post-agg the join touches only
    # distinct-value rows.
    hb = (
        long.select(
            "col_name", "val", "slice", _bucket_expr().alias("__b")
        )
        .groupBy("col_name", "__b", "val")
        .agg(
            F.sum(ca_row).alias("ca"),
            F.sum(cb_row).alias("cb"),
        )
        .join(F.broadcast(off), ["col_name", "__b"])
    )
    wv = Window.partitionBy("col_name", "__b").orderBy("val")
    cuma = F.col("ca_before") + F.sum("ca").over(wv)
    cumb = F.col("cb_before") + F.sum("cb").over(wv)
    dec = "decimal(19,0)"
    gap = F.abs(
        cuma.cast(dec) * F.col("nb").cast(dec)
        - cumb.cast(dec) * F.col("na").cast(dec)
    )
    per_value = hb.select("col_name", "na", "nb", gap.alias("__gap"))
    return (
        per_value.groupBy("col_name")
        .agg(
            F.max("__gap").alias("__g"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
        .select(
            "col_name",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.round(
                    F.col("__g").cast("double")
                    / (F.col("na").cast("double") * F.col("nb").cast("double")),
                    6,
                ),
            ).alias("ks"),
            F.col("na").cast("bigint").alias("n_base"),
            F.col("nb").cast("bigint").alias("n_cur"),
        )
        .orderBy("col_name")
    )


def ks_from_value_counts(ledger: DataFrame) -> DataFrame:
    """Exact two-sample KS from a PRE-AGGREGATED (col_name, val, slice,
    cnt) value ledger — the streaming-foldable half of ``ks_drift``:
    per-(value, slice) counts fold ADDITIVELY across micro-batches
    (append per-batch cells, sum counts per cell), so a foreachBatch
    ledger + this kernel equals the one-shot readout — the
    kappa_from_contingency / cusum_fold discipline
    (tests/test_streaming.py).

    The sup-gap math is bit-identical to ``ks_drift``'s: ties absorb by
    grouping per value first, gaps compare as integer cum-count
    cross-products in DECIMAL(19,0), one float division at the very
    end — so the fold result equals the batch result on the same rows.

    Scale note: the readout windows partition by col_name ONLY — fine
    for a ledger (already value-aggregated, one row per distinct value)
    but exactly the single-reducer raw-data sort ``ks_drift``'s
    bucketed passes exist to avoid; use ``ks_drift`` for batch data.
    Streams over continuous doubles should quantize upstream (e.g.
    round to 6 dp) to bound the ledger.
    """
    led = (
        ledger.select(
            "col_name",
            F.col("val").cast("double").alias("val"),
            F.col("slice").cast("int").alias("slice"),
            F.col("cnt").cast("bigint").alias("cnt"),
        )
        .groupBy("col_name", "val")
        .agg(
            F.sum(
                F.when(F.col("slice") == 0, F.col("cnt")).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col("slice") == 1, F.col("cnt")).otherwise(0)
            ).alias("cb"),
        )
    )
    wv = Window.partitionBy("col_name").orderBy("val")
    wall = Window.partitionBy("col_name")
    cuma = F.sum("ca").over(wv)
    cumb = F.sum("cb").over(wv)
    na = F.sum("ca").over(wall)
    nb = F.sum("cb").over(wall)
    dec = "decimal(19,0)"
    gap = F.abs(
        cuma.cast(dec) * nb.cast(dec) - cumb.cast(dec) * na.cast(dec)
    )
    per_value = led.select(
        "col_name", na.alias("na"), nb.alias("nb"), gap.alias("__gap")
    )
    return (
        per_value.groupBy("col_name")
        .agg(
            F.max("__gap").alias("__g"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
        )
        .select(
            "col_name",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.round(
                    F.col("__g").cast("double")
                    / (
                        F.col("na").cast("double")
                        * F.col("nb").cast("double")
                    ),
                    6,
                ),
            ).alias("ks"),
            F.col("na").cast("bigint").alias("n_base"),
            F.col("nb").cast("bigint").alias("n_cur"),
        )
        .orderBy("col_name")
    )


def mutual_info_pairs(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise mutual information between low-cardinality categorical
    columns → (col_a, col_b, n, mi_nats, nmi): the feature-relevance /
    redundancy screen next to ``null_pattern_phi`` (that one scores
    MISSINGNESS co-occurrence; this scores VALUE dependence — which
    metadata columns duplicate each other, which actually carry
    signal). NMI = MI / √(H_a·H_b), NULL when either marginal entropy
    is 0 (a constant column carries no information to normalize by).

    One stacked pass: every row emits its C(k,2) column-pair value
    tuples through a single explode, cells aggregate map-side at
    pair × |A| × |B| cardinality, the pair total and both marginals
    ride windows over that cell table (one (pair) exchange), and every
    MI / entropy term pins to integer NANO-nats per cell before its
    pair-keyed sum — order-independent and engine-exact. Rows where
    either column is NULL are excluded per pair (standard contingency
    practice).
    """
    names = [str(c) for c in cols]
    pair_structs = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            pair_structs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(a).cast("string").alias("va"),
                    F.col(b).cast("string").alias("vb"),
                )
            )
    cells = (
        df.select(F.explode(F.array(*pair_structs)).alias("p"))
        .select("p.col_a", "p.col_b", "p.va", "p.vb")
        .filter(F.col("va").isNotNull() & F.col("vb").isNotNull())
        .groupBy("col_a", "col_b", "va", "vb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wp = Window.partitionBy("col_a", "col_b")
    wa = Window.partitionBy("col_a", "col_b", "va")
    wb = Window.partitionBy("col_a", "col_b", "vb")
    wra = Window.partitionBy("col_a", "col_b", "va").orderBy("vb")
    wrb = Window.partitionBy("col_a", "col_b", "vb").orderBy("va")
    t = (
        cells.withColumn("__n", F.sum("c").over(wp))
        .withColumn("__na", F.sum("c").over(wa))
        .withColumn("__nb", F.sum("c").over(wb))
        .withColumn("__rna", F.row_number().over(wra))
        .withColumn("__rnb", F.row_number().over(wrb))
    )
    nD = F.col("__n").cast("double")
    cD = F.col("c").cast("double")
    naD = F.col("__na").cast("double")
    nbD = F.col("__nb").cast("double")

    def nano(term):
        return F.round(F.round(term, 9) * 1e9, 0).cast("long")

    mi_pin = nano((cD / nD) * F.log(nD * cD / (naD * nbD)))
    ha_pin = nano((naD / nD) * F.log(naD / nD) * F.lit(-1.0))
    hb_pin = nano((nbD / nD) * F.log(nbD / nD) * F.lit(-1.0))
    agg = t.groupBy("col_a", "col_b").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(mi_pin).alias("__mi"),
        F.sum(F.when(F.col("__rna") == 1, ha_pin)).alias("__ha"),
        F.sum(F.when(F.col("__rnb") == 1, hb_pin)).alias("__hb"),
    )
    mi = F.greatest(F.col("__mi"), F.lit(0)).cast("double") / F.lit(1e9)
    denom = F.sqrt(
        F.col("__ha").cast("double") * F.col("__hb").cast("double")
    )
    nmi = F.when(
        (F.col("__ha") > 0) & (F.col("__hb") > 0),
        F.round(
            F.greatest(F.col("__mi"), F.lit(0)).cast("double") / denom, 6
        ),
    )
    return agg.select(
        "col_a",
        "col_b",
        "n",
        F.round(mi, 6).alias("mi_nats"),
        nmi.alias("nmi"),
    ).orderBy("col_a", "col_b")


def anova_oneway(
    df: DataFrame, group_col: str, value_cols: list[str]
) -> DataFrame:
    """One-way ANOVA across ALL groups per metric → (col_name, k, n,
    f_stat, eta_sq, ss_between, ss_within): the k-group generalization
    of ``ab_test_summary``'s pairwise Welch readout — does the grouping
    explain variance at all, before pairwise drill-down.

    Moment discipline (the pf_ab_test overflow lesson): values round to
    WHOLE units, per-(col, group) moments (n, Σx, Σx²) aggregate as
    exact 64-bit integers in ONE stacked map-side-combined pass, and
    each group's between-sum term (Σx)²/n — too large to square in
    int64 — rounds back to a whole-unit integer per group BEFORE the
    k-bounded sum, so every cross-row aggregation is integer-exact and
    order-independent; the final F/η² are fixed-order double
    expressions over those integers. Groups or metrics that are NULL
    drop per standard contingency practice; F is NULL when k < 2,
    n ≤ k, or SSW = 0 (degenerate designs).
    """
    stack_args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in value_cols)
    long = (
        df.filter(F.col(group_col).isNotNull())
        .select(
            F.col(group_col).cast("string").alias("__g"),
            F.expr(
                f"stack({len(value_cols)}, {stack_args})"
                " AS (col_name, val)"
            ),
        )
        .filter(F.col("val").isNotNull())
        .select(
            "col_name",
            "__g",
            F.round(F.col("val"), 0).cast("long").alias("__x"),
        )
    )
    moments = long.groupBy("col_name", "__g").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__s1"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__s2"),
    )
    s1d = F.col("__s1").cast("double")
    nd = F.col("__n").cast("double")
    bterm = F.round(s1d * s1d / nd, 0).cast("long")
    agg = moments.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("__n").cast("bigint").alias("n"),
        F.sum("__s1").cast("long").alias("__S1"),
        F.sum("__s2").cast("long").alias("__S2"),
        F.sum(bterm).cast("long").alias("__B"),
    )
    Nd = F.col("n").cast("double")
    S1d = F.col("__S1").cast("double")
    grand = S1d * S1d / Nd
    sst = F.col("__S2").cast("double") - grand
    ssb = F.col("__B").cast("double") - grand
    ssw = sst - ssb
    kd = F.col("k").cast("double")
    f_ok = (
        (F.col("k") > 1) & (Nd > kd) & (ssw > 0)
    )
    f_stat = F.when(
        f_ok, F.round((ssb / (kd - 1)) / (ssw / (Nd - kd)), 6)
    )
    eta = F.when(sst > 0, F.round(ssb / sst, 6))
    return agg.select(
        "col_name",
        "k",
        "n",
        f_stat.alias("f_stat"),
        eta.alias("eta_sq"),
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
    ).orderBy("col_name")


def dataset_card(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str,
    source_col: str,
    short_tokens: int = 20,
) -> DataFrame:
    """One-row dataset card — the summary block every training-data
    release ships (what a consumer reads before any per-column drill
    into ``profile_columns``): corpus size, token mass, duplication,
    language balance, shortness.

    Output: (n_docs, n_sources, n_langs, total_tokens, total_chars,
    exact_dup_ppm = 1e6·(1 − distinct md5 / docs-with-text),
    lang_entropy_nats 6dp over the language distribution (nano-pinned
    terms, order-independent), mean_doc_tokens 6dp, short_doc_ppm =
    docs under ``short_tokens`` tokens). Two bounded stages: one
    corpus scan with map-side-combined counters + a distinct-digest
    aggregate, and a lang-cardinality entropy aggregate broadcast into
    the final one-row projection. NULL-text docs count in n_docs but
    carry no tokens and are excluded from the dup ratio (no content to
    duplicate).
    """
    from calp_cva_tracking_pipeline_spark.functions.text import token_count

    toks = F.when(
        F.col(text_col).isNotNull(), token_count(F.col(text_col))
    )
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).alias("__text"),
        F.col(lang_col).alias("__lang"),
        F.col(source_col).alias("__source"),
        toks.alias("__tok"),
    )
    main = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("__source").cast("bigint").alias("n_sources"),
        F.countDistinct("__lang").cast("bigint").alias("n_langs"),
        F.coalesce(F.sum("__tok"), F.lit(0))
        .cast("bigint")
        .alias("total_tokens"),
        F.coalesce(F.sum(F.length("__text")), F.lit(0))
        .cast("bigint")
        .alias("total_chars"),
        F.count("__text").cast("bigint").alias("__n_text"),
        F.countDistinct(F.md5("__text")).cast("bigint").alias("__n_dig"),
        F.coalesce(
            F.sum(
                F.when(F.col("__tok") < short_tokens, 1).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("__n_short"),
    )
    lang_counts = (
        base.filter(F.col("__lang").isNotNull())
        .groupBy("__lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    )
    tot_w = Window.partitionBy()
    frac = F.col("__c").cast("double") / F.sum("__c").over(tot_w).cast(
        "double"
    )
    ent_nano = F.round(
        F.round(frac * F.log(frac) * F.lit(-1.0), 9) * 1e9, 0
    ).cast("long")
    # lang cardinality is tiny (a dimension), so the global window and
    # the one-row aggregate both operate on a handful of rows
    entropy = lang_counts.select(ent_nano.alias("__e")).agg(
        F.coalesce(F.sum("__e"), F.lit(0)).alias("__ent_nano")
    )
    j = main.crossJoin(F.broadcast(entropy))
    dup_ppm = F.when(
        F.col("__n_text") > 0,
        F.round(
            (
                F.lit(1.0)
                - F.col("__n_dig").cast("double")
                / F.col("__n_text").cast("double")
            )
            * 1e6,
            0,
        ).cast("bigint"),
    )
    mean_tok = F.when(
        F.col("__n_text") > 0,
        F.round(
            F.col("total_tokens").cast("double")
            / F.col("__n_text").cast("double"),
            6,
        ),
    )
    short_ppm = F.when(
        F.col("__n_text") > 0,
        F.round(
            F.col("__n_short").cast("double")
            * 1e6
            / F.col("__n_text").cast("double"),
            0,
        ).cast("bigint"),
    )
    return j.select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_tokens",
        "total_chars",
        dup_ppm.alias("exact_dup_ppm"),
        F.round(F.col("__ent_nano").cast("double") / 1e9, 6).alias(
            "lang_entropy_nats"
        ),
        mean_tok.alias("mean_doc_tokens"),
        short_ppm.alias("short_doc_ppm"),
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew audit of a prospective join/aggregation key →
    (n_rows, n_keys, max_count, max_share, entropy_nats,
    effective_keys): the numbers behind the broadcast / salt / AQE-skew
    decision this engine's join strategies depend on. ``max_share`` is
    the heaviest key's row fraction (the reducer that a plain hash
    exchange would hand that share of the table); ``entropy_nats`` is
    the Shannon entropy of the key distribution and ``effective_keys``
    its exponential — the "as-if-uniform" key count (effective_keys ≪
    n_keys means a few keys carry the table, so salt or pre-aggregate).

    Scale shape: one map-side-combined groupBy(key) count
    (key-cardinality exchange), then a single global aggregation of the
    count table (one accumulator row). Per-key entropy terms round to
    9 dp and sum as integer nano-nats — order-exact cross-engine, the
    same discipline as the PSI/char-entropy sums. No sorting, no
    windows, no row-sized state.
    """
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.count("*").alias("__cnt")
    )
    tot = counts.agg(
        F.sum("__cnt").alias("__n"), F.count("*").alias("__k_total")
    )
    p = F.col("__cnt") / F.col("__n")
    nano = F.round(F.round(-p * F.log(p), 9) * 1e9, 0).cast("long")
    per_key = counts.crossJoin(F.broadcast(tot)).select(
        "__cnt", "__n", "__k_total", nano.alias("__nano")
    )
    ent = F.round(F.sum("__nano") / F.lit(1e9), 6)
    return per_key.agg(
        F.first("__n").alias("n_rows"),
        F.first("__k_total").alias("n_keys"),
        F.max("__cnt").alias("max_count"),
        F.round(
            F.max("__cnt") / F.first("__n").cast("double"), 6
        ).alias("max_share"),
        ent.alias("entropy_nats"),
        F.round(F.exp(ent), 6).alias("effective_keys"),
    )


def profile_columns_by(
    df: DataFrame,
    group_col: str,
    cols: list[str],
    exact_median: bool = True,
) -> DataFrame:
    """Per-group data cards → (group, col_name, n, n_null, min, max,
    mean, median), one row per (group value × profiled column), ordered
    — the per-source quality sheet a mixed-corpus ingest publishes next
    to the global ``profile_columns`` report (mixture decisions need to
    know WHICH source's length/score distribution moved, not just that
    the blend did).

    Scale shape: ONE map-side-combined groupBy(group) aggregation
    computes every column's stats wide (group-cardinality exchange —
    source/language groups are ≤ 10³ in practice), then an unpivot to
    the long card format runs on the aggregated rows only. The exact
    per-group median (VERDICT r12 ask #7 — previously deferred to
    ``exact_percentiles`` on a slice) comes from
    ``grouped_exact_medians``: the same two-phase value-histogram
    kernel with (group × column) as the histogram key, driver state
    bounded by groups·cols·buckets, no per-group sort of row data; its
    group-cardinality result joins onto the card. ``exact_median=False``
    skips that pass for the one-exchange stats-only card. mean uses the
    exact decimal accumulator; floats round to 6 dp.
    """
    if not cols:
        raise ValueError("profile_columns_by: no columns given")
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.extend(
            [
                F.count(col).alias(f"{c}__n"),
                (F.count(F.lit(1)) - F.count(col)).alias(f"{c}__n_null"),
                F.round(F.min(col), 6).alias(f"{c}__min"),
                F.round(F.max(col), 6).alias(f"{c}__max"),
                F.round(money_avg(c), 6).alias(f"{c}__mean"),
            ]
        )
    wide = df.groupBy(F.col(group_col).alias("grp")).agg(*aggs)
    stats = ("n", "n_null", "min", "max", "mean")
    stack_args = ", ".join(
        "'{c}', {fields}".format(
            c=c,
            fields=", ".join(f"cast(`{c}__{s}` as double)" for s in stats),
        )
        for c in cols
    )
    card = wide.select(
        F.col("grp").alias(group_col),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(col_name, {', '.join(stats)})"
        ),
    ).select(
        group_col,
        "col_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        "min",
        "max",
        "mean",
    )
    if exact_median:
        med = (
            grouped_exact_medians(df, group_col, cols)
            .withColumnRenamed(group_col, "__mg")
            .withColumnRenamed("col_name", "__mc")
        )
        card = card.join(
            F.broadcast(med),  # group-cardinality — never a shuffle join
            F.col(group_col).eqNullSafe(F.col("__mg"))
            & (F.col("col_name") == F.col("__mc")),
            "left",
        ).select(
            group_col,
            "col_name",
            "n",
            "n_null",
            "min",
            "max",
            "mean",
            "median",
        )
    return card.orderBy(group_col, "col_name")


def robust_outliers(
    df: DataFrame,
    value_col: str,
    id_cols: list[str],
    z_threshold: float = 3.5,
    round_to: int = 6,
) -> DataFrame:
    """Median/MAD robust outlier detection (the Iglewicz–Hoberg modified
    z-score): rows where ``0.6745·(x − median) / MAD`` exceeds the
    threshold in absolute value. Unlike mean/stddev z-scores, the
    statistic itself is immune to the outliers it hunts — one wild value
    can't inflate σ and mask itself.

    Both statistics run through the two-phase exact-percentile kernel
    (``exact_percentiles``): median of the raw column, then median of
    the absolute deviations from it. The median is collected (ONE
    scalar, the same bounded-sufficient-statistic discipline as the
    kernel's own range/bucket collects) and embedded as a literal so the
    deviation pass is an ordinary linear plan — never a self-join of the
    input against its own aggregate. Cost: 2 kernel invocations (each
    two pruned scans + a target-slice pass) + one final filter scan; at
    100 TB every driver-held intermediate is ≤ a few KB.

    Determinism: median and MAD are rounded to ``round_to`` before the
    z arithmetic, the z to the same — both sides of an oracle comparison
    do float ops in the same order on the same rounded inputs.

    Degenerate guard: MAD = 0 (over half the values identical) would put
    every other row at ±∞ — those datasets return no rows rather than
    everything, matching the oracle's ``mad > 0`` predicate.
    """
    med_rows = exact_percentiles(
        df, [value_col], [0.5], round_to=round_to
    ).collect()
    if not med_rows:
        return df.sparkSession.createDataFrame(
            [],
            df.select(*id_cols, F.col(value_col).cast("double")).schema.add(
                "robust_z", "double"
            ),
        )
    med = float(med_rows[0]["value"])
    dev = df.withColumn(
        "__dev", F.abs(F.col(value_col).cast("double") - F.lit(med))
    )
    mad = float(
        exact_percentiles(dev, ["__dev"], [0.5], round_to=round_to).collect()[
            0
        ]["value"]
    )
    if mad <= 0:
        return df.sparkSession.createDataFrame(
            [],
            df.select(*id_cols, F.col(value_col).cast("double")).schema.add(
                "robust_z", "double"
            ),
        )
    z = F.round(
        F.lit(0.6745) * (F.col(value_col).cast("double") - F.lit(med)) / F.lit(mad),
        round_to,
    )
    return (
        df.select(*id_cols, F.col(value_col).cast("double").alias(value_col))
        .withColumn("robust_z", z)
        .filter(F.abs(F.col("robust_z")) > z_threshold)
    )


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group closed-form OLS fit (slope, intercept, r², n) from the
    five sufficient statistics n, Σx, Σy, Σxy, Σx², Σy² — the textbook
    normal-equations solution, which distributes as ONE hash aggregation
    with full map-side combine (each partition reduces to 6 numbers per
    group before the wire; shuffle volume = output groups, not rows).

    Bit-exactness discipline: inputs are rounded once to 6 dp
    (``decimal(18,6)``), every per-row PRODUCT is a decimal×decimal
    multiply (exact — ``decimal(18,6)²`` fits ``decimal(37,12)`` with no
    precision loss in either engine, unlike a double product whose ulp
    can shift the 6th decimal once |x·y| passes ~1e10), every Σ
    accumulates as DECIMAL (exact — addition order can't change the
    result), and the slope/intercept/r² divisions then run in double on
    those exact sums in a fixed expression order, rounded to
    ``round_to``. An oracle recomputing the same decimal terms and sums
    gets bit-identical doubles — this is why the statistics are summed
    explicitly rather than calling an engine's ``regr_slope`` (whose
    internal float accumulation is order- and engine-dependent).

    Degenerate groups (n < 2 or zero x-variance) return NULL fit columns
    rather than ±∞/errors (ANSI-mode division guard).
    """
    # products pair an 18,6 with a 19,6 operand: both engines then produce
    # an exact decimal(37,12) product (Spark's p1+p2+1=38 stays inside the
    # cap with no scale loss; DuckDB only widens its internal int to 128
    # bits when an operand's precision exceeds 18)
    dx = F.col(x_col).cast("decimal(18,6)")
    dy = F.col(y_col).cast("decimal(18,6)")
    dxw = F.col(x_col).cast("decimal(19,6)")
    dyw = F.col(y_col).cast("decimal(19,6)")
    dec = "decimal(38,6)"
    sums = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dx.cast(dec)).alias("sx"),
        F.sum(dy.cast(dec)).alias("sy"),
        F.sum((dx * dyw).cast(dec)).alias("sxy"),
        F.sum((dx * dxw).cast(dec)).alias("sxx"),
        F.sum((dy * dyw).cast(dec)).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    num = n * sxy - sx * sy
    slope = F.when((F.col("n") >= 2) & (den_x > 0), num / den_x)
    intercept = (sy - slope * sx) / n
    r2 = F.when((F.col("n") >= 2) & (den_x > 0) & (den_y > 0), (num / den_x) * num / den_y)
    return sums.select(
        *group_cols,
        "n",
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def k_anonymity(
    df: DataFrame, qi_cols: list[str], k: int = 6
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination (Sweeney
    2002): every equivalence class (distinct QI value combination) with
    its population and a ``risky`` flag for classes smaller than ``k`` —
    the privacy gate that runs next to PII redaction before a dataset
    ships: a row whose QI class has < k members is re-identifiable by
    linking those attributes to an external register even after direct
    identifiers are stripped.

    One map-side-combined hash aggregation (shuffle volume = QI-class
    cardinality, not rows); the dataset's overall anonymity level is
    ``min(n)`` over the output. Suppression/generalization of the risky
    classes is the caller's policy decision — the audit reports, it
    does not mutate.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("risky", F.col("n") < k)
    )


def chi2_independence(
    df: DataFrame, col_a: str, col_b: str, round_to: int = 6
) -> DataFrame:
    """Pearson chi-square independence audit between two categorical
    columns — the drift/leakage companion to PSI/KS for CATEGORICAL
    features (is event mix independent of weekday? is label balance
    independent of source shard?). One row: n, dof, chi2.

    Everything derives from the contingency table — ONE hash aggregation
    with full map-side combine (shuffle volume = |A|×|B| cells, never
    rows); margins, N and the dof come from cell-sized re-aggregations
    broadcast back over the cells. Per-cell statistic is computed in the
    algebraically expanded form (obs·N − rt·ct)² / (N·rt·ct) — numerator
    and denominator are products of EXACT integer counts (fits long for
    N ≤ ~3·10⁹ per margin product), widened to double in one fixed
    expression both engines evaluate identically; per-cell contributions
    round to ``round_to`` and sum as integer micro-units, so the total
    is addition-order-independent (the same discipline as the bigram-LM
    micro-nats). NULL category values group as their own class (they are
    a real category operationally).
    """
    return chi2_from_cells(
        chi2_cells(df, col_a, col_b), round_to=round_to
    )


def chi2_cells(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-batch (a, b, obs) contingency cells — the map half of the
    streaming chi-square resident: cells fold ADDITIVELY across
    micro-batches (append per-batch cells, sum per cell), and
    ``chi2_from_cells`` over the folded ledger equals the one-shot
    ``chi2_independence`` — the psi/ks/kappa foreachBatch discipline
    (tests/test_streaming.py). NULL categories stay real classes."""
    return df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("obs"))


def chi2_from_cells(cells: DataFrame, round_to: int = 6) -> DataFrame:
    """Chi-square readout from a PRE-AGGREGATED (a, b, obs) contingency
    ledger — the streaming-foldable half of ``chi2_independence`` (see
    its docstring for the math). Re-aggregates per cell first so an
    appended multi-batch ledger and a one-shot table read identically;
    the re-aggregation rides the cells' (a, b) hash partitioning."""
    cells = (
        cells.select(
            F.col("a").alias("__a"),
            F.col("b").alias("__b"),
            F.col("obs").cast("bigint").alias("__o"),
        )
        .groupBy("__a", "__b")
        .agg(F.sum("__o").alias("__o"))
    )
    ra = cells.groupBy("__a").agg(F.sum("__o").alias("__rt"))
    cb = cells.groupBy("__b").agg(F.sum("__o").alias("__ct"))
    # struct wrappers make the class counts NULL-safe: a NULL category is
    # a real class here, and count_distinct skips bare NULLs
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct(F.struct("__a")).alias("__ka"),
        F.count_distinct(F.struct("__b")).alias("__kb"),
    )
    joined = (
        cells.join(F.broadcast(ra), "__a")
        .join(F.broadcast(cb), "__b")
        .crossJoin(F.broadcast(tot))
    )
    num = (
        F.col("__o") * F.col("__n") - F.col("__rt") * F.col("__ct")
    ).cast("double")
    den = (
        F.col("__n").cast("double")
        * F.col("__rt").cast("double")
        * F.col("__ct").cast("double")
    )
    contrib_micro = F.round(
        F.round(num * num / den, round_to) * 1e6, 0
    ).cast("long")
    return (
        joined.select(
            contrib_micro.alias("__c"),
            F.col("__n"),
            ((F.col("__ka") - 1) * (F.col("__kb") - 1)).alias("dof"),
        )
        .groupBy("__n", "dof")
        .agg(
            F.round(F.sum("__c") / F.lit(1e6), round_to).alias("chi2")
        )
        .select(F.col("__n").alias("n"), "dof", "chi2")
    )


import math as _math

BENFORD_EXPECTED = [
    round(_math.log10(1 + 1 / d), 6) for d in range(1, 10)
]


def benford_audit(
    df: DataFrame, value_col: str, cents: int = 100, round_to: int = 6
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic forensic data-quality audit for amount-like columns
    (fabricated or unit-confused values drift from log10(1+1/d); a
    uniform synthetic column fails it loudly, which is itself signal).

    Digit extraction avoids float log10 entirely (log10 of a value near
    a power of ten can land on either side per engine): values scale to
    integer ``cents`` units and the digit is the first character of the
    INTEGER's decimal string — integer→string is unambiguous in every
    engine, so the bucketing is bit-portable. Zero/null values are
    excluded (they have no significant digit; negative values audit by
    magnitude). One map-side-combined 9-row aggregation; expected
    frequencies are Python-computed literals so no libm runs in either
    engine. Output: (digit, n, frac, expected, dev) for digits present.
    """
    c = F.abs(
        F.round(F.col(value_col).cast("double") * cents).cast("long")
    )
    digits = (
        df.select(c.alias("__c"))
        .filter(F.col("__c") > 0)
        .select(
            F.substring(F.col("__c").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("__t"))
    exp_arr = F.array(*[F.lit(x) for x in BENFORD_EXPECTED])
    frac = F.round(F.col("n") / F.col("__t"), round_to)
    expected = F.element_at(exp_arr, F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            frac.alias("frac"),
            expected.alias("expected"),
            F.round(frac - expected, round_to).alias("dev"),
        )
        .orderBy("digit")
    )


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 20,
) -> DataFrame:
    """Equi-width histogram with CALLER-FIXED edges — the profiling
    staple when the range is known (amounts, scores, latencies), and the
    zero-coordination sibling of the exact-percentile kernel: one
    map-side-combined aggregation at ``bins`` output rows, no driver
    round-trips, so it composes into dashboards/streaming sinks freely.

    Bin i covers [lo + i·w, lo + (i+1)·w); values below ``lo`` clamp to
    bin 0, values ≥ ``hi`` clamp to the last bin (the audit must count
    every non-null row somewhere — out-of-range mass IS the signal);
    NULLs and NaNs are excluded. The bin index is one floor over exact double
    arithmetic both engines evaluate identically. Empty bins are not
    emitted (count tables stay sparse); downstream grids can left-join a
    sequence to densify.

    Output: (bin, bin_lo, bin_hi, n) ordered by bin.
    """
    if not (hi > lo) or bins <= 0:
        raise ValueError(f"need hi > lo and bins > 0: {lo}, {hi}, {bins}")
    w = (hi - lo) / bins
    idx = F.least(
        F.greatest(
            F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(w))
            .cast("int"),
            F.lit(0),
        ),
        F.lit(bins - 1),
    )
    # NaN passes isNotNull but has no bin: Spark's non-ANSI double→int
    # cast would silently dump it into bin 0 while an ANSI engine errors
    # on the cast — exclude it on both engines alongside NULL.
    return (
        df.filter(
            F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double"))
        )
        .groupBy(idx.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(w), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(w), 6).alias(
                "bin_hi"
            ),
            "n",
        )
        .orderBy("bin")
    )


def dq_checks(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Declarative data-quality gate: evaluate every rule in ONE scan and
    emit a violation ledger — the contract-enforcement half of the
    profiling tier (``profile_columns`` DESCRIBES a table; this judges it
    against expectations, the Great-Expectations/dbt-test shape a
    pipeline runs before publishing).

    ``rules`` are (name, violation_predicate) pairs — predicate TRUE
    means the row violates (NULL counts as not-violating; write explicit
    isNull rules for null checks). All predicates evaluate in a single
    map-side-combined aggregation pass: one scan, one one-row exchange,
    regardless of rule count. ``unique_cols`` adds a `<col>_unique` rule
    per column, counting surplus rows as COUNT(col) − COUNT(DISTINCT
    col) — NULLs are excluded on BOTH sides of that subtraction (and by
    both engines' COUNT semantics), so pair a `<col>_not_null` rule with
    it to police nulls.

    Output: (rule, n_rows, n_violations, violation_rate 6dp), one row
    per rule, ordered by rule name. n_rows repeats the table total so
    each ledger row is self-contained for alerting thresholds.

    Engine-added; no reference counterpart (the reference validates by
    manual review routing — CC4).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for name, cond in rules:
        # coalesce: SUM over zero rows is NULL, but the ledger contract
        # is integer counts — an empty input must read 0 violations,
        # not unknown (round-8 advisor finding).
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"__v_{name}")
        )
        names.append(name)
    for c in unique_cols or []:
        name = f"{c}_unique"
        aggs.append(
            (F.count(F.col(c)) - F.count_distinct(F.col(c)))
            .cast("bigint")
            .alias(f"__v_{name}")
        )
        names.append(name)
    row = df.agg(*aggs)
    ledger = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"), F.col(f"__v_{n}").alias("viol")
            )
            for n in sorted(names)
        ]
    )
    return (
        row.select(F.col("__n"), F.explode(ledger).alias("__r"))
        .select(
            F.col("__r.rule").alias("rule"),
            F.col("__n").cast("bigint").alias("n_rows"),
            F.col("__r.viol").alias("n_violations"),
            F.round(
                F.when(
                    F.col("__n") > 0,
                    F.col("__r.viol").cast("double") / F.col("__n"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("violation_rate"),
        )
        .orderBy("rule")
    )


def ref_integrity(
    fks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit across declared foreign keys: the
    cross-TABLE sibling of ``dq_checks`` (whose rules see one table at
    a time). ``fks`` is a list of (name, child_df, child_key, parent_df,
    parent_key); the ledger reports, per FK, how many child rows carry a
    NULL key, how many distinct keys the child uses, and how many of
    those keys (and their rows) have no parent — the orphan mass a
    snapshot load or late-arriving dimension leaves behind.

    Physical shape per FK: the child collapses to key-cardinality with
    one map-side-combined groupBy (the NULL-key group rides along and
    can never match), the parent collapses to its distinct key set, and
    a single left join + one final aggregation produce every statistic —
    so the join volume is bounded by KEY CARDINALITY on both sides,
    never row count, and each table is scanned exactly once per FK.
    Broadcast fires automatically when the parent key set is dimension-
    sized; two genuinely huge key sets fall back to a key-partitioned
    shuffle, which is the correct plan there.

    Output: (fk, child_rows, null_key_rows, distinct_keys, orphan_keys,
    orphan_rows, orphan_rate 6dp of rows), one row per declared FK,
    ordered by fk name.

    Engine-added; no reference counterpart (the reference's membership
    checks — SO3 — are single-table IN-list filters).
    """
    rows = []
    for name, child, ck, parent, pk in fks:
        keyed = (
            child.select(F.col(ck).alias("__k"))
            .groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__m"))
        )
        pkeys = (
            parent.select(F.col(pk).alias("__k"))
            .filter(F.col("__k").isNotNull())
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        j = keyed.join(pkeys, "__k", "left")
        orphan = F.col("__k").isNotNull() & F.col("__hit").isNull()
        rows.append(
            j.agg(
                F.lit(name).alias("fk"),
                F.sum("__m").cast("bigint").alias("child_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("__k").isNull(), F.col("__m"))),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("null_key_rows"),
                F.count(F.when(F.col("__k").isNotNull(), 1))
                .cast("bigint")
                .alias("distinct_keys"),
                F.count(F.when(orphan, 1)).cast("bigint").alias(
                    "orphan_keys"
                ),
                F.coalesce(F.sum(F.when(orphan, F.col("__m"))), F.lit(0))
                .cast("bigint")
                .alias("orphan_rows"),
            ).withColumn(
                "orphan_rate",
                F.round(
                    F.when(
                        F.col("child_rows") > 0,
                        F.col("orphan_rows").cast("double")
                        / F.col("child_rows"),
                    ).otherwise(F.lit(0.0)),
                    6,
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.union(r)
    return out.orderBy("fk")


def gini_by_group(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    cents: int = 100,
) -> DataFrame:
    """Per-group Gini concentration coefficient — the inequality summary
    of a value distribution (how concentrated spend/tokens/traffic are
    within each segment), computed by the exact sorted-rank identity
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted values.

    Exactness: values encode to ``cents`` integer units; rank·value
    products and both sums are 64-bit integer arithmetic (Σ i·x stays
    under 2⁶³ for cent-scaled values ≤10⁷ over ≤10⁷-row groups), so the
    only float is the final division, rounded to 6 dp — bit-identical
    across engines and partitionings. Rank ties (equal values) are
    assignment-invariant: a tied block contributes Σ(coefficients)·x
    regardless of which tied row takes which rank, so row_number over
    a value-only order is total ENOUGH — no tiebreak column needed.
    Negative values are rejected rows (Gini is defined on non-negative
    distributions); NULLs drop.

    Physical shape: one keyed exchange + per-key sort (the rank
    window), then a map-side-combined aggregation to group cardinality.
    Groups deliver independently, so skew remedies are the usual keyed-
    window ones (a mega-group is one sort partition — salt upstream if
    a single key owns the table).

    Output: keys + (n bigint, gini double 6dp); zero-sum or empty
    groups emit NULL gini (no distribution to summarize).

    Engine addition (profiling tier; no reference counterpart).
    """
    enc = df.filter(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    ).select(
        *keys,
        F.round(F.col(value_col).cast("double") * cents)
        .cast("long")
        .alias("__x"),
    )
    w = Window.partitionBy(*keys).orderBy("__x")
    ranked = enc.withColumn("__i", F.row_number().over(w))
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("__s1"),
        F.sum(F.col("__i") * F.col("__x")).alias("__sr"),
    )
    num = (
        F.lit(2) * F.col("__sr")
        - (F.col("n") + F.lit(1)) * F.col("__s1")
    ).cast("double")
    den = (F.col("n") * F.col("__s1")).cast("double")
    return agg.select(
        *keys,
        "n",
        F.when(
            F.col("__s1") > 0, F.round(num / den, 6)
        ).alias("gini"),
    ).orderBy(*keys)


def null_patterns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Missing-data pattern census (the md.pattern of the profiling
    tier): which COMBINATIONS of columns go null together, counted in
    ONE scan. Row-level nullness packs into a bitmask (bit i = cols[i]
    IS NULL) and a single map-side-combined groupBy counts each pattern
    — the exchange carries ≤ 2^|cols| rows regardless of table size.
    Joint patterns are what per-column null rates (profile_columns)
    cannot show: 'phone and email are never null together' is a
    pattern-level fact.

    Output: (pattern '10…' aligned to cols order — '1' = null, n_rows,
    pct of table 6dp), ordered by n_rows DESC then pattern for a
    deterministic cut. Engine addition; no reference counterpart.
    """
    mask = None
    for i, c in enumerate(cols):
        bit = F.when(F.col(c).isNull(), F.lit(1 << i)).otherwise(F.lit(0))
        mask = bit if mask is None else mask + bit
    total_w = Window.partitionBy()
    out = (
        df.select(mask.cast("long").alias("__m"))
        .groupBy("__m")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .withColumn("__t", F.sum("n_rows").over(total_w))
    )
    pattern = F.concat(
        *[
            F.when(
                (F.col("__m").bitwiseAND(F.lit(1 << i))) > 0, F.lit("1")
            ).otherwise(F.lit("0"))
            for i in range(len(cols))
        ]
    )
    return out.select(
        pattern.alias("pattern"),
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("__t"), 6).alias(
            "pct"
        ),
    ).orderBy(F.col("n_rows").desc(), F.col("pattern"))


def tail_index(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    xmin: float,
    min_tail: int = 10,
) -> DataFrame:
    """Per-group Hill estimator of the power-law tail exponent,
    α = 1 + n / Σ ln(xᵢ/xmin) over the tail sample x ≥ xmin — the
    heavy-tail summary that says whether a key/spend/degree
    distribution has finite variance at all (α ≤ 3 means plan for
    whales: skew salting, mega-key caps). Complements pf_key_skew's
    entropy/max-share with an actual tail LAW estimate.

    Exactness: each log-ratio rounds to integer micro-units
    (round(ln(x/xmin)·10⁶) — the a10/geometric-mean discipline: libm
    outputs are 6-dp-pinned BEFORE the order-sensitive sum, so the
    integer Σ is partition-order-independent and both engines agree
    bit-for-bit); α is then one IEEE division rounded to 6 dp. Groups
    with fewer than ``min_tail`` tail points emit NULL alpha (a 3-point
    tail is not a law); x ≤ xmin rows simply aren't tail sample.

    One scan → one map-side-combined keyed aggregation; output is
    group-cardinality-sized. Engine addition; no reference counterpart.
    """
    enc = df.filter(
        F.col(value_col).isNotNull() & (F.col(value_col) > xmin)
    ).select(
        *keys,
        F.round(
            F.log(F.col(value_col).cast("double") / F.lit(float(xmin)))
            * 1_000_000
        )
        .cast("long")
        .alias("__l"),
    )
    agg = enc.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum("__l").alias("__s"),
    )
    alpha = F.lit(1.0) + F.col("n_tail").cast("double") * 1_000_000.0 / F.col(
        "__s"
    ).cast("double")
    return agg.select(
        *keys,
        "n_tail",
        F.when(
            (F.col("n_tail") >= min_tail) & (F.col("__s") > 0),
            F.round(alpha, 6),
        ).alias("alpha"),
    ).orderBy(*keys)


def ab_test_summary(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    min_n: int = 10,
) -> DataFrame:
    """Experiment readout: per-variant mean vs a declared control with a
    Welch z statistic and a 95% two-sided significance flag — the
    decision table an A/B platform prints, computed in ONE scan.

    Exactness: values round to whole integer units up front (documented
    resolution — unit-scaled squared sums stay inside 2⁶³ for ~10⁷ rows
    of values ≤ 10⁶; cent-scaling would overflow two orders sooner),
    n/Σx/Σx² aggregate as 64-bit integers per variant (map-side
    combined, order-independent), and mean/variance/z derive in a fixed
    double expression order rounded to 6 dp. The z against control uses
    Welch's unpooled variance; variants (or a control) with fewer than
    ``min_n`` observations or zero variance emit NULL z (no inference
    from a degenerate sample). The control row itself carries NULL z.

    Physical shape: one scan → variant-cardinality aggregate; the
    control row broadcasts back as a literal-sized cross join. Output:
    (variant, n, mean, z, significant) ordered by variant.
    Engine addition; no reference counterpart.
    """
    enc = df.filter(
        F.col(value_col).isNotNull() & F.col(variant_col).isNotNull()
    ).select(
        F.col(variant_col).alias("variant"),
        F.round(F.col(value_col).cast("double"))
        .cast("long")
        .alias("__x"),
    )
    agg = enc.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").alias("__s1"),
        F.sum(F.col("__x") * F.col("__x")).alias("__s2"),
    )
    nD = F.col("n").cast("double")
    s1D = F.col("__s1").cast("double")
    s2D = F.col("__s2").cast("double")
    var_ = F.when(
        F.col("n") > 1, (nD * s2D - s1D * s1D) / (nD * (nD - 1))
    ).otherwise(F.lit(0.0))
    stats = agg.select(
        "variant", "n", (s1D / nD).alias("__m"), var_.alias("__v")
    )
    ctrl = stats.filter(F.col("variant") == control).select(
        F.col("n").alias("__nc"),
        F.col("__m").alias("__mc"),
        F.col("__v").alias("__vc"),
    )
    j = stats.crossJoin(F.broadcast(ctrl))
    se2 = F.col("__v") / F.col("n") + F.col("__vc") / F.col("__nc")
    z = (F.col("__m") - F.col("__mc")) / F.sqrt(se2)
    usable = (
        (F.col("variant") != control)
        & (F.col("n") >= min_n)
        & (F.col("__nc") >= min_n)
        & (se2 > 0)
    )
    return j.select(
        "variant",
        "n",
        F.round(F.col("__m"), 6).alias("mean"),
        F.when(usable, F.round(z, 6)).alias("z"),
        F.when(usable, F.abs(z) > 1.959964).alias("significant"),
    ).orderBy("variant")


def freshness_audit(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    as_of: str,
    max_lag_seconds: int,
) -> DataFrame:
    """Per-group data-freshness SLA audit: when did each segment last
    receive a row, how far behind the ``as_of`` instant is it, and does
    that breach the lag budget — the publish-gate sibling of
    ``dq_checks`` (which judges VALUES; this judges ARRIVAL). ``as_of``
    is an explicit timestamp string, never now(): audits must be
    replayable bit-for-bit, and the caller's orchestrator knows the
    cutoff it is gating.

    One scan → one map-side-combined aggregation to group cardinality;
    lag is integer seconds (floor of the micros difference). Groups
    whose every row has a NULL timestamp report NULL last_ts/lag and
    stale=true (no arrival signal IS a breach — the silent-feed
    failure mode). Output: keys + (n_rows, last_ts, lag_s, stale),
    ordered by keys. Engine addition; no reference counterpart.
    """
    return freshness_from_cells(
        freshness_cells(df, keys, ts_col), keys, as_of, max_lag_seconds
    )


def freshness_cells(
    df: DataFrame, keys: list[str], ts_col: str
) -> DataFrame:
    """Per-batch (keys..., n_rows, last_ts) arrival cells — the map half
    of the streaming freshness resident. n_rows folds by SUM and
    last_ts by MAX (both associative + commutative), so an appended
    multi-batch ledger re-collapses to exactly the one-shot cells;
    foreachBatch ledger + ``freshness_from_cells`` ≡ the one-shot
    ``freshness_audit`` (tests/test_streaming.py)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.max(F.col(ts_col)).alias("last_ts"),
    )


def freshness_from_cells(
    cells: DataFrame,
    keys: list[str],
    as_of: str,
    max_lag_seconds: int,
) -> DataFrame:
    """Freshness readout from a PRE-AGGREGATED (keys..., n_rows,
    last_ts) ledger — the streaming-foldable half of
    ``freshness_audit``: re-collapse the append ledger (SUM rows, MAX
    arrival — a group silent in every later batch keeps its last
    arrival, which is precisely the staleness signal), then the
    integer-seconds lag and SLA verdict against the explicit ``as_of``
    cutoff."""
    as_of_us = F.unix_micros(F.to_timestamp(F.lit(as_of)))
    agg = cells.groupBy(*keys).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.max("last_ts").alias("last_ts"),
    )
    lag_us = as_of_us - F.unix_micros(F.col("last_ts"))
    lag_s = (
        (lag_us - (lag_us % 1_000_000)) / F.lit(1_000_000)
    ).cast("long")
    return agg.select(
        *keys,
        "n_rows",
        "last_ts",
        lag_s.alias("lag_s"),
        F.coalesce(
            lag_s > max_lag_seconds, F.lit(True)
        ).alias("stale"),
    ).orderBy(*keys)


def annotator_agreement(
    df: DataFrame,
    col_a: str,
    col_b: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement between two label columns
    — the label-QA gate a training-data pipeline runs before trusting
    weak/heuristic/model annotations against a reference labeler. Per
    group (or one global row): n, observed agreement po, chance
    agreement pe = Σ_c p_a(c)·p_b(c), and κ = (po − pe)/(1 − pe).

    Scale shape: ONE map-side-combined groupBy to the (group × label_a ×
    label_b) contingency table — exchange volume is label-cardinality-
    bounded, never row count — then marginals and the κ arithmetic are
    aggregations OVER the tiny table. Rows where either label is NULL
    drop (unlabeled, not disagreement). Counts stay integer through the
    marginal products' SUM; po/pe/κ are doubles with fixed expression
    order (exact below 2^53 — document resolution at petabyte row
    counts). Degenerate pe = 1 (both annotators constant and equal)
    yields NULL κ, the standard undefined case. Output: group_cols +
    (n, po, pe, kappa), 6 dp, ordered by group. Engine addition; no
    reference counterpart.
    """
    gcols = list(group_cols or [])
    keys_ok = F.lit(True)
    for kc in gcols:
        keys_ok = keys_ok & F.col(kc).isNotNull()
    # group not-nulls up front: plan-identical branches -> exchange
    # reuse on the contingency lineage (see corpus_js_divergence).
    base = df.filter(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull() & keys_ok
    ).select(
        *gcols,
        F.col(col_a).alias("__a"),
        F.col(col_b).alias("__b"),
    )
    cont = base.groupBy(*gcols, "__a", "__b").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    )
    return kappa_from_contingency(cont, group_cols=gcols)


def kappa_from_contingency(
    cont: DataFrame,
    group_cols: list[str] | None = None,
    label_a_col: str = "__a",
    label_b_col: str = "__b",
    count_col: str = "__c",
) -> DataFrame:
    """Cohen's kappa from a PRE-AGGREGATED contingency ledger (group ×
    label_a × label_b → count). The streaming-foldable half of
    ``annotator_agreement``: contingency cells fold ADDITIVELY across
    micro-batches (append per-batch cells, sum counts per cell), so a
    foreachBatch ledger + this kernel equals the one-shot readout —
    the dq_checks/cusum_fold discipline (tests/test_streaming.py).
    """
    gcols = list(group_cols or [])
    # re-collapse duplicate cells so an APPEND ledger (one row per cell
    # per micro-batch) feeds in directly — the fold is this sum.
    cont = (
        cont.select(
            *gcols,
            F.col(label_a_col).alias("__a"),
            F.col(label_b_col).alias("__b"),
            F.col(count_col).cast("bigint").alias("__c"),
        )
        .groupBy(*gcols, "__a", "__b")
        .agg(F.sum("__c").cast("bigint").alias("__c"))
    )
    # pe needs Σ_c ma(c)·mb(c) over EVERY label c both annotators use —
    # including labels with no diagonal contingency cell — so the
    # marginals join on the label value rather than reading off the
    # (possibly absent) diagonal cells.
    ma = cont.groupBy(*gcols, "__a").agg(
        F.sum("__c").cast("bigint").alias("__ma")
    ).withColumnRenamed("__a", "__lab")
    mb = cont.groupBy(*gcols, "__b").agg(
        F.sum("__c").cast("bigint").alias("__mb")
    ).withColumnRenamed("__b", "__lab")
    per_label = (
        ma.join(mb, [*gcols, "__lab"], "inner")
        .groupBy(*gcols)
        .agg(
            F.sum(
                F.col("__ma").cast("double") * F.col("__mb").cast("double")
            ).alias("__pe_num")
        )
    )
    totals = cont.groupBy(*gcols).agg(
        # coalesce: the GLOBAL path over an empty input emits one row
        # whose sums are NULL — the contract documents integer counts
        F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("n"),
        F.coalesce(
            F.sum(
                F.when(F.col("__a") == F.col("__b"), F.col("__c"))
                .otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("bigint").alias("__agree"),
    )
    # LEFT join: a group whose annotators share NO label has an empty
    # marginal intersection — pe is 0 there, the group must not vanish.
    j = (
        totals.join(per_label, gcols, "left")
        if gcols
        else totals.join(per_label, F.lit(True), "left")
    )
    nd = F.col("n").cast("double")
    # n = 0 only on the GLOBAL path over an empty input (a grouped agg
    # emits no rows there) — guard the divisions or ANSI throws
    po = F.when(F.col("n") > 0, F.col("__agree").cast("double") / nd)
    pe = F.when(
        F.col("n") > 0,
        F.coalesce(F.col("__pe_num"), F.lit(0.0)) / (nd * nd),
    )
    kappa = F.when(pe < 1.0, (po - pe) / (F.lit(1.0) - pe))
    return j.select(
        *gcols,
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    ).orderBy(*gcols) if gcols else j.select(
        "n",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def winsorized_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p_lo_ppm: int = 10_000,
    p_hi_ppm: int = 990_000,
) -> DataFrame:
    """Per-group winsorized statistics — the robust-mean cleaning step
    (clip to the [p_lo, p_hi] order statistics, then average) that a
    feature pipeline runs before ratios/z-scores meet heavy tails; the
    transform complement of mad_outliers (which FLAGS, this CLIPS).

    Cut points are exact ORDER STATISTICS at percentile_disc ranks
    k = ceil(p·n), computed in pure integer arithmetic (probabilities
    are parts-per-million integers, so the rank never touches IEEE
    rounding): one per-group ordered window gives row_number + count
    (duplicate values commute, so no tie-break is needed — the value AT
    rank k is unique even when row numbers among equal values are not),
    and the cuts read off via conditional aggregation in the SAME
    key-partitioned pass — the groupBy keys prefix the window partition
    key, so no second shuffle. Values pin to integer cents; the
    winsorized mean is an exact rational down to the final /100
    division. Output per group: n, lo, hi, mean_raw, mean_winsorized
    (6 dp), n_clipped, ordered by group. Engine addition; no reference
    counterpart.
    """
    enc = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.round(F.col(value_col).cast("double") * 100)
        .cast("bigint")
        .alias("__x"),
    )
    w_ord = Window.partitionBy(*group_cols).orderBy("__x")
    w_all = Window.partitionBy(*group_cols)
    ranked = enc.withColumn("__rn", F.row_number().over(w_ord)).withColumn(
        "__n", F.count(F.lit(1)).over(w_all)
    )
    # ceil(p·n) in pure BIGINT: (p_ppm·n + 999999) div 1e6 — `div` is
    # integer division (a double `/` would go inexact past 2^53).
    k_lo = F.expr(
        f"greatest(1L, ({int(p_lo_ppm)}L * __n + 999999L) div 1000000L)"
    )
    k_hi = F.expr(
        f"greatest(1L, ({int(p_hi_ppm)}L * __n + 999999L) div 1000000L)"
    )
    cuts = ranked.groupBy(*group_cols).agg(
        F.max("__n").cast("bigint").alias("n"),
        F.max(F.when(F.col("__rn") == k_lo, F.col("__x"))).alias("__lo"),
        F.max(F.when(F.col("__rn") == k_hi, F.col("__x"))).alias("__hi"),
        F.sum("__x").cast("bigint").alias("__s_raw"),
    )
    # no broadcast hint: cuts is GROUP-cardinality and groups scale
    # with data (the assoc.py round-8 advisor lesson); AQE broadcasts
    # when it actually fits.
    clipped = (
        ranked.join(cuts, group_cols)
        .select(
            *group_cols,
            F.col("n"),
            F.col("__lo"),
            F.col("__hi"),
            F.col("__s_raw"),
            F.least(
                F.greatest(F.col("__x"), F.col("__lo")), F.col("__hi")
            ).alias("__cx"),
            (
                (F.col("__x") < F.col("__lo"))
                | (F.col("__x") > F.col("__hi"))
            ).cast("long").alias("__clip"),
        )
        .groupBy(*group_cols)
        .agg(
            F.max("n").alias("n"),
            F.max("__lo").alias("__lo"),
            F.max("__hi").alias("__hi"),
            F.max("__s_raw").alias("__s_raw"),
            F.sum("__cx").cast("bigint").alias("__s_win"),
            F.sum("__clip").cast("bigint").alias("n_clipped"),
        )
    )
    nD = F.col("n").cast("double")
    return clipped.select(
        *group_cols,
        "n",
        F.round(F.col("__lo").cast("double") / F.lit(100.0), 6).alias("lo"),
        F.round(F.col("__hi").cast("double") / F.lit(100.0), 6).alias("hi"),
        F.round(
            F.col("__s_raw").cast("double") / nD / F.lit(100.0), 6
        ).alias("mean_raw"),
        F.round(
            F.col("__s_win").cast("double") / nD / F.lit(100.0), 6
        ).alias("mean_winsorized"),
        "n_clipped",
    ).orderBy(*group_cols)


def poisson1_thresholds_60(max_k: int = 8) -> list[int]:
    """Poisson(1) inverse-CDF thresholds scaled to the 60-bit hash range
    — plan-time Python, embedded as literals in Spark plans AND SQL
    oracles (the dcg_weights_nano discipline: no runtime libm)."""
    import math

    out, cdf, p = [], 0.0, math.exp(-1.0)
    for k in range(max_k):
        cdf += p
        out.append(int(cdf * (1 << 60)))
        p = p / (k + 1)
    return out


# seed for the bootstrap replica universal-hash family — a plan-time
# constant shared with the SQL oracle (distinct from the MinHash tiers'
# default seed so replica draws never correlate with LSH bands)
BOOT_FAMILY_SEED = 1031


def poisson1_thresholds_mod_p(max_k: int = 8) -> list[int]:
    """Poisson(1) inverse-CDF thresholds scaled to the Mersenne-prime
    universal-hash range [0, p) — for replica draws fanned out from one
    shared digest via (a·h + b) mod p (one md5 per row, not B)."""
    import math

    from calp_cva_tracking_pipeline_spark.functions.hashing import (
        MERSENNE_P,
    )

    out, cdf, p = [], 0.0, math.exp(-1.0)
    for k in range(max_k):
        cdf += p
        out.append(int(cdf * MERSENNE_P))
        p = p / (k + 1)
    return out


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    n_replicas: int = 32,
    z: float = 1.959964,
) -> DataFrame:
    """Per-group mean with a hash-based Poisson-bootstrap standard error
    and normal-approximation CI — error bars for any pipeline metric
    WITHOUT resampling passes. Each replica b reweights every row by a
    Poisson(1)-distributed integer derived from stable_hash64(id|b)
    against plan-time inverse-CDF thresholds (the streaming-friendly
    Poisson bootstrap: deterministic, engine-portable, replayable — no
    RNG state anywhere).

    Exactness: per-replica (Σw·x, Σw) are 64-bit integer sums on cents
    (order-independent); replica means pin to micro-cent integers; the
    across-replica variance is a fixed-order double expression over
    those exact integers. Scale shape: ONE scan, ONE group-cardinality
    exchange — the B replicas are 2·B parallel aggregate expressions
    (map-side combined), never a row explosion. Hashing cost is ONE md5
    per row (round-13 verdict: B md5s/row made this the suite's most
    CPU-bound query): replica b's draw is the universal-hash fan-out
    h_b = (a_b·h + b_b) mod p over the shared 60-bit digest — the
    MinHash family (pairwise-independent across replicas, the standard
    hash-Poisson-bootstrap construction), thresholds rescaled to the
    mod-p range at plan time. Output per group: n, mean, se_boot,
    ci_lo, ci_hi (6 dp). Groups where any replica draws zero total
    weight (microscopic n) emit NULL se/CI. Engine addition; no
    reference counterpart.
    """
    from calp_cva_tracking_pipeline_spark.functions.hashing import (
        MERSENNE_P,
        minhash_params,
        stable_hash_mod_p,
    )

    ths = poisson1_thresholds_mod_p()
    params = minhash_params(n_replicas, seed=BOOT_FAMILY_SEED)
    enc = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        stable_hash_mod_p(
            F.concat(F.col(id_col).cast("string"), F.lit("|boot"))
        ).alias("__h"),
        F.round(F.col(value_col).cast("double") * 100)
        .cast("bigint")
        .alias("__x"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__x").cast("bigint").alias("__sx"),
    ]
    for b, (pa, pb) in enumerate(params):
        # a,b < p and __h < p keep a·h + b < 2^62 — no int64 overflow.
        # Chained CASE, ascending thresholds: P(w=0)=37%, P(w<=1)=74% —
        # expected ~2 comparisons per replica, not 8. Built as ONE
        # F.expr string per replica: 64 nested PySpark when() chains
        # cost ~1s of driver-side analysis per call (the round-4
        # plan-construction lesson — identical Catalyst tree).
        hb = f"(({pa} * __h + {pb}) % {MERSENNE_P})"
        arms = " ".join(
            f"WHEN {hb} < {t} THEN {k}" for k, t in enumerate(ths)
        )
        w = f"CAST(CASE {arms} ELSE {len(ths)} END AS BIGINT)"
        aggs.append(
            F.expr(f"CAST(SUM({w} * __x) AS BIGINT)").alias(f"__swx{b}")
        )
        aggs.append(F.expr(f"CAST(SUM({w}) AS BIGINT)").alias(f"__sw{b}"))
    agg = enc.groupBy(*group_cols).agg(*aggs)
    # replica means pinned to micro-cent integers, fixed order b=0..B-1
    # (F.expr strings for the same plan-construction reason as above)
    m_cols = [
        F.expr(
            f"CASE WHEN __sw{b} > 0 THEN CAST(ROUND(CAST(__swx{b} AS"
            f" DOUBLE) / CAST(__sw{b} AS DOUBLE) * 1e6) AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END"
        )
        for b in range(n_replicas)
    ]
    # The replica means materialize ONCE into an array column and the
    # moment sums fold over it with F.aggregate: inlining each CASE mean
    # three times (s1 + twice in s2) blew whole-stage codegen past the
    # 64KB method limit at B=32 (ERROR CodeGenerator + interpreted
    # fallback). The fold itself is interpreted BY DESIGN — it runs on
    # group-cardinality rows, not the corpus (the wave-21 lambda trap
    # does not apply at this row count). Fold order is left-to-right
    # b=0..B-1 on both engines: partial sums of squared micro-cent
    # means exceed 2^53, so ORDER is part of the contract.
    staged = agg.select(
        *group_cols,
        "n",
        "__sx",
        F.array(*m_cols).alias("__ms"),
        # any_zero must ride along — recomputing it from __sw columns
        # after this projection would keep those columns alive
        F.array(
            *[F.col(f"__sw{b}") for b in range(n_replicas)]
        ).alias("__sws"),
    )
    ms_d = F.transform(F.col("__ms"), lambda m: m.cast("double"))
    s1 = F.aggregate(
        ms_d, F.lit(0.0), lambda acc, m: acc + m
    )
    s2 = F.aggregate(
        ms_d, F.lit(0.0), lambda acc, m: acc + m * m
    )
    bD = F.lit(float(n_replicas))
    var_ = (bD * s2 - s1 * s1) / (bD * (bD - 1.0))
    se_units = F.sqrt(var_) / F.lit(1e8)  # micro-cents -> units
    mean_units = (
        F.col("__sx").cast("double") / F.col("n").cast("double")
    ) / F.lit(100.0)
    ok = ~F.exists(F.col("__sws"), lambda sw: sw <= 0)
    return staged.select(
        *group_cols,
        "n",
        F.round(mean_units, 6).alias("mean"),
        F.when(ok, F.round(se_units, 6)).alias("se_boot"),
        F.when(ok, F.round(mean_units - F.lit(z) * se_units, 6)).alias(
            "ci_lo"
        ),
        F.when(ok, F.round(mean_units + F.lit(z) * se_units, 6)).alias(
            "ci_hi"
        ),
    ).orderBy(*group_cols)


def mann_whitney(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    control: str,
    min_n: int = 10,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) of every variant against a
    declared control — the NONPARAMETRIC experiment readout beside
    ``ab_test_summary``'s Welch z: rank-based, so heavy tails and
    outliers that poison a mean comparison leave it unmoved.

    Integer-exact machinery: values pin to cents; the pooled-value
    grid carries per-variant and control counts; U computes from the
    control's cumulative-below and tie counts at each value —
    U2 = Σ_x cnt_v(x)·(2·cum_below_c(x) + eq_c(x)), twice U, exactly
    integral (the ×2 absorbs the half-credit for ties). The normal
    approximation uses the tie-corrected variance σ² = (n_v·n_c/12)·
    ((N+1) − Σ(t³−t)/(N(N−1))) with tie sizes from the PAIR's pooled
    sample — also integer sums — and a fixed double expression order
    for z. Physical shape: one scan → (variant × value) cells
    (map-side combined, value-cardinality exchange), one ordered
    window over the value grid for the control cums (the pf_ks
    integer-CDF discipline), one variant-cardinality aggregate.
    Variants or control below ``min_n`` emit NULL z. Output: (variant,
    n, u, z, significant), ordered by variant; the control row carries
    NULL u/z. Engine addition; no reference counterpart.
    """
    enc = df.filter(
        F.col(value_col).isNotNull() & F.col(variant_col).isNotNull()
    ).select(
        F.col(variant_col).alias("__v"),
        F.round(F.col(value_col).cast("double") * 100)
        .cast("bigint")
        .alias("__x"),
    )
    # r15: cells feeds ctrl, the value grid and the scoring join —
    # un-cut, the corpus scan + (variant x value) aggregation
    # re-executed per reference (8 fact scans in the executed plan).
    # One lazy cut on the value-cardinality-bounded cell table; the
    # bounded grid/join frames downstream replan cheaply off it.
    cells = enc.groupBy("__v", "__x").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c")
    ).localCheckpoint(eager=False)
    ctrl = (
        cells.filter(F.col("__v") == control)
        .select("__x", F.col("__c").alias("__cc"))
    )
    grid = (
        cells.select("__x")
        .distinct()
        .join(ctrl, "__x", "left")
        .select("__x", F.coalesce("__cc", F.lit(0)).alias("__cc"))
    )
    w_below = (
        Window.orderBy("__x").rowsBetween(Window.unboundedPreceding, -1)
    )
    grid = grid.withColumn(
        "__below", F.coalesce(F.sum("__cc").over(w_below), F.lit(0))
    )
    j = cells.join(grid, "__x")  # value-cardinality both sides; let AQE
    # pick the strategy (a forced broadcast would cap the value grid)
    per_v = j.groupBy("__v").agg(
        F.sum("__c").cast("bigint").alias("n"),
        F.sum(
            F.col("__c")
            * (F.lit(2) * F.col("__below") + F.col("__cc"))
        )
        .cast("bigint")
        .alias("__u2"),
        # tie-correction needs Σ(t³−t) over the PAIR's pooled sample:
        # t_x = cnt_v(x) + cnt_c(x). (t³−t) expands so the sum splits
        # into per-variant integer sums — no second pass:
        F.sum(
            (F.col("__c") + F.col("__cc"))
            * (F.col("__c") + F.col("__cc"))
            * (F.col("__c") + F.col("__cc"))
            - (F.col("__c") + F.col("__cc"))
        )
        .cast("bigint")
        .alias("__t3"),
    )
    # control sample size and control-internal tie mass as ONE-ROW
    # aggregates (cross-joined back — never a driver-side count)
    ctrl_all = grid.agg(
        F.sum("__cc").cast("bigint").alias("__n_c"),
        F.sum(
            F.col("__cc") * F.col("__cc") * F.col("__cc") - F.col("__cc")
        ).cast("bigint").alias("__t3_ctrl_all"),
    )
    shared_ctrl = j.groupBy("__v").agg(
        F.sum(
            F.col("__cc") * F.col("__cc") * F.col("__cc") - F.col("__cc")
        ).cast("bigint").alias("__t3_ctrl_shared")
    )
    per_v = (
        per_v.join(shared_ctrl, "__v")
        .crossJoin(F.broadcast(ctrl_all))
        .withColumn(
            "__t3_total",
            F.col("__t3")
            + (F.col("__t3_ctrl_all") - F.col("__t3_ctrl_shared")),
        )
    )
    nv = F.col("n").cast("double")
    ncD = F.col("__n_c").cast("double")
    nD = nv + ncD
    u = F.col("__u2").cast("double") / F.lit(2.0)
    mu = nv * ncD / F.lit(2.0)
    tie_term = F.col("__t3_total").cast("double") / (
        nD * (nD - F.lit(1.0))
    )
    var_ = nv * ncD / F.lit(12.0) * ((nD + F.lit(1.0)) - tie_term)
    z = (u - mu) / F.sqrt(var_)
    usable = (
        (F.col("__v") != control)
        & (F.col("n") >= min_n)
        & (F.col("__n_c") >= min_n)
        & (var_ > 0)
    )
    return per_v.select(
        F.col("__v").alias("variant"),
        "n",
        F.when(F.col("__v") != control, F.round(u, 6)).alias("u"),
        F.when(usable, F.round(z, 6)).alias("z"),
        F.when(usable, F.abs(z) > 1.959964).alias("significant"),
    ).orderBy("variant")


def column_cardinalities(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Exact distinct-value counts and null counts for a declared column
    list in ONE aggregation — the cardinality inventory that sizes
    dictionary encodings, join strategies and partition keys before any
    plan commits to them. Spark plans multiple COUNT(DISTINCT) in a
    single agg via the Expand operator (rows × |cols|, map-side
    combined) — one scan, one shuffle, no per-column passes. Output:
    long format (column, n_rows, n_nulls, n_distinct) ordered by
    column name (distinct counts exclude NULL, per SQL semantics).
    Engine addition; no reference counterpart.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.countDistinct(F.col(c)).cast("bigint").alias(f"__d_{c}"))
        aggs.append(
            F.sum(F.col(c).isNull().cast("int"))
            .cast("bigint")
            .alias(f"__z_{c}")
        )
    one = df.agg(*aggs)
    # melt by exploding a struct array off the ONE-ROW aggregate — a
    # per-column union would let column pruning split the aggregate
    # into per-column scans (measured: Union of N single-distinct
    # aggregates, N scans — the opposite of the operator's point)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__z_{c}").alias("n_nulls"),
                F.col(f"__d_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return (
        one.select(F.explode(rows).alias("__s"))
        .select("__s.*")
        .orderBy("column")
    )


def null_correlation(
    df: DataFrame, cols: list[str]
) -> DataFrame:
    """Pairwise missingness association (phi coefficient) between the
    declared columns — the JOINT-nullability readout ``null_patterns``'
    census motivates: phi ≈ 1 means two columns go missing TOGETHER
    (one upstream feed), phi ≈ −1 means exclusively (two alternative
    sources), phi ≈ 0 means independent gaps. For each ordered pair
    (a < b by position): the 2×2 contingency of (a null?, b null?) in
    ONE aggregation pass — |cols|² conditional sums, map-side combined,
    one one-row exchange — then φ = (n11·n00 − n10·n01)/√(r1·r0·c1·c0)
    in a fixed double order from exact integer counts. Degenerate
    margins (a column always or never null) emit NULL phi. Output:
    (col_a, col_b, n, n_both_null, phi) 6 dp, ordered. Engine
    addition; no reference counterpart.
    """
    flags = [F.col(c).isNull().cast("long").alias(f"__f{i}")
             for i, c in enumerate(cols)]
    base = df.select(*flags)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for i in range(len(cols)):
        aggs.append(F.sum(f"__f{i}").cast("bigint").alias(f"__m{i}"))
        for j in range(i + 1, len(cols)):
            aggs.append(
                F.sum(F.col(f"__f{i}") * F.col(f"__f{j}"))
                .cast("bigint")
                .alias(f"__b{i}_{j}")
            )
    one = base.agg(*aggs)
    pair_structs = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            n = F.col("__n").cast("double")
            n11 = F.col(f"__b{i}_{j}").cast("double")
            r1 = F.col(f"__m{i}").cast("double")
            c1 = F.col(f"__m{j}").cast("double")
            n10 = r1 - n11
            n01 = c1 - n11
            n00 = n - r1 - c1 + n11
            den = F.sqrt(r1 * (n - r1) * c1 * (n - c1))
            phi = F.when(den > 0, (n11 * n00 - n10 * n01) / den)
            pair_structs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    F.col("__n").alias("n"),
                    F.col(f"__b{i}_{j}").alias("n_both_null"),
                    F.round(phi, 6).alias("phi"),
                )
            )
    return (
        one.select(F.explode(F.array(*pair_structs)).alias("__s"))
        .select("__s.*")
        .orderBy("col_a", "col_b")
    )


def weighted_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    pcts_ppm: tuple[int, ...] = (500_000, 900_000),
) -> DataFrame:
    """Per-group WEIGHTED quantiles — the smallest value whose
    cumulative weight reaches p·W (weighted percentile_disc): the
    volume-weighted median/p90 that row-counted quantiles misstate
    whenever rows carry different mass (revenue per order line, tokens
    per document, bytes per file).

    Pure integer machinery: weights round to integers up front, ONE
    per-group ordered window gives the running weight (ties on the
    value commute — equal values are interchangeable under any
    within-tie order, so the cut VALUE is deterministic without a
    tie-break), the cut thresholds are ceil(p_ppm·W / 1e6) in BIGINT
    (overflow bound W < 2^63/1e6 ≈ 9.2e12 total weight per group,
    documented), and each quantile reads off as min(value WHERE
    cum >= k) in the SAME key-partitioned aggregation — no second
    shuffle. Zero/negative-weight rows drop (they have no mass).
    Output: group_cols + (n, total_weight, p<..> columns), values in
    original units 6 dp, ordered. Engine addition; no reference
    counterpart.
    """
    enc = df.filter(
        F.col(value_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    ).select(
        *group_cols,
        F.round(F.col(value_col).cast("double") * 100)
        .cast("bigint")
        .alias("__x"),
        F.round(F.col(weight_col).cast("double"))
        .cast("bigint")
        .alias("__w"),
    ).filter(F.col("__w") > 0)
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*group_cols)
    ranked = enc.withColumn("__cw", F.sum("__w").over(w_ord)).withColumn(
        "__tw", F.sum("__w").over(w_all)
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.max("__tw").cast("bigint").alias("total_weight"),
    ]
    for ppm in pcts_ppm:
        k = F.expr(
            f"greatest(1L, ({int(ppm)}L * __tw + 999999L) div 1000000L)"
        )
        aggs.append(
            F.round(
                F.min(F.when(F.col("__cw") >= k, F.col("__x"))).cast(
                    "double"
                )
                / F.lit(100.0),
                6,
            ).alias(f"p{ppm // 10000}_weighted")
        )
    return ranked.groupBy(*group_cols).agg(*aggs).orderBy(*group_cols)


def l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l_threshold: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    blind spot, covered: a QI class can be population-safe (n ≥ k) while
    its SENSITIVE attribute is near-constant, so membership alone
    discloses the sensitive value (the homogeneity attack). Per QI
    equivalence class: population, number of distinct sensitive values,
    the sensitive-distribution entropy (nats, nano-pinned terms —
    order-independent, engine-exact) and ``risky`` = fewer than
    ``l_threshold`` distinct sensitive values. Runs beside
    ``k_anonymity`` in the pre-release privacy gate.

    Scale shape: ONE (QI..., sensitive) cell aggregation (map-side
    combined; shuffle = cell cardinality, never rows), then a
    class-keyed rollup of the cells — entropy terms pin to integer
    nano-units inside the rollup. NULL sensitive values are a real
    class operationally (they group; COUNT of cells includes them —
    the chi2 NULL-category discipline).
    """
    cells = df.groupBy(
        *qi_cols, F.col(sensitive_col).alias("__s")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    cw = Window.partitionBy(*qi_cols)
    frac = F.col("__c").cast("double") / F.sum("__c").over(cw).cast(
        "double"
    )
    ent_nano = F.round(
        F.round(frac * F.log(frac) * F.lit(-1.0), 9) * 1e9, 0
    ).cast("long")
    return (
        cells.select(*qi_cols, "__c", ent_nano.alias("__e"))
        .groupBy(*qi_cols)
        .agg(
            F.sum("__c").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_sensitive"),
            F.round(F.sum("__e").cast("double") / 1e9, 6).alias(
                "entropy_nats"
            ),
        )
        .withColumn("risky", F.col("n_sensitive") < l_threshold)
        .orderBy(*qi_cols)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon_milli: int = 1000,
    seed: int = 42,
    *,
    deterministic_noise: bool = False,
) -> DataFrame:
    """epsilon-DP histogram release (Laplace mechanism, Dwork 2006): per
    group, count + Laplace(1/epsilon) noise -- the noisy-counts release
    that lets aggregate statistics ship without exposing any
    individual's membership (a count has sensitivity 1, so the noise
    scale is b = 1/epsilon; epsilon arrives in milli-units to keep the
    parameter integer). The raw count is deliberately NOT emitted --
    publishing it beside the noisy one would defeat the mechanism.

    Noise source (round-12 advisor fix -- the safe path is the DEFAULT):
    by default the uniform draw is Spark's unseeded ``F.rand()`` -- a
    fresh, non-replayable draw per release, so the published counts
    actually hide the raw ones. Passing ``deterministic_noise=True``
    (explicit opt-in, keyword-only) switches to an md5-derived uniform
    keyed on (group key, ``seed``): REPLAYABLE BY ANYONE WHO KNOWS THE
    SEED, hence ZERO actual privacy -- it exists so tests and the DuckDB
    oracle can verify the mechanism bit-for-bit, and so repeated
    releases of the same groups reuse the same noise (the correct
    budget discipline for a fixed release). Everything downstream of
    the uniform -- the inverse-CDF transform, the tail clamp, the
    rounding -- is identical on both paths.

    One map-side-combined count aggregation; the noise is a projection.
    Output: (groups..., noisy_count 6 dp, epsilon_milli), ordered.
    """
    if epsilon_milli <= 0:
        raise ValueError(
            f"epsilon_milli must be positive: {epsilon_milli}"
        )
    # ASCII unit separator, not '|': group values containing the
    # separator must not make two different group tuples share noise
    key = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x1e"))
            for c in group_cols
        ],
        F.lit(f"dp:{seed}"),
    )
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n")
    )
    if deterministic_noise:
        h60 = "CAST(conv(substring(md5(__k), 1, 15), 16, 10) AS BIGINT)"
        u = (F.expr(h60) % F.lit(1_000_000_000)).cast("double") / 1e9
    else:
        # unseeded rand(): Spark picks a fresh random seed per plan, so
        # the noise cannot be recomputed and subtracted by a consumer
        u = F.rand()
    a = F.abs(u - 0.5)
    # clamp the tail so ln never sees 0 (u = 0 is a real hash outcome)
    lap = (
        F.lit(-1000.0 / epsilon_milli)
        * F.signum(u - 0.5)
        * F.log(F.greatest(1.0 - 2.0 * a, F.lit(1e-9)))
    )
    return (
        counts.withColumn("__k", key)
        .select(
            *group_cols,
            F.round(F.col("__n") + lap, 6).alias("noisy_count"),
            F.lit(int(epsilon_milli)).cast("int").alias("epsilon_milli"),
        )
        .orderBy(*group_cols)
    )


def frequency_movers(
    df: DataFrame,
    key_col: str,
    slice_col: Column,
    top_k: int = 20,
) -> DataFrame:
    """Top frequency movers between two data slices -- the categorical
    "what CHANGED most" readout beside chi2's "did anything change":
    per key, its share of each slice in integer ppm and the share
    delta; the ``top_k`` largest absolute movers survive (ties break
    on the key -- a total order, so the cut is engine-deterministic).
    ``slice_col`` evaluates to 0 (old) or 1 (new), the PSI convention.
    Keys absent from a slice read share 0 there (appearing/vanishing
    keys are the most interesting movers, never dropped).

    One (key, slice) cell aggregation (map-side combined; shuffle =
    cell cardinality), slice totals broadcast back, and a
    TakeOrderedAndProject cut. Output: (key, n_old, n_new, ppm_old,
    ppm_new, delta_ppm), |delta| descending.

    Streaming resident: this is ``frequency_cells`` (the additively
    foldable map half) + ``frequency_movers_from_cells`` (the readout) —
    the psi/ks/kappa foreachBatch discipline (tests/test_streaming.py).
    """
    return frequency_movers_from_cells(
        frequency_cells(df, key_col, slice_col), key_col, top_k=top_k
    )


def frequency_cells(
    df: DataFrame, key_col: str, slice_col: Column
) -> DataFrame:
    """Per-batch (key, slice, cnt) cells — the streaming-foldable map
    half of ``frequency_movers``: cells fold ADDITIVELY across
    micro-batches (append per-batch cells, sum counts per cell), so a
    foreachBatch ledger + ``frequency_movers_from_cells`` equals the
    one-shot readout. NULL keys/slices are dropped here, the batch
    operator's contract."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            slice_col.cast("int").alias("slice"),
        )
        .filter(F.col("key").isNotNull() & F.col("slice").isNotNull())
        .groupBy("key", "slice")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def frequency_movers_from_cells(
    cells: DataFrame, key_col: str, top_k: int = 20
) -> DataFrame:
    """Frequency-movers readout from a PRE-AGGREGATED (key, slice, cnt)
    ledger — the reduce half of the streaming resident (see
    ``frequency_cells``). Folds duplicate cells first, so a
    multi-batch append ledger and a one-shot cells frame read
    identically."""
    cells = (
        cells.select(
            F.col("key").alias("__k"),
            F.col("slice").cast("int").alias("__s"),
            F.col("cnt").cast("bigint").alias("__c"),
        )
        .groupBy("__k", "__s")
        .agg(F.sum("__c").cast("bigint").alias("__c"))
    )
    totals = cells.groupBy("__s").agg(
        F.sum("__c").cast("bigint").alias("__t")
    )
    j = cells.join(F.broadcast(totals), "__s").select(
        "__k",
        F.when(F.col("__s") == 0, F.col("__c")).alias("__co"),
        F.when(F.col("__s") == 1, F.col("__c")).alias("__cn"),
        F.when(
            F.col("__s") == 0,
            F.expr("CAST(1000000 * __c div __t AS BIGINT)"),
        ).alias("__po"),
        F.when(
            F.col("__s") == 1,
            F.expr("CAST(1000000 * __c div __t AS BIGINT)"),
        ).alias("__pn"),
    )
    agg = j.groupBy(F.col("__k").alias(key_col)).agg(
        F.coalesce(F.max("__co"), F.lit(0)).cast("bigint").alias("n_old"),
        F.coalesce(F.max("__cn"), F.lit(0)).cast("bigint").alias("n_new"),
        F.coalesce(F.max("__po"), F.lit(0))
        .cast("bigint")
        .alias("ppm_old"),
        F.coalesce(F.max("__pn"), F.lit(0))
        .cast("bigint")
        .alias("ppm_new"),
    )
    delta = (F.col("ppm_new") - F.col("ppm_old")).cast("bigint")
    return (
        agg.select(key_col, "n_old", "n_new", "ppm_old", "ppm_new",
                   delta.alias("delta_ppm"))
        .orderBy(F.abs(F.col("delta_ppm")).desc(), F.col(key_col))
        .limit(top_k)
    )


def null_rate_drift(
    df: DataFrame,
    ts_col: str,
    cols: list[str],
) -> DataFrame:
    """Null-rate drift per column per ISO week — the TIME dimension the
    one-shot null census (null_patterns / dq_checks) lacks: a producer
    change rarely flips a column all-NULL at once, it starts nulling
    NEW rows, and the weekly ppm series with its week-over-week delta
    is where that shows first. Rows with NULL timestamps group under a
    NULL week (a real category — they are themselves a data-quality
    signal).

    ONE (week, column) cell pass — the per-column null flags stack via
    an inline explode so the input scans once (not once per column) —
    then integer ppm and a lag-1 delta over the column-keyed window
    (previous-week delta is NULL on each column's first week). Output:
    (week, col_name, n, n_null, null_ppm, delta_ppm), ordered.
    """
    return null_drift_from_cells(null_week_cells(df, ts_col, cols))


def null_week_cells(
    df: DataFrame,
    ts_col: str,
    cols: list[str],
) -> DataFrame:
    """Per-batch (week, col_name, n, n_null) null-census cells — the map
    half of the streaming null-drift resident. Counts are plain sums,
    so cells fold ADDITIVELY across micro-batches (append per-batch
    cells, re-sum per (week, col_name)); foreachBatch ledger +
    ``null_drift_from_cells`` ≡ the one-shot ``null_rate_drift`` — the
    psi_bucket_cells / activity_user_cells discipline
    (tests/test_streaming.py)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    stacked = df.select(
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).isNull().cast("int").alias("is_null"),
                    )
                    for c in cols
                ]
            )
        ).alias("__s"),
    ).select("week", "__s.col_name", "__s.is_null")
    return stacked.groupBy("week", "col_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum("is_null"), F.lit(0))
        .cast("bigint")
        .alias("n_null"),
    )


def null_drift_from_cells(cells: DataFrame) -> DataFrame:
    """Null-drift readout from a PRE-AGGREGATED (week, col_name, n,
    n_null) ledger — the streaming-foldable half of
    ``null_rate_drift``: re-collapse the (possibly multi-batch append)
    ledger by summation, then the integer-ppm series and its lag-1
    delta over the column-keyed window. The re-collapse groupBy shares
    the cells' partitioning keys, so composing the two halves in one
    batch plan costs no extra exchange."""
    cells = cells.groupBy("week", "col_name").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("n_null").cast("bigint").alias("n_null"),
    )
    ppm = F.expr("CAST(1000000 * n_null div n AS BIGINT)")
    w = Window.partitionBy("col_name").orderBy(F.asc_nulls_first("week"))
    return (
        cells.withColumn("null_ppm", ppm)
        .withColumn(
            "delta_ppm",
            F.col("null_ppm") - F.lag("null_ppm").over(w),
        )
        .select("week", "col_name", "n", "n_null", "null_ppm",
                "delta_ppm")
        .orderBy(F.asc_nulls_first("week"), "col_name")
    )


def candidate_keys(
    df: DataFrame, combos: list[list[str]]
) -> DataFrame:
    """Candidate-key / uniqueness audit over declared column combos:
    per combo the exact duplicate-tuple census (n_rows, n_groups,
    dup_rows, uniqueness_ppm, is_key) — the schema-governance readout
    that decides which columns can anchor joins, dedup keys and CDC
    merge conditions (a "key" that is 99.8% unique silently fans out
    every downstream join). NULL tuples group together (SQL GROUP BY
    semantics — a nullable column can still be audited, and the NULL
    group's mass shows up as duplication).

    Scale shape: one group-by-combo exchange per audited combo, each
    reduced map-side to its group counts and then to a SINGLE summary
    row before the union — k combos = k scans + k keyed exchanges of
    group-cardinality (not row) volume, no row ever leaves its
    aggregation. Combos are a declared, plan-time-bounded list.
    """
    outs = []
    for cols in combos:
        name = "+".join(cols)
        g = df.groupBy(*cols).agg(F.count("*").alias("__c"))
        outs.append(
            g.agg(
                F.sum("__c").cast("bigint").alias("n_rows"),
                F.count("*").cast("bigint").alias("n_groups"),
            ).select(
                F.lit(name).alias("combo"),
                "n_rows",
                "n_groups",
                (F.col("n_rows") - F.col("n_groups"))
                .cast("bigint")
                .alias("dup_rows"),
                F.expr(
                    "CAST(1000000 * n_groups div n_rows AS BIGINT)"
                ).alias("uniqueness_ppm"),
                (F.col("n_rows") == F.col("n_groups")).alias("is_key"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("combo")


def sequence_gap_audit(
    df: DataFrame,
    id_col: str,
    bucket_size: int = 100_000,
    min_missing: int = 1,
) -> DataFrame:
    """Id-sequence gap audit: every maximal run of MISSING ids between
    consecutive observed values of ``id_col`` (gap_start, gap_end,
    n_missing ≥ ``min_missing``) — the ingestion-loss detector for
    streams whose producer assigns dense sequence numbers (a silent
    dropped batch shows up as one exact gap range, long before a row
    count drifts). Duplicated ids collapse first; the audit reports
    holes, not multiplicity.

    Scale shape — the two-level trick that avoids a GLOBAL sort: ids
    hash into ``bucket_size`` ranges (id div bucket_size), within-bucket
    gaps come off per-bucket ordered windows (one keyed exchange), and
    cross-bucket gaps come off the bucket SUMMARY table (min/max per
    non-empty bucket — data/bucket_size rows, metadata-scale for any
    sane bucket size), whose single-partition window is therefore safe.
    The union is exactly the global consecutive-pair gap set: every
    consecutive observed pair either shares a bucket or spans two
    consecutive non-empty bucket summaries.
    """
    ids = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__id"))
        .distinct()
        .withColumn(
            "__b", F.expr(f"CAST(__id div {int(bucket_size)} AS BIGINT)")
        )
    )
    win = Window.partitionBy("__b").orderBy("__id")
    within = (
        ids.withColumn("__prev", F.lag("__id", 1).over(win))
        .filter(
            F.col("__prev").isNotNull()
            & (F.col("__id") - F.col("__prev") > 1)
        )
        .select(
            (F.col("__prev") + 1).alias("gap_start"),
            (F.col("__id") - 1).alias("gap_end"),
        )
    )
    bounds = ids.groupBy("__b").agg(
        F.min("__id").alias("__lo"), F.max("__id").alias("__hi")
    )
    bwin = Window.orderBy("__b")
    across = (
        bounds.withColumn("__phi", F.lag("__hi", 1).over(bwin))
        .filter(
            F.col("__phi").isNotNull()
            & (F.col("__lo") - F.col("__phi") > 1)
        )
        .select(
            (F.col("__phi") + 1).alias("gap_start"),
            (F.col("__lo") - 1).alias("gap_end"),
        )
    )
    return (
        within.unionByName(across)
        .withColumn(
            "n_missing",
            (F.col("gap_end") - F.col("gap_start") + 1).cast("bigint"),
        )
        .filter(F.col("n_missing") >= min_missing)
        .select(
            F.col("gap_start").cast("bigint"),
            F.col("gap_end").cast("bigint"),
            "n_missing",
        )
        .orderBy("gap_start")
    )


def mad_profile(
    df: DataFrame,
    cols: list[str],
    k: int = 3,
) -> DataFrame:
    """Robust per-column profile: exact median, exact MAD (median
    absolute deviation) and the |x − med| > k·MAD outlier census — the
    heavy-tail-proof screen beside the mean/stddev profile (one wild
    sensor value moves a z-score filter's own yardstick; the MAD
    yardstick doesn't move). No consistency constant (1.4826) is
    applied: k multiplies the RAW MAD, keeping the cut integer-free of
    libm and the contract distribution-free.

    Shape: the two-phase exact-percentile kernel runs twice (values,
    then absolute deviations about the collected medians — deviations
    are a scan-time projection, never materialized), then one counting
    pass with (median, k·MAD) as plan-time literals. Driver state stays
    the kernel's bounded statistics. Both median and MAD round to 6 dp
    BEFORE the outlier comparison on BOTH engines, so a borderline
    point cannot flip on interpolation noise. Output: (col_name, n,
    median, mad, n_outliers), ordered. Engine addition; no reference
    counterpart.
    """
    if not cols:
        raise ValueError("mad_profile: no columns given")
    spark = df.sparkSession
    med_rows = exact_percentiles(df, cols, [0.5], round_to=6).collect()
    med = {r["col_name"]: r["value"] for r in med_rows}
    live = [c for c in cols if med.get(c) is not None]
    if not live:
        return spark.createDataFrame(
            [],
            "col_name string, n bigint, median double, mad double,"
            " n_outliers bigint",
        )
    dev_args = ", ".join(
        f"'{c}', abs(cast(`{c}` as double) - cast({med[c]!r} as double))"
        for c in live
    )
    dev_long = df.select(
        F.expr(f"stack({len(live)}, {dev_args}) AS (col_name, val)")
    ).filter(F.col("val").isNotNull())
    mad_rows = _percentiles_from_long(dev_long, [0.5], 6).collect()
    mad = {r["col_name"]: r["value"] for r in mad_rows}
    aggs = []
    for c in live:
        cut = float(k) * mad[c]
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"{c}__n"))
        aggs.append(
            F.sum(
                (
                    F.abs(
                        F.col(c).cast("double")
                        - F.lit(float(med[c]))
                    )
                    > F.lit(cut)
                ).cast("int")
            )
            .cast("bigint")
            .alias(f"{c}__o")
        )
    row = df.agg(*aggs).collect()[0]
    out_rows = [
        (
            c,
            row[f"{c}__n"],
            float(med[c]),
            float(mad[c]),
            row[f"{c}__o"] if row[f"{c}__o"] is not None else 0,
        )
        for c in live
    ]
    return spark.createDataFrame(
        out_rows,
        "col_name string, n bigint, median double, mad double,"
        " n_outliers bigint",
    ).orderBy("col_name")


def mad_profile_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 3,
) -> DataFrame:
    """PER-GROUP robust MAD outlier census — ``mad_profile``'s exact
    median/MAD/|x−med| > k·MAD screen lifted to grouped form (one row
    per group): the per-segment anomaly audit a metrics pipeline runs
    where a single global yardstick would let one segment's heavy tail
    mask another's outliers. Group keys compare AS STRINGS (the
    grouped-percentile kernel's contract); NULL groups are a real
    category (SQL GROUP BY semantics, null-safe joins end to end).

    Shape: the grouped two-phase percentile kernel runs twice (values,
    then absolute deviations about the per-group medians), with the
    group-bounded (med, cut) table re-entering as a BROADCAST literal
    relation both times — driver state stays ≤ groups·bucket rows, no
    per-group sort of row data. Median and MAD round to 6 dp BEFORE
    the cut on both engines (the mad_profile discipline). Output:
    (group, n, median, mad, n_outliers, outlier_ppm), ordered by
    group. Engine addition; no reference counterpart.
    """
    spark = df.sparkSession
    gs = F.col(group_col).cast("string")
    base = df.filter(F.col(value_col).isNotNull()).select(
        gs.alias("__g"), F.col(value_col).cast("double").alias("__v")
    )
    med_rows = grouped_exact_medians(
        df, group_col, [value_col], round_to=6
    ).collect()
    med = {r[group_col]: r["median"] for r in med_rows}
    if not med:
        return spark.createDataFrame(
            [],
            f"{group_col} string, n bigint, median double, mad double,"
            " n_outliers bigint, outlier_ppm bigint",
        )
    med_f = spark.createDataFrame(
        [(g, float(m)) for g, m in med.items()],
        "__g string, __med double",
    )
    dev_long = (
        base.join(
            F.broadcast(med_f),
            base["__g"].eqNullSafe(med_f["__g"]),
        )
        .select(
            F.concat(
                F.coalesce(base["__g"], F.lit(_GRP_NULL)),
                F.lit(_GRP_SEP),
                F.lit(value_col),
            ).alias("col_name"),
            F.abs(F.col("__v") - F.col("__med")).alias("val"),
        )
    )
    mad_rows = _percentiles_from_long(dev_long, [0.5], 6).collect()
    mad = {}
    for r in mad_rows:
        g = r["col_name"].split(_GRP_SEP, 1)[0]
        mad[None if g == _GRP_NULL else g] = r["value"]
    cut_f = spark.createDataFrame(
        [
            (g, float(med[g]), float(mad[g]), float(k) * float(mad[g]))
            for g in med
            if mad.get(g) is not None
        ],
        "__g string, __med double, __mad double, __cut double",
    )
    return (
        base.join(
            F.broadcast(cut_f), base["__g"].eqNullSafe(cut_f["__g"])
        )
        .groupBy(base["__g"], "__med", "__mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                (F.abs(F.col("__v") - F.col("__med")) > F.col("__cut"))
                .cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            F.col("__g").alias(group_col),
            "n",
            F.col("__med").alias("median"),
            F.col("__mad").alias("mad"),
            "n_outliers",
            F.expr("CAST((1000000 * n_outliers) div n AS BIGINT)").alias(
                "outlier_ppm"
            ),
        )
        .orderBy(group_col)
    )


def fdr_family_cells(
    df: DataFrame, group_col: str, conv_col: str
) -> DataFrame:
    """Per-batch (group, n, k) conversion counters for the streaming
    FDR resident — plain integer sums, so cells fold ADDITIVELY across
    micro-batches (the calibration/conversion-CI discipline);
    foreachBatch ledger + ``fdr_from_family_cells`` ≡ the one-shot
    family test, batch≡stream pinned in tests/test_streaming.py."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.coalesce(F.sum(F.col(conv_col).cast("int")), F.lit(0))
        .cast("bigint")
        .alias("k"),
    )


def fdr_from_family_cells(
    cells: DataFrame, group_col: str, q_ppm: int = 50_000
) -> DataFrame:
    """Benjamini–Hochberg readout from a PRE-AGGREGATED (group, n, k)
    ledger: re-collapse the append ledger by summation, recompute the
    distribution-free Hoeffding p-value 2·exp(−2n·d²) against the
    pooled rate (integer-ppm, the pf_fdr spelling — nonlinear in the
    counters, so the resident folds counters and recomputes), then run
    the cross-multiplied step-up rule. The one-shot catalog row
    composes these same two halves, so batch ≡ one-shot is definitional
    rather than coincidental."""
    per = cells.groupBy(group_col).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("k"),
    )
    tot = per.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("k").cast("bigint").alias("kk"),
    )
    d = F.col("k").cast("double") / F.col("n").cast("double") - F.col(
        "kk"
    ).cast("double") / F.col("nn").cast("double")
    p_ppm = F.least(
        F.lit(1_000_000),
        F.round(
            F.lit(2.0)
            * F.exp(F.lit(-2.0) * F.col("n").cast("double") * d * d)
            * F.lit(1_000_000.0)
        ).cast("bigint"),
    )
    stats = per.crossJoin(F.broadcast(tot)).select(
        group_col, p_ppm.alias("p_ppm")
    )
    return fdr_bh(stats, group_col, "p_ppm", q_ppm=q_ppm)


def fdr_bh(
    df: DataFrame,
    id_col: str,
    p_ppm_col: str,
    q_ppm: int = 50_000,
) -> DataFrame:
    """Benjamini–Hochberg FDR control over a family of tests — the
    multiple-comparisons gate a metrics sweep needs before acting: run
    m tests at α and ~α·m of the "wins" are noise; BH bounds the
    expected FALSE-DISCOVERY share of the rejected set at q instead.
    Step-up rule: sort p ascending, find the LARGEST rank i with
    p_(i) ≤ i·q/m, reject tests 1..i (including any p above its own
    line but below a later crossing — the step-up subtlety naive
    per-row thresholding gets wrong).

    Engine-exactness: p-values arrive as integer PPM (the engine's
    test operators emit integer-ppm statistics), the comparison is the
    cross-multiplied integer inequality p_ppm·m ≤ rank·q_ppm (no
    division, no float), ties order by id. Scale shape: one rank
    window + one running-max window over the SAME m-ordered exchange —
    m is family-sized (tests, not rows). Output: (id, p_ppm, rank,
    rejected), ordered by (rank, id). Engine addition; no reference
    counterpart.
    """
    if not 0 < q_ppm < 1_000_000:
        raise ValueError(f"q_ppm must be in (0, 1e6): {q_ppm}")
    base = df.filter(F.col(p_ppm_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(p_ppm_col).cast("bigint").alias("p_ppm"),
    )
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy("p_ppm", "id")
    w_run = Window.partitionBy().orderBy("p_ppm", "id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.withColumn("m", F.count(F.lit(1)).over(w_all)).withColumn(
        "rank", F.row_number().over(w_rank).cast("bigint")
    )
    hit = F.when(
        F.col("p_ppm") * F.col("m") <= F.col("rank") * F.lit(q_ppm),
        F.col("rank"),
    )
    return (
        ranked.withColumn("__cut", F.max(hit).over(w_run))
        .select(
            "id",
            "p_ppm",
            F.col("rank").cast("bigint").alias("rank"),
            F.coalesce(
                F.col("rank") <= F.col("__cut"), F.lit(False)
            ).alias("rejected"),
        )
        .orderBy("rank", "id")
    )
