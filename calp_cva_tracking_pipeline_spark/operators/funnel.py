"""Behavioral event analytics: ordered funnel conversion and cohort
retention.

No reference counterpart (the reference has no event/clickstream data —
SURVEY.md §2 is flows/orgs/deflators); engine additions for the events
table, the analytics a training-data pipeline's telemetry side needs
(conversion through ingest→filter→publish stages, cohort survival of
crawl sources week over week).

Scale design: both operators are ONE user-keyed exchange plus
unordered-frame windows (no orderBy → no per-partition sort at all for
the funnel's min-carry chain). ``funnel_steps``'s step-N time depends on
step N-1's, so each step is its own Window node — but every node shares
the same hashpartitioning, so Spark plans one shuffle and the per-user
group-collapse aggregation rides the same distribution exchange-free
(pinned in tests/test_plan_shapes.py). No joins, no row amplification;
user skew behaves like any keyed window. ``cohort_retention``'s second
exchange is the (cohort, offset) count-distinct aggregation — output-
sized, cardinality ≤ cohorts × horizon weeks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: per user, ``t_<step_i>`` is the earliest event of
    step i occurring STRICTLY AFTER the user's step-(i-1) time (first
    step: earliest occurrence overall). A null step time means the user
    never completed that step in order; later steps are then null by
    construction (the strictly-after predicate never matches against a
    null bound). ``steps_completed`` counts the non-null prefix. One row
    per user observed in ``df``.

    Strict ordering means simultaneous step-i/step-i+1 events do NOT
    both count — the conservative reading (a purchase logged at the
    same microsecond as the click it came from is one hop, not two).
    """
    w = Window.partitionBy(user_col)
    out = df
    prev: str | None = None
    names = []
    for step in steps:
        name = f"t_{step}"
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = name
        names.append(name)
    completed = sum(
        (F.col(n).isNotNull().cast("int") for n in names), F.lit(0)
    )
    return (
        out.groupBy(user_col)
        .agg(
            *[F.first(n).alias(n) for n in names],
        )
        .withColumn("steps_completed", completed)
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each adjacent pair in a user's (ts, tiebreak)-ordered
    stream, count (from_type → to_type) and row-normalize to transition
    probabilities (6 dp). Output: (from_type, to_type, n_transitions,
    prob); rows with no successor (each user's last event) contribute
    nothing.

    Plan: one user-keyed exchange for the lead window; everything after
    operates on the TYPE-PAIR cardinality (≤ |types|²), so the group
    and normalization exchanges are vocabulary-sized regardless of the
    event volume. The (ts, tiebreak) ordering must be total per user or
    adjacent pairs are partition-order-dependent."""
    tiebreak_cols = tiebreak_cols or []
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols]
    )
    pairs = (
        df.withColumn("__next", F.lead(type_col).over(w))
        .filter(F.col("__next").isNotNull())
        .select(
            F.col(type_col).alias("from_type"),
            F.col("__next").alias("to_type"),
        )
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    wrow = Window.partitionBy("from_type")
    return pairs.withColumn(
        "prob",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(wrow).cast("double"),
            6,
        ),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    week_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Cohort × week-offset retention counts: a user's cohort is the DAY
    of their first event; each (user, event) lands in the week bucket
    ``(event_epoch − first_event_epoch) div week_seconds`` — cohort-
    RELATIVE weeks (every user's week 0 starts at their own first
    event), so no calendar-week-boundary truncation artifacts and the
    arithmetic is exact integer epoch math cross-engine. Output:
    (cohort_day, week_offset, n_users) with distinct-user counts."""
    w = Window.partitionBy(user_col)
    first_ts = F.min(ts_col).over(w)
    return (
        df.withColumn("__first", first_ts)
        .select(
            F.col(user_col),
            F.col("__first").cast("date").alias("cohort_day"),
            (
                (
                    F.unix_timestamp(F.col(ts_col))
                    - F.unix_timestamp(F.col("__first"))
                )
                / week_seconds
            ).cast("bigint").alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )
