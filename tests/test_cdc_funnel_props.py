"""Randomized cross-checks of the CDC and funnel operators against
pure-Python reference implementations — the same one-big-DataFrame
seeded-random pattern as test_pipeline_props (hypothesis-per-example
would pay one Spark job per example).

These catch semantics bugs the star-schema oracle data can't: dense
timestamp ties, single-observation entities, all-delete feeds, users
whose events arrive in pathological orders.
"""

from __future__ import annotations

import datetime as dt
import random

from calp_cva_tracking_pipeline_spark.operators.cdc import (
    apply_changeset,
    scd2_history,
)
from calp_cva_tracking_pipeline_spark.operators.funnel import funnel_steps

_D0 = dt.datetime(2024, 1, 1)


def _ts(h):
    return _D0 + dt.timedelta(hours=h)


def test_scd2_matches_python_reference_random(spark):
    rng = random.Random(4242)
    rows = []
    for ent in range(60):
        n = rng.randint(1, 12)
        # small hour range forces (ts) ties; tiebreak column disambiguates
        obs = sorted(
            ((rng.randint(0, 6), seq) for seq in range(n)),
        )
        for h, seq in obs:
            rows.append((ent, _ts(h), seq + ent * 100,
                         rng.choice(["A", "B", None])))
    df = spark.createDataFrame(
        rows, "id bigint, ts timestamp, seq bigint, attr string"
    )
    got = sorted(
        (
            (r.id, r.attr, r.effective_from, r.effective_to, r.version,
             r.is_current)
            for r in scd2_history(
                df, ["id"], "ts", ["attr"], ["seq"]
            ).collect()
        ),
        key=repr,
    )

    # pure-Python reference: sort per entity by (ts, seq), RLE on attr
    expect = []
    by_ent: dict[int, list] = {}
    for ent, ts, seq, attr in rows:
        by_ent.setdefault(ent, []).append((ts, seq, attr))
    for ent, obs in by_ent.items():
        obs.sort(key=lambda o: (o[0], o[1]))
        runs = []
        for ts, _seq, attr in obs:
            if not runs or runs[-1][1] != attr:
                runs.append([ts, attr])
        for i, (start, attr) in enumerate(runs):
            end = runs[i + 1][0] if i + 1 < len(runs) else None
            expect.append(
                (ent, attr, start, end, i + 1, end is None)
            )
    assert got == sorted(expect, key=repr)


def test_apply_changeset_matches_python_reference_random(spark):
    rng = random.Random(77)
    base_rows = [
        (i, _ts(rng.randint(0, 5)), float(rng.randint(0, 99)))
        for i in range(40)
    ]
    change_rows = [
        (
            rng.randint(0, 55),               # some ids not in base
            _ts(rng.randint(0, 10)),          # before/at/after base ts
            100.0 + j,                        # unique → total (ts,val,src)
            rng.random() < 0.25,
        )
        for j in range(120)
    ]
    base = spark.createDataFrame(
        base_rows, "id bigint, ts timestamp, val double"
    )
    changes = spark.createDataFrame(
        change_rows, "id bigint, ts timestamp, val double, is_deleted boolean"
    )
    out = apply_changeset(
        base, changes, ["id"], "ts", tiebreak_cols=["val"],
        delete_col="is_deleted",
    )
    got = sorted(map(tuple, out.collect()), key=repr)

    # reference: per id, max (ts, val, src) wins; delete flag drops it
    cand: dict[int, tuple] = {}
    for i, ts, val in base_rows:
        key = (ts, val, 0)
        if i not in cand or key > cand[i][0]:
            cand[i] = (key, val, False)
    for i, ts, val, dele in change_rows:
        key = (ts, val, 1)
        if i not in cand or key > cand[i][0]:
            cand[i] = (key, val, dele)
    expect = sorted(
        (
            (i, key[0], val)
            for i, (key, val, dele) in cand.items()
            if not dele
        ),
        key=repr,
    )
    assert got == expect


def test_funnel_matches_python_reference_random(spark):
    rng = random.Random(99)
    types = ["view", "click", "purchase", "noise"]
    rows = []
    for user in range(80):
        for _ in range(rng.randint(1, 15)):
            rows.append((user, _ts(rng.randint(0, 20)),
                         rng.choice(types)))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string")
    steps = ["view", "click", "purchase"]
    out = funnel_steps(df, "user_id", "ts", "event_type", steps)
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase, r.steps_completed)
        for r in out.collect()
    }

    by_user: dict[int, list] = {}
    for u, ts, et in rows:
        by_user.setdefault(u, []).append((ts, et))
    START = object()  # sentinel: first step has no lower bound
    for u, evs in by_user.items():
        prev = START
        expect_ts = []
        for step in steps:
            if prev is None:  # previous step missed → null forever after
                expect_ts.append(None)
                continue
            cands = [
                ts for ts, et in evs
                if et == step and (prev is START or ts > prev)
            ]
            t = min(cands) if cands else None
            expect_ts.append(t)
            prev = t
        completed = sum(1 for t in expect_ts if t is not None)
        assert got[u] == (*expect_ts, completed), (u, evs)
