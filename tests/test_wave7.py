"""Seventh-wave operators: rolling time windows, OHLC downsampling,
touch attribution, robust outliers, closed-form OLS, Count-Min sketch,
leakage-safe group split, Jaro–Winkler linkage.

Each operator gets (a) a semantic check against an independent reference
(pure Python / numpy / DuckDB builtin), (b) a determinism check under
repartitioning where ordering could leak, and (c) a plan-shape pin for
the property its 100 TB story depends on.
"""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.operators.funnel import (
    touch_attribution,
)
from calp_cva_tracking_pipeline_spark.operators.joins import (
    _jaro_winkler_py,
    jaro_winkler_join,
)
from calp_cva_tracking_pipeline_spark.operators.profiling import (
    group_ols,
    robust_outliers,
)
from calp_cva_tracking_pipeline_spark.operators.rollup import ohlc_downsample
from calp_cva_tracking_pipeline_spark.operators.sampling import group_split
from calp_cva_tracking_pipeline_spark.operators.sketch import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)
from calp_cva_tracking_pipeline_spark.operators.temporal import (
    rolling_time_window,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# rolling_time_window
# ---------------------------------------------------------------------------


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )


def test_rolling_window_matches_bruteforce(spark):
    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            rng.randrange(4),
            i,
            t0 + dt.timedelta(hours=rng.randrange(24 * 30)),
            float(rng.randrange(100)),
        )
        for i in range(300)
    ]
    df = _mk_events(spark, rows)
    out = rolling_time_window(
        df,
        keys=["user_id"],
        ts_col="ts",
        aggs={"n_7d": F.count(F.lit(1))},
        window_spec="7 days",
    )
    got = {r["event_id"]: r["n_7d"] for r in out.collect()}
    span = dt.timedelta(days=7)
    for u, i, ts, _v in rows:
        want = sum(
            1 for u2, _i2, ts2, _v2 in rows if u2 == u and ts - span <= ts2 <= ts
        )
        assert got[i] == want, f"event {i}"


def test_rolling_window_tie_safe_under_repartition(spark):
    # duplicate timestamps within a key: RANGE frames treat them as peers,
    # so results must be identical for every physical layout
    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, i, t0 + dt.timedelta(days=i % 3), float(i)) for i in range(30)
    ]
    df = _mk_events(spark, rows)

    def run(d):
        out = rolling_time_window(
            d,
            keys=["user_id"],
            ts_col="ts",
            aggs={"s": F.sum(F.col("value").cast("decimal(18,2)"))},
            window_spec="1 days",
        )
        return sorted(
            (r["event_id"], float(r["s"])) for r in out.collect()
        )

    assert run(df) == run(df.repartition(7, "value"))


def test_rolling_window_single_exchange(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.tj_rolling_window(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# ohlc_downsample
# ---------------------------------------------------------------------------


def test_ohlc_matches_bruteforce_and_is_layout_independent(spark):
    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            rng.choice(["a", "b"]),
            i,
            t0 + dt.timedelta(minutes=rng.randrange(600)),
            float(rng.randrange(50)),
        )
        for i in range(200)
    ]
    # force ts ties: every third row shares its timestamp with row i-1
    rows = [
        (k, i, rows[i - 1][2] if i % 3 == 0 else ts, v)
        for i, (k, i2, ts, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        rows, "k string, id bigint, ts timestamp, value double"
    )

    def run(d):
        out = ohlc_downsample(
            d, ("k",), "ts", "value", "id", grain="1 hour"
        )
        return sorted(map(tuple, out.collect()))

    base = run(df)
    assert base == run(df.repartition(13, "value"))

    by_bucket = {}
    for k, i, ts, v in rows:
        b = ts.replace(minute=0, second=0, microsecond=0)
        by_bucket.setdefault((k, b), []).append((ts, i, v))
    for k, b, o, hi, lo, c, n in base:
        vals = by_bucket[(k, b)]
        assert n == len(vals)
        assert o == min(vals)[2] and c == max(vals)[2]
        assert hi == max(v for _t, _i, v in vals)
        assert lo == min(v for _t, _i, v in vals)


def test_ohlc_single_aggregate_no_sort_no_join(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.rt_ohlc(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "Window" not in plan


# ---------------------------------------------------------------------------
# touch_attribution
# ---------------------------------------------------------------------------


def test_attribution_matches_bruteforce(spark):
    rng = random.Random(23)
    t0 = dt.datetime(2024, 1, 1)
    types = ["click", "view", "purchase", "error"]
    rows = [
        (
            rng.randrange(5),
            i,
            t0 + dt.timedelta(hours=rng.randrange(24 * 40)),
            rng.choice(types),
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, event_type string"
    )
    out = touch_attribution(
        df,
        "user_id",
        "ts",
        "event_type",
        "event_id",
        ("click", "view"),
        "purchase",
        "7 days",
    ).collect()
    got = {r["conversion_id"]: r for r in out}
    span = dt.timedelta(days=7)
    convs = [r for r in rows if r[3] == "purchase"]
    assert len(out) == len(convs)
    for u, i, ts, _t in convs:
        touches = sorted(
            (ts2, i2, t2)
            for u2, i2, ts2, t2 in rows
            if u2 == u and t2 in ("click", "view") and ts - span <= ts2 <= ts
        )
        r = got[i]
        if not touches:
            assert r["first_touch_type"] is None
            assert r["last_touch_type"] is None
        else:
            assert (r["first_touch_ts"], r["first_touch_type"]) == (
                touches[0][0],
                touches[0][2],
            )
            assert (r["last_touch_ts"], r["last_touch_type"]) == (
                touches[-1][0],
                touches[-1][2],
            )


def test_attribution_zero_joins_one_exchange(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S

    plan = _executed(S.ev_attribution(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# robust_outliers / group_ols
# ---------------------------------------------------------------------------


def test_robust_outliers_flags_planted_point(spark):
    rows = [(i, float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 11, 10, 9, 500])]
    df = spark.createDataFrame(rows, "id bigint, v double")
    out = robust_outliers(df, "v", ["id"], z_threshold=3.5).collect()
    assert [r["id"] for r in out] == [8]
    assert out[0]["robust_z"] > 100  # 500 vs median 10, MAD 1


def test_robust_outliers_mad_zero_returns_empty(spark):
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(10)] + [(99, 50.0)], "id bigint, v double"
    )
    # >half identical values → MAD 0 → defined as no outliers, not all
    assert robust_outliers(df, "v", ["id"]).count() == 0


def test_group_ols_recovers_known_line(spark):
    rng = random.Random(5)
    rows = []
    for g, (a, b) in (("g1", (2.5, 10.0)), ("g2", (-1.0, 3.0))):
        for _ in range(200):
            x = rng.uniform(0, 50)
            rows.append((g, x, a * x + b + rng.uniform(-0.5, 0.5)))
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in group_ols(df, ["g"], "x", "y").collect()}
    assert abs(got["g1"]["slope"] - 2.5) < 0.01
    assert abs(got["g1"]["intercept"] - 10.0) < 0.3
    assert got["g1"]["r2"] > 0.999
    assert abs(got["g2"]["slope"] + 1.0) < 0.01


def test_group_ols_degenerate_groups_null_not_error(spark):
    df = spark.createDataFrame(
        [("one", 1.0, 2.0), ("flat", 3.0, 1.0), ("flat", 3.0, 9.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in group_ols(df, ["g"], "x", "y").collect()}
    assert got["one"]["slope"] is None and got["one"]["r2"] is None
    assert got["flat"]["slope"] is None  # zero x-variance


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def test_cms_merge_equals_sketch_of_union(spark):
    rng = random.Random(3)
    words = [f"w{rng.randrange(40)}" for _ in range(500)]
    a = spark.createDataFrame([(w,) for w in words[:200]], "tok string")
    b = spark.createDataFrame([(w,) for w in words[200:]], "tok string")
    u = a.unionByName(b)
    merged = sorted(map(tuple, cms_merge(cms_sketch(a, "tok"), cms_sketch(b, "tok")).collect()))
    direct = sorted(map(tuple, cms_sketch(u, "tok").collect()))
    assert merged == direct


def test_cms_estimates_are_one_sided_and_tight_for_heavy_keys(spark):
    rng = random.Random(9)
    words = ["heavy"] * 300 + [f"w{rng.randrange(30)}" for _ in range(300)]
    df = spark.createDataFrame([(w,) for w in words], "tok string")
    sk = cms_sketch(df, "tok")
    probes = df.select("tok").distinct()
    est = {r["tok"]: r["est_n"] for r in cms_estimate(sk, probes, "tok").collect()}
    exact = {}
    for w in words:
        exact[w] = exact.get(w, 0) + 1
    for w, n in exact.items():
        assert est[w] >= n, f"CMS must never undercount ({w})"
    # the heavy hitter dominates its buckets: error ≤ light mass / width
    assert est["heavy"] - exact["heavy"] <= len(words) - exact["heavy"]


def test_cms_sketch_is_bounded_single_exchange(spark, sf_dir):
    import calp_cva_tracking_pipeline_spark.catalog.scale as S
    from calp_cva_tracking_pipeline_spark.operators.sketch import (
        CMS_DEPTH,
        CMS_WIDTH,
    )

    from calp_cva_tracking_pipeline_spark.catalog.common import T
    from calp_cva_tracking_pipeline_spark.operators.dedup import word_tokens

    d = T(spark, sf_dir, "documents")
    toks = d.select(F.explode(word_tokens(F.col("text"))).alias("token"))
    sk = cms_sketch(toks, "token")
    assert sk.count() <= CMS_DEPTH * CMS_WIDTH
    plan = _executed(sk)
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# group_split
# ---------------------------------------------------------------------------


def test_group_split_no_entity_straddles(spark, sf_dir):
    from calp_cva_tracking_pipeline_spark.catalog.common import T

    e = T(spark, sf_dir, "events")
    out = group_split(e, "user_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    straddlers = (
        out.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddlers == 0
    # every event present exactly once
    assert out.count() == e.count()


def test_group_split_monotone_growth_and_validation(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "uid bigint")
    a = {
        r["uid"]
        for r in group_split(df, "uid", {"train": 0.5, "rest": 0.5})
        .filter("split = 'train'")
        .collect()
    }
    b = {
        r["uid"]
        for r in group_split(df, "uid", {"train": 0.7, "rest": 0.3})
        .filter("split = 'train'")
        .collect()
    }
    assert a <= b, "growing the first split must only ADD entities"
    with pytest.raises(ValueError):
        group_split(df, "uid", {"train": 0.5, "rest": 0.4})


# ---------------------------------------------------------------------------
# Jaro–Winkler
# ---------------------------------------------------------------------------


def test_jaro_winkler_matches_duckdb_builtin():
    rng = random.Random(17)
    con = duckdb.connect()
    cases = [("", ""), ("", "a"), ("abc", "abc"), ("martha", "marhta")]
    for _ in range(800):
        n1, n2 = rng.randrange(13), rng.randrange(13)
        cases.append(
            (
                "".join(rng.choice("abcd ef") for _ in range(n1)),
                "".join(rng.choice("abcd ef") for _ in range(n2)),
            )
        )
    for a, b in cases:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(_jaro_winkler_py(a, b) - want) < 1e-12, (a, b)


def test_jaro_join_blocked_never_cartesian(spark, sf_dir):
    from calp_cva_tracking_pipeline_spark.catalog.common import T

    p = T(spark, sf_dir, "part")
    out = jaro_winkler_join(p, p, "p_name", "p_name", threshold=0.8)
    plan = _executed(out)
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert all(r["name_a"] < r["name_b"] for r in rows)
    assert all(r["jw"] >= 0.8 for r in rows)


def test_jaro_join_hot_block_cap_bounds_pair_emission(spark):
    """The max_block_names skew guard: a hot first-char block re-keys on
    a 2-char prefix, so candidate emission drops from C(B,2) to the sum
    over sub-blocks — and the capped result is exactly the uncapped
    result restricted to pairs sharing the widened prefix (determinism:
    nothing is sampled or dropped by hash)."""
    names = [
        f"a{c}name{i:02d}" for c in "wxyz" for i in range(10)
    ]  # one hot block 'a' (40 names), 4 even 2-char sub-blocks
    df = spark.createDataFrame([(n,) for n in names], "p_name string")

    # threshold 0 exposes the raw candidate set
    uncapped = jaro_winkler_join(df, df, "p_name", "p_name", threshold=0.0)
    capped = jaro_winkler_join(
        df, df, "p_name", "p_name", threshold=0.0, max_block_names=20
    )
    un = {(r.name_a, r.name_b): r.jw for r in uncapped.collect()}
    cap = {(r.name_a, r.name_b): r.jw for r in capped.collect()}
    assert len(un) == 40 * 39 // 2  # C(40,2) = 780
    assert len(cap) == 4 * (10 * 9 // 2)  # 4 sub-blocks × C(10,2) = 180
    want = {k: v for k, v in un.items() if k[0][:2] == k[1][:2]}
    assert cap == want

    # under the cap the guard is a no-op
    small = jaro_winkler_join(
        df, df, "p_name", "p_name", threshold=0.0, max_block_names=100
    )
    assert {(r.name_a, r.name_b): r.jw for r in small.collect()} == un

    # layout-independence of the guarded path
    cap2 = jaro_winkler_join(
        df.repartition(7),
        df.repartition(3),
        "p_name",
        "p_name",
        threshold=0.0,
        max_block_names=20,
    )
    assert {(r.name_a, r.name_b): r.jw for r in cap2.collect()} == cap
