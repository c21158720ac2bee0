"""As-of join + interval join vs DuckDB's native ASOF/range joins.

DuckDB implements ASOF JOIN natively, so these tests get oracle-grade
verification without consuming a driver catalog slot (the correctness gate
reads only the first 50 queries() entries)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from calp_cva_tracking_pipeline_spark.catalog.common import T
from calp_cva_tracking_pipeline_spark.operators.temporal import (
    asof_join,
    interval_join,
)


def _events_sides(spark, sf_dir):
    """Left = all events; right = sparse per-user rate epochs sampled from
    the same table (unique (user_id, ts) by construction of the sample)."""
    e = T(spark, sf_dir, "events")
    left = e.select("event_id", "user_id", "ts", "value")
    right = (
        e.filter(F.col("event_id") % 11 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max(F.col("value") * 2).alias("rate"))
    )
    return left, right


def _duck_con(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    con.execute(
        "CREATE VIEW l AS SELECT event_id, user_id, ts, value FROM events"
    )
    con.execute(
        "CREATE VIEW r AS SELECT user_id, ts, MAX(value * 2) AS rate "
        "FROM events WHERE event_id % 11 = 0 GROUP BY user_id, ts"
    )
    return con


def _canon(rows):
    out = []
    for row in rows:
        out.append(
            tuple(
                "%.9g" % v if isinstance(v, float) else repr(v) for v in row
            )
        )
    out.sort()
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_duckdb(spark, sf_dir, direction):
    left, right = _events_sides(spark, sf_dir)
    got = asof_join(
        left,
        right,
        keys=["user_id"],
        left_time="ts",
        right_time="ts",
        direction=direction,
    ).select("event_id", "user_id", "value", "ts_matched", "rate")
    op = ">=" if direction == "backward" else "<="
    con = _duck_con(sf_dir)
    want = con.execute(
        f"""
        SELECT l.event_id, l.user_id, l.value,
               r.ts AS ts_matched, r.rate
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts {op} r.ts
        """
    ).fetchall()
    srows = [
        (r["event_id"], r["user_id"], r["value"],
         r["ts_matched"] and r["ts_matched"].replace(tzinfo=None),
         r["rate"])
        for r in got.collect()
    ]
    wrows = [(a, b, c, d, e) for a, b, c, d, e in want]
    assert len(srows) == left.count()  # left-outer: row count preserved
    assert _canon(srows) == _canon(wrows)


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c")], "k int, t int, pl string"
    )
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 15, 2.0)], "k int, t int, rate double"
    )
    got = {
        r["pl"]: (r["t_matched"], r["rate"])
        for r in asof_join(
            left, right, keys=["k"], left_time="t"
        ).collect()
    }
    assert got == {
        "a": (10, 1.0),  # equal timestamp matches
        "b": (15, 2.0),
        "c": (None, None),  # nothing at or before t=5
    }


def test_asof_tolerance_voids_stale_matches(spark):
    left = spark.createDataFrame([(1, 100), (1, 200)], "k int, t int")
    right = spark.createDataFrame([(1, 95, 7.0)], "k int, t int, r double")
    got = {
        r["t"]: r["r"]
        for r in asof_join(
            left, right, keys=["k"], left_time="t", tolerance=F.lit(10)
        ).collect()
    }
    assert got == {100: 7.0, 200: None}  # 200-95=105 > 10 → voided


def test_asof_duplicate_right_timestamps_deterministic(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 9.0)], "k int, t int, r double"
    )
    for _ in range(3):
        rows = asof_join(
            left, right, keys=["k"], left_time="t"
        ).collect()
        assert rows[0]["r"] == 9.0  # max payload struct wins, every run


def test_asof_plan_single_shuffle_no_join(spark, sf_dir):
    left, right = _events_sides(spark, sf_dir)
    plan = (
        asof_join(left, right, keys=["user_id"], left_time="ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # union + window, not a join node
    assert plan.count("Exchange hashpartitioning") <= 2  # union sides


def test_interval_join_matches_duckdb(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    points = e.select("event_id", "user_id", "ts")
    windows = spark.createDataFrame(
        [
            ("w1", "2024-01-01 00:00:00", "2024-04-01 00:00:00"),
            ("w2", "2024-04-01 00:00:00", "2024-07-01 00:00:00"),
            ("w3", "2024-06-15 00:00:00", "2024-09-01 00:00:00"),  # overlaps
        ],
        "win string, start string, end string",
    ).select(
        "win",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    got = interval_join(
        points, windows, point_time="ts", start="start", end="end"
    ).select("event_id", "win")
    con = _duck_con(sf_dir)
    want = con.execute(
        """
        WITH w(win, start_, end_) AS (VALUES
          ('w1', TIMESTAMP '2024-01-01', TIMESTAMP '2024-04-01'),
          ('w2', TIMESTAMP '2024-04-01', TIMESTAMP '2024-07-01'),
          ('w3', TIMESTAMP '2024-06-15', TIMESTAMP '2024-09-01'))
        SELECT e.event_id, w.win FROM events e JOIN w
          ON w.start_ <= e.ts AND e.ts < w.end_
        """
    ).fetchall()
    assert _canon([tuple(r) for r in got.collect()]) == _canon(
        [tuple(r) for r in want]
    )


def test_interval_join_bucketized_equals_broadcast(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    points = e.select("event_id", "user_id", "ts")
    # per-user windows → keyed join; widths from hours to months so
    # intervals span 1..many buckets
    windows = (
        e.filter(F.col("event_id") % 37 == 0)
        .select(
            "user_id",
            F.col("ts").alias("start"),
            (
                F.col("ts")
                + F.when(
                    F.col("event_id") % 2 == 0,
                    F.expr("INTERVAL 6 HOUR"),
                ).otherwise(F.expr("INTERVAL 45 DAY"))
            ).alias("end"),
            (F.col("event_id") * 10).alias("win_id"),
        )
    )
    base = interval_join(
        points,
        windows,
        point_time="ts",
        start="start",
        end="end",
        keys=["user_id"],
        how="left",
    ).select("event_id", "win_id")
    bucketed = interval_join(
        points,
        windows,
        point_time="ts",
        start="start",
        end="end",
        keys=["user_id"],
        how="left",
        bucket_width=F.lit(7 * 24 * 3600),  # 1-week buckets
    ).select("event_id", "win_id")
    a = _canon([tuple(r) for r in base.collect()])
    b = _canon([tuple(r) for r in bucketed.collect()])
    assert a == b and len(a) >= points.count()


def test_asof_join_rejects_empty_keys(spark):
    df = spark.createDataFrame([(1, 1)], "k int, t int")
    with pytest.raises(ValueError, match="asof_join_broadcast"):
        asof_join(df, df.select("t"), keys=[], left_time="t")


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_broadcast_matches_duckdb_global(spark, sf_dir, direction):
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        asof_join_broadcast,
    )

    e = T(spark, sf_dir, "events")
    left = e.select("event_id", "ts").filter(F.col("event_id") < 500)
    # a global epoch timeline: 7 cut points spread over the data range
    epochs = (
        e.filter(F.col("event_id") % 997 == 0)
        .select(
            F.col("ts").alias("epoch_ts"),
            F.col("event_id").alias("epoch_id"),
        )
    )
    got = asof_join_broadcast(
        left, epochs, left_time="ts", right_time="epoch_ts",
        direction=direction,
    )
    op = ">=" if direction == "backward" else "<="
    con = _duck_con(sf_dir)
    want = con.execute(
        f"""
        WITH lft AS (SELECT event_id, ts FROM events
                     WHERE event_id < 500),
             ep AS (SELECT ts AS epoch_ts, event_id AS epoch_id
                    FROM events WHERE event_id % 997 = 0)
        SELECT l.event_id, l.ts, ep.epoch_ts AS epoch_ts_matched,
               ep.epoch_id
        FROM lft l ASOF LEFT JOIN ep ON l.ts {op} ep.epoch_ts
        """
    ).fetchall()
    srows = [
        (
            r["event_id"],
            r["ts"],
            r["epoch_ts_matched"]
            and r["epoch_ts_matched"].replace(tzinfo=None),
            r["epoch_id"],
        )
        for r in got.collect()
    ]
    assert _canon(srows) == _canon([tuple(r) for r in want])


def test_interval_join_left_keyless_keeps_unmatched_points(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 15), (3, 50)], "pid int, t int"
    )
    windows = spark.createDataFrame(
        [("w1", 0, 10), ("w2", 10, 20)], "win string, s int, e int"
    )
    rows = {
        (r["pid"], r["win"])
        for r in interval_join(
            points, windows, point_time="t", start="s", end="e", how="left"
        ).collect()
    }
    assert rows == {(1, "w1"), (2, "w2"), (3, None)}


def test_asof_tolerance_timestamp_axis(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 13:00:00")],
        "k int, t string",
    ).select("k", F.col("t").cast("timestamp").alias("t"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 5.0)], "k int, t string, r double"
    ).select("k", F.col("t").cast("timestamp").alias("t"), "r")
    got = {
        r["t"].hour: r["r"]
        for r in asof_join(
            left,
            right,
            keys=["k"],
            left_time="t",
            tolerance=F.expr("INTERVAL 1 HOUR"),
        ).collect()
    }
    assert got == {10: 5.0, 13: None}  # 3.5h gap exceeds 1h tolerance


def test_asof_property_random_inputs_match_duckdb(spark):
    """Adversarial generated data: duplicate left timestamps, left rows
    before any right row, keys on only one side, negative times."""
    import random

    rng = random.Random(20260813)
    left_rows = [
        (rng.randint(0, 4), rng.randint(-50, 50), i)
        for i in range(120)
    ]
    right_rows = [
        (rng.randint(0, 5), rng.randint(-50, 50))
        for _ in range(40)
    ]
    # unique (k, t) on the right (dedup winner is engine policy; DuckDB's
    # pick for duplicate right keys is unspecified)
    right_rows = [
        (k, t, float(k * 1000 + t)) for (k, t) in {r for r in right_rows}
    ]
    left = spark.createDataFrame(left_rows, "k int, t int, lid int")
    right = spark.createDataFrame(right_rows, "k int, t int, r double")
    got = sorted(
        (r["lid"], r["t_matched"], r["r"])
        for r in asof_join(
            left, right, keys=["k"], left_time="t"
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l(k int, t int, lid int); "
        "CREATE TABLE r(k int, t int, rv double)"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?)", left_rows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", right_rows)
    want = sorted(
        (lid, tm, rv)
        for lid, tm, rv in con.execute(
            "SELECT l.lid, r.t, r.rv FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.t >= r.t"
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_null_timestamps_never_match(spark, direction):
    """Null-time left rows match nothing (DuckDB semantics: NULL
    comparisons are false); null-time right rows are inert."""
    left = spark.createDataFrame(
        [(1, None, "a"), (1, 20, "b")], "k int, t int, pl string"
    )
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 30, 6.0), (1, None, 99.0)],
        "k int, t int, r double",
    )
    got = {
        r["pl"]: r["r"]
        for r in asof_join(
            left, right, keys=["k"], left_time="t", direction=direction
        ).collect()
    }
    expect_b = 5.0 if direction == "backward" else 6.0
    assert got == {"a": None, "b": expect_b}
    assert len(got) == 2  # left-outer row count preserved


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_broadcast_no_admissible_epoch(spark, direction):
    """Empty filtered epoch arrays must yield nulls, not an ANSI
    element_at error (left rows outside the epoch range + null times)."""
    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        asof_join_broadcast,
    )

    left = spark.createDataFrame(
        [(1, 5), (2, 50), (3, None)], "pid int, t int"
    )
    right = spark.createDataFrame([(10, 1.0), (20, 2.0)], "t int, r double")
    got = {
        r["pid"]: (r["t_matched"], r["r"])
        for r in asof_join_broadcast(
            left, right, left_time="t", direction=direction
        ).collect()
    }
    if direction == "backward":
        assert got == {1: (None, None), 2: (20, 2.0), 3: (None, None)}
    else:
        assert got == {1: (10, 1.0), 2: (None, None), 3: (None, None)}


def test_asof_nearest_picks_closer_side_tie_goes_backward(spark):
    from pyspark.sql import functions as F

    from calp_cva_tracking_pipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("u", 10.0, "a"), ("u", 14.0, "b"), ("u", 25.0, "c"),
         ("u", 3.0, "d"), ("v", 7.0, "e")],
        "k string, t double, tag string",
    )
    right = spark.createDataFrame(
        [("u", 8.0, 100.0), ("u", 16.0, 200.0), ("u", 30.0, 300.0)],
        "k string, t double, rate double",
    )
    out = {
        r["tag"]: (r["t_matched"], r["rate"])
        for r in asof_join(
            left, right, ["k"], "t", direction="nearest"
        ).collect()
    }
    assert out["a"] == (8.0, 100.0)    # gap 2 back vs 6 fwd
    assert out["b"] == (16.0, 200.0)   # gap 6 back vs 2 fwd
    assert out["c"] == (30.0, 300.0)   # gap 9 back vs 5 fwd
    assert out["d"] == (8.0, 100.0)    # nothing behind -> forward
    assert out["e"] == (None, None)    # key v has no right rows

    # exact tie -> backward
    left_tie = spark.createDataFrame(
        [("u", 12.0, "mid")], "k string, t double, tag string"
    )
    [r] = asof_join(
        left_tie, right, ["k"], "t", direction="nearest"
    ).collect()
    assert (r["t_matched"], r["rate"]) == (8.0, 100.0)

    # tolerance voids the far side: at t=14 backward gap 6 > 3, fwd 2 <= 3
    [r] = asof_join(
        left.filter(F.col("tag") == "b"), right, ["k"], "t",
        direction="nearest", tolerance=F.lit(3.0),
    ).collect()
    assert (r["t_matched"], r["rate"]) == (16.0, 200.0)
    # tolerance voids both
    [r] = asof_join(
        left.filter(F.col("tag") == "b"), right, ["k"], "t",
        direction="nearest", tolerance=F.lit(1.0),
    ).collect()
    assert (r["t_matched"], r["rate"]) == (None, None)

    # deterministic under repartition
    a = sorted(map(tuple, asof_join(
        left, right, ["k"], "t", direction="nearest").collect()))
    b = sorted(map(tuple, asof_join(
        left.repartition(5), right.repartition(3), ["k"], "t",
        direction="nearest").collect()))
    assert a == b
