"""Round-12 waves 47-55: randomized reference cross-checks — each new
operator family verified against an independently-written plain-Python
reference on randomized inputs (the test_r11_props discipline: the
Spark implementation and the reference share no code, only the
contract)."""

from __future__ import annotations

import hashlib
import itertools
import random


def test_waterfill_matches_python_reference(spark):
    from calp_cva_tracking_pipeline_spark.operators.sampling import (
        waterfill_allocation,
    )

    rng = random.Random(7)
    for trial in range(4):
        supplies = {
            f"s{i}": rng.randint(1, 500) for i in range(rng.randint(2, 12))
        }
        ppm = rng.choice([137_000, 500_000, 903_000, 1_000_000])
        total = sum(supplies.values())
        budget = total * ppm // 1_000_000

        # reference: literal water-filling by sorted prefix
        order = sorted(supplies.items(), key=lambda kv: (kv[1], kv[0]))
        alloc = {}
        remaining, left = budget, len(order)
        for i, (k, s) in enumerate(order):
            if s * (left) <= remaining:
                alloc[k] = s
                remaining -= s
                left -= 1
            else:
                level, rem = divmod(remaining, left)
                for j, (k2, s2) in enumerate(order[i:]):
                    alloc[k2] = level + (1 if j < rem else 0)
                break

        df = spark.createDataFrame(
            list(supplies.items()), "source string, tokens long"
        )
        got = {
            r.source: r.alloc
            for r in waterfill_allocation(
                df, "source", "tokens", budget_ppm=ppm
            ).collect()
        }
        assert got == alloc, (trial, supplies, ppm)
        assert sum(got.values()) == budget


def test_theil_sen_matches_python_reference(spark):
    import datetime as dt

    from calp_cva_tracking_pipeline_spark.operators.temporal import (
        theil_sen_trend,
    )

    rng = random.Random(11)
    rows, expect = [], {}
    for key in ("a", "b", "c"):
        n = rng.randint(2, 12)
        vals = [round(rng.uniform(-50, 50), 3) for _ in range(n)]
        days = sorted(rng.sample(range(1, 28), n))
        for d, v in zip(days, vals):
            rows.append((key, dt.datetime(2024, 1, d, 9), v))
        vm = [int(round(v * 1_000_000)) for v in vals]
        slopes = sorted(
            (vm[j] - vm[i]) / (1_000_000.0 * (days[j] - days[i]))
            for i in range(n)
            for j in range(i + 1, n)
        )
        med = slopes[(len(slopes) + 1) // 2 - 1]
        import math

        expect[key] = int(math.floor(med * 1_000_000_000.0))
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    got = {
        r.event_type: r.slope_nano_per_day
        for r in theil_sen_trend(df, "event_type", "ts", "value").collect()
    }
    assert got == expect


def test_growth_accounting_identity_and_flows_random(spark):
    import datetime as dt

    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        growth_accounting,
    )

    rng = random.Random(13)
    rows = [
        (f"u{u}", dt.datetime(2024, 3, d, 9))
        for u in range(25)
        for d in sorted(rng.sample(range(1, 28), rng.randint(1, 9)))
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = growth_accounting(df).collect()
    # per-day identity, and global flow conservation: every user churns
    # exactly once more than they (re)activate... specifically
    # sum(new) + sum(resurrected) == sum(churned) because every
    # activity run eventually ends (within the observed horizon + 1)
    assert all(
        r.n_active == r.n_new + r.n_retained + r.n_resurrected
        for r in out
    )
    assert sum(r.n_new for r in out) == 25
    assert sum(r.n_new + r.n_resurrected for r in out) == sum(
        r.n_churned for r in out
    )


def test_square_census_matches_bruteforce_random_graphs(spark):
    from calp_cva_tracking_pipeline_spark.operators.graph import (
        square_census,
    )

    rng = random.Random(17)
    for trial in range(3):
        n = rng.randint(5, 12)
        edges = [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.4
        ]
        if not edges:
            continue
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        brute = 0
        for quad in itertools.combinations(range(n), 4):
            for perm in itertools.permutations(quad):
                a, b, c, d = perm
                if (
                    b in adj[a] and c in adj[b]
                    and d in adj[c] and a in adj[d]
                ):
                    brute += 1
        brute //= 8  # each 4-cycle counted 8x (4 rotations x 2 dirs)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = square_census(df).collect()[0].n_squares
        assert got == brute, (trial, edges)


def test_bloom_prescreen_fp_rate_sane_and_no_false_negatives(spark):
    from calp_cva_tracking_pipeline_spark.operators.dedup import (
        bloom_prescreen,
    )

    hist = spark.createDataFrame(
        [(i, f"history doc {i}") for i in range(300)],
        "doc_id long, text string",
    )
    inc = spark.createDataFrame(
        [(1000 + i, f"history doc {i}") for i in range(40)]
        + [(2000 + i, f"novel doc {i}") for i in range(200)],
        "doc_id long, text string",
    )
    r = bloom_prescreen(hist, inc).collect()[0]
    assert r.exact_dups == 40
    assert r.bloom_hits >= 40  # no false negatives, ever
    assert r.false_positives == r.bloom_hits - 40
    # m = 2^bitlen(2400) = 4096; fill = bits/4096; expected fp ~ fill^3
    fill = r.n_bits_set / r.m_bits
    expected = fill ** 3
    got = r.false_positives / 200.0
    assert got <= max(4 * expected, 0.08), (fill, got, expected)


def test_tile_dup_watermark_position_only(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        image_tile_dup_census,
    )

    rng = random.Random(23)

    def img(doc, stamped):
        px = bytearray()
        for y in range(8):
            for x in range(8):
                if stamped and x < 4 and y < 4:
                    v = (x * 17 + y * 31) % 256  # shared stamp
                else:
                    v = int(
                        hashlib.md5(f"{doc}|{x}|{y}".encode())
                        .hexdigest()[:2],
                        16,
                    )
                px += bytes((v, v, v))
        return encode_bmp(8, 8, bytes(px))

    rows = [(i, img(i, i % 3 != 2)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        (r.tile_x, r.tile_y): r
        for r in image_tile_dup_census(
            df, "doc_id", "payload", tile=4
        ).collect()
    }
    wm = out[(0, 0)]
    assert wm.n_dup_groups == 1 and wm.max_group == 20
    assert wm.dup_images == 20
    for pos, r in out.items():
        if pos != (0, 0):
            assert r.n_dup_groups == 0, pos
