"""Round-12 wave-53 operator pins: tile-dup census (watermark
detector), Wilson conversion-rate series — hand-built inputs with
independently derived values."""

from __future__ import annotations

import datetime as dt
import math


def test_tile_dup_hand_images(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        image_tile_dup_census,
    )

    # 4x4 images, 2x2 tiles: images 1 and 2 share the SAME top-left
    # tile (the "watermark") but differ everywhere else; image 3 is
    # fully distinct; image 4 is undecodable
    def img(tl, rest):
        px = bytearray()
        for y in range(4):
            for x in range(4):
                v = tl if (x < 2 and y < 2) else rest + y * 4 + x
                px += bytes((v, v, v))
        return encode_bmp(4, 4, bytes(px))

    rows = [
        (1, img(200, 10)),
        (2, img(200, 60)),
        (3, img(111, 120)),
        (4, b"junk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        (r.tile_x, r.tile_y): r
        for r in image_tile_dup_census(
            df, "doc_id", "payload", tile=2
        ).collect()
    }
    assert len(out) == 4  # 2x2 tile positions, undecodable dropped
    wm = out[(0, 0)]
    assert (wm.n_images, wm.dup_images, wm.n_dup_groups,
            wm.max_group) == (3, 2, 1, 2)
    for pos in [(1, 0), (0, 1), (1, 1)]:
        r = out[pos]
        assert (r.n_images, r.dup_images, r.n_dup_groups) == (3, 0, 0)


def test_conversion_ci_hand_events(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        WILSON_Z,
        WILSON_Z2,
        conversion_rate_series,
    )

    d = dt.datetime
    rows = [
        # day 1: 3 views, 1 purchase -> n=4, k=1
        (1, d(2024, 1, 1, 9), "view"),
        (2, d(2024, 1, 1, 10), "view"),
        (3, d(2024, 1, 1, 11), "view"),
        (4, d(2024, 1, 1, 12), "purchase"),
        (5, d(2024, 1, 1, 13), "click"),   # not part of the funnel
        # day 2: purchases only (k == n edge) -> n=2, k=2
        (6, d(2024, 1, 2, 9), "purchase"),
        (7, d(2024, 1, 2, 10), "purchase"),
        (8, None, "view"),                 # dropped
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {str(r.day): r for r in conversion_rate_series(df).collect()}
    a = out["2024-01-01"]
    assert (a.n_exposures, a.n_conversions, a.rate_ppm) == (4, 1, 250_000)

    def wilson(k, n, sign):
        p = k / float(n)
        v = (
            (p + WILSON_Z2 / (2.0 * n))
            + sign * WILSON_Z * math.sqrt(
                p * (1.0 - p) / n + WILSON_Z2 / (4.0 * n * n)
            )
        ) / (1.0 + WILSON_Z2 / n)
        return round(v, 6)

    assert a.wilson_lo == wilson(1, 4, -1)
    assert a.wilson_hi == wilson(1, 4, +1)
    assert 0.0 <= a.wilson_lo < 0.25 < a.wilson_hi <= 1.0
    b = out["2024-01-02"]
    # k == n: rate 1.0, upper bound exactly 1.0, lower bound < 1
    assert (b.rate_ppm, b.wilson_hi) == (1_000_000, 1.0)
    assert b.wilson_lo < 1.0


def test_conversion_ci_interval_tightens_with_n(spark):
    from calp_cva_tracking_pipeline_spark.operators.funnel import (
        conversion_rate_series,
    )

    rows = []
    eid = 0
    # day 1: 10 events (2 purchases); day 2: 1000 events (200 purchases)
    for day, n in ((1, 10), (2, 1000)):
        for i in range(n):
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 2, day, 9, 0, i % 60, i),
                    "purchase" if i % 5 == 0 else "view",
                )
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )
    out = {str(r.day): r for r in conversion_rate_series(df).collect()}
    small = out["2024-02-01"]
    big = out["2024-02-02"]
    assert small.rate_ppm == big.rate_ppm == 200_000
    assert (big.wilson_hi - big.wilson_lo) < (
        small.wilson_hi - small.wilson_lo
    ) / 5
