"""Perceptual-hash image near-dup (operators.phash) unit tests.

The catalog-level oracle (mm_phash_neardup) proves hash-math parity at
scale; these tests pin the operator semantics on hand-built images:
near-identical images pair with small hamming, unrelated images don't,
PNG and BMP payloads of the same pixels hash identically (shared luma +
box kernel), and undecodable payloads are excluded — not crashed on.
"""

from __future__ import annotations

import pytest

from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import encode_bmp
from calp_cva_tracking_pipeline_spark.operators.phash import (
    image_cell_sums,
    image_phash_pairs,
    luma_cell_sums,
)
from calp_cva_tracking_pipeline_spark.operators.png_stdlib import encode_png


def _grey_bmp(values: list[int], w: int = 16, h: int = 16) -> bytes:
    rgb = b"".join(bytes((v, v, v)) for v in values)
    return encode_bmp(w, h, rgb)


def _checker(w: int = 16, h: int = 16, flip: set[int] | None = None):
    """High-contrast 2×2-block checkerboard — every aHash bit is far
    from the mean threshold, so single-pixel edits stay near-dup."""
    vals = []
    for y in range(h):
        for x in range(w):
            v = 230 if ((x // 2) + (y // 2)) % 2 == 0 else 20
            vals.append(v)
    for p in flip or set():
        vals[p] = 255 - vals[p]
    return vals


def test_luma_cell_sums_integer_exact():
    # constant-value image: every 2×2 cell sums to 4·v, bits all equal
    vals = [37] * 256
    cells = luma_cell_sums(_grey_bmp(vals), grid=8)
    assert cells == [37 * 4] * 64


def test_near_dup_found_far_image_not(spark):
    base = _checker()
    near = _checker(flip={0})  # one pixel of one cell
    far = [255 - v for v in base]  # inverted: every bit flips
    rows = [
        (1, _grey_bmp(base)),
        (2, _grey_bmp(near)),
        (3, _grey_bmp(far)),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = image_phash_pairs(df, "id", "payload", max_hamming=3).collect()
    pairs = {(r.id_a, r.id_b): r.hamming for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_png_and_bmp_payloads_hash_identically(spark):
    vals = _checker()
    rgb = b"".join(bytes((v, v, v)) for v in vals)
    png = encode_png(16, 16, 3, rgb)
    rows = [(1, _grey_bmp(vals)), (2, png)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    cells = {
        r["__id"]: list(r["__cells"])
        for r in image_cell_sums(df, "id", "payload").collect()
    }
    assert cells[1] == cells[2]
    # identical pixels ⇒ identical hash ⇒ hamming-0 pair
    out = image_phash_pairs(df, "id", "payload", max_hamming=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in out] == [(1, 2, 0)]


def test_undecodable_payloads_excluded_not_fatal(spark):
    rows = [
        (1, _grey_bmp(_checker())),
        (2, b"\xff\xd8\xff garbage jpeg-ish"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    cells = image_cell_sums(df, "id", "payload").collect()
    by_id = {r["__id"]: r["decode_ok"] for r in cells}
    assert by_id == {1: "ok_stdlib", 2: "error", 3: "error"}
    assert image_phash_pairs(df, "id", "payload").count() == 0


def test_bucket_cap_bounds_flood(spark):
    # 12 identical images: uncapped emits C(12,2)=66 hamming-0 pairs;
    # capping buckets at 4 docs suppresses the flood entirely.
    vals = _checker()
    rows = [(i, _grey_bmp(vals)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    assert image_phash_pairs(df, "id", "payload").count() == 66
    assert (
        image_phash_pairs(df, "id", "payload", max_bucket_docs=4).count()
        == 0
    )


@pytest.mark.parametrize("grid", [4, 8])
def test_grid_parameter_shapes(spark, grid):
    rows = [(1, _grey_bmp(_checker()))]
    df = spark.createDataFrame(rows, "id long, payload binary")
    cells = image_cell_sums(df, "id", "payload", grid=grid).collect()[0]
    assert len(cells["__cells"]) == grid * grid


# --- audio twin ---


def _wav(samples: list[int]) -> bytes:
    import struct

    from calp_cva_tracking_pipeline_spark.operators.wav_stdlib import (
        encode_wav,
    )

    frames = b"".join(struct.pack("<h", s) for s in samples)
    return encode_wav(8000, 1, 2, frames)


def test_audio_energy_bins_integer_exact():
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        audio_energy_bins,
    )

    # 64 samples, 8 bins of 8: constant amplitude 100 -> 8*100^2 per bin
    assert audio_energy_bins(_wav([100] * 64), bins=8) == [80000] * 8
    # sign-invariant (energy is sum of squares)
    assert audio_energy_bins(_wav([-100] * 64), bins=8) == [80000] * 8


def test_audio_fingerprint_groups_cluster_and_noise_robust(spark):
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        audio_fingerprint_groups,
    )

    # loud first half, quiet second half -> distinctive profile
    base = [3000] * 128 + [10] * 128
    noisy = list(base)
    noisy[5] = 3100  # sample-level noise, same coarse profile
    different = [10] * 128 + [3000] * 128  # mirrored profile
    rows = [
        (1, _wav(base)),
        (2, _wav(noisy)),
        (3, _wav(different)),
        (4, b"not a wav"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    groups = audio_fingerprint_groups(df, "id", "payload").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_media == 2 and g.rep_media == 1  # {1,2} cluster; 3 apart


def test_fused_synth_cell_sums_matches_chained_path(spark):
    """r16 fusion (guide §4): synthesize_and_cell_sums must yield the
    exact rows of synthesize_bmp_payloads → image_cell_sums — the same
    real encode→decode roundtrip, one Python stage instead of two
    chained mapInPandas nodes (each holding its own worker per task)."""
    from calp_cva_tracking_pipeline_spark.operators.phash import (
        image_cell_sums,
        synthesize_and_cell_sums,
        synthesize_bmp_payloads,
    )

    w = h = 8
    rows = [
        (i, [((i * 37 + p * 11) % 256) for p in range(w * h)])
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, px array<int>")
    chained = image_cell_sums(
        synthesize_bmp_payloads(df, "doc_id", "px", w, h),
        "doc_id", "payload", grid=4,
    )
    fused = synthesize_and_cell_sums(df, "doc_id", "px", w, h, grid=4)
    a = sorted(map(tuple, chained.collect()))
    b = sorted(map(tuple, fused.collect()))
    assert a == b and len(a) == 6
    assert all(r[2] == "ok_stdlib" for r in a)
