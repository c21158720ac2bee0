"""Multimodal plumbing: schema, batch shape, and deterministic stub decode.

The codec libraries are not in this container (PIL/ffmpeg), so decode runs
the clearly-marked deterministic stub; what these tests pin down is the REAL
part — the mapInPandas contract (schema, null payloads, status column) that
a deployment swaps real codecs into.
"""

from __future__ import annotations

from calp_cva_tracking_pipeline_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZE_SCHEMA,
    _decode_stub,
    extract_features,
    resize_images,
    sample_frames,
)


def _media_df(spark):
    rows = [
        (1, "image", bytes([0, 1, 2, 3, 4, 5, 6, 7]) * 4, "image/png", 8, 8, None),
        (2, "audio", bytes([7] * 16), "audio/wav", None, None, 1000),
        (3, "video", None, "video/mp4", 640, 480, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_schema_and_status(spark):
    out = extract_features(_media_df(spark))
    assert out.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3
    # container has no PIL -> everything stubbed, never silently 'ok'
    assert {r["decode_ok"] for r in rows.values()} == {"stubbed"}
    # deterministic: feature equals the pure-python stub on the same payload
    assert rows[1]["feature"] == _decode_stub(bytes([0, 1, 2, 3, 4, 5, 6, 7]) * 4)
    # null payload -> zero vector, not a crash
    assert rows[3]["feature"] == [0.0] * 8
    # histogram features are normalized
    assert abs(sum(rows[2]["feature"]) - 1.0) < 1e-9


def test_extract_features_partitioned(spark):
    # batch shape: repartitioned input still yields one row per media row
    df = _media_df(spark).repartition(3)
    assert extract_features(df).count() == 3


def test_resize_images_stub_contract(spark):
    out = resize_images(_media_df(spark), width=4, height=4)
    assert out.schema == RESIZE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3
    # stubbed payloads are exactly width*height bytes; null stays null
    assert len(rows[1]["payload"]) == 16
    assert rows[3]["payload"] is None
    assert {r["decode_ok"] for r in rows.values()} == {"stubbed"}
    assert {(r["width"], r["height"]) for r in rows.values()} == {(4, 4)}


def test_sample_frames_fanout(spark):
    out = sample_frames(_media_df(spark), every_ms=500, max_frames=4)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    # id 2: duration 1000ms / 500ms -> 2 frames; id 3: null payload skipped;
    # id 1: null duration skipped
    assert set(by_media) == {2}
    frames = sorted(by_media[2], key=lambda r: r["frame_index"])
    assert [f["frame_ms"] for f in frames] == [0, 500]
    # deterministic even byte slicing
    assert frames[0]["payload"] == bytes([7] * 8)


# ---------------------------------------------------------------------------
# stdlib PNG codec: REAL decode with zero dependencies (round-6 — T20's
# image path stops being stub-only). Golden-pixel tests: hand-built
# filtered streams prove unfiltering, roundtrips prove the encoder, and
# the Spark-level tests prove the mapInPandas integration end-to-end.
# ---------------------------------------------------------------------------

import struct
import zlib

from calp_cva_tracking_pipeline_spark.operators.png_stdlib import (
    decode_png,
    encode_png,
    grayscale_box_features,
    is_png,
    resize_nearest,
    to_grayscale,
)


def _manual_png(width, height, colortype, raw_rows):
    """Build a PNG from pre-filtered row bytes (filter byte included)."""
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
    return (
        sig + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(raw_rows)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_grey_rgb_rgba():
    for channels in (1, 2, 3, 4):
        pixels = bytes(
            (x * 7 + c * 31) % 256
            for x in range(6 * 5)
            for c in range(channels)
        )
        blob = encode_png(6, 5, channels, pixels)
        assert is_png(blob)
        assert decode_png(blob) == (6, 5, channels, pixels)


def test_png_unfilters_all_five_filter_types():
    # 2x5 RGB image, one row per filter type, hand-filtered from known
    # pixels so decode must invert Sub/Up/Average/Paeth exactly.
    pix = [
        [10, 20, 30, 40, 50, 60],
        [15, 25, 35, 45, 55, 65],
        [100, 0, 255, 7, 9, 11],
        [102, 3, 250, 17, 29, 41],
        [1, 2, 3, 4, 5, 6],
    ]
    bpp = 3

    def prev(y, x):
        return pix[y - 1][x] if y else 0

    rows = [bytes([0]) + bytes(pix[0])]  # None
    rows.append(  # Sub
        bytes([1])
        + bytes(
            (pix[1][x] - (pix[1][x - bpp] if x >= bpp else 0)) & 0xFF
            for x in range(6)
        )
    )
    rows.append(  # Up
        bytes([2]) + bytes((pix[2][x] - prev(2, x)) & 0xFF for x in range(6))
    )
    rows.append(  # Average
        bytes([3])
        + bytes(
            (
                pix[3][x]
                - (((pix[3][x - bpp] if x >= bpp else 0) + prev(3, x)) >> 1)
            )
            & 0xFF
            for x in range(6)
        )
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rows.append(  # Paeth
        bytes([4])
        + bytes(
            (
                pix[4][x]
                - paeth(
                    pix[4][x - bpp] if x >= bpp else 0,
                    prev(4, x),
                    pix[3][x - bpp] if x >= bpp else 0,
                )
            )
            & 0xFF
            for x in range(6)
        )
    )
    blob = _manual_png(2, 5, 2, rows)
    w, h, ch, out = decode_png(blob)
    assert (w, h, ch) == (2, 5, 3)
    assert out == b"".join(bytes(r) for r in pix)


def test_png_rejects_unsupported():
    import pytest

    pal = _manual_png(1, 1, 3, [bytes([0, 0])])  # palette colortype
    with pytest.raises(ValueError):
        decode_png(pal)
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(ValueError):
        decode_png(b"GIF89a definitely not png")


def test_grayscale_and_resize_kernels():
    # 2x2 RGB: pure red, green, blue, white
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    grey = to_grayscale(2, 2, 3, px)
    assert list(grey) == [76, 149, 29, 255]  # integer 299/587/114 luma
    up = resize_nearest(2, 2, 3, px, 4, 4)
    # floor mapping: each source pixel becomes a 2x2 block
    assert up[0:3] == bytes([255, 0, 0]) and up[9:12] == bytes([0, 255, 0])
    assert len(up) == 4 * 4 * 3


def test_box_features_golden():
    # 8x8 grey gradient: row y has constant value 32*y -> cell mean is
    # exactly 32*y/255 for the 8x8 grid (one pixel per cell)
    pixels = bytes(min(32 * y, 255) for y in range(8) for _ in range(8))
    blob = encode_png(8, 8, 1, pixels)
    feats = grayscale_box_features(blob, grid=8)
    assert len(feats) == 64
    for y in range(8):
        for x in range(8):
            assert abs(feats[y * 8 + x] - min(32 * y, 255) / 255.0) < 1e-12


def test_extract_features_real_png_path(spark):
    pixels = bytes((x * 13 + y * 29) % 256 for y in range(16) for x in range(16))
    blob = encode_png(16, 16, 1, pixels)
    corrupt = blob[:40] + b"\x00" * 10  # valid signature, broken stream
    rows = [
        (10, "image", blob, "image/png", 16, 16, None),
        (11, "image", corrupt, "image/png", 16, 16, None),
        (12, "image", bytes(range(64)), "application/octet-stream", None, None, None),
    ]
    out = extract_features(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r["media_id"]: r for r in out.collect()}
    assert got[10]["decode_ok"] == "ok_stdlib"
    assert got[10]["feature"] == grayscale_box_features(blob, grid=8)
    assert got[11]["decode_ok"] == "error"  # recognized but corrupt
    assert got[12]["decode_ok"] == "stubbed"  # no PNG signature


def test_resize_images_real_png_path(spark):
    pixels = bytes((x * 9 + y * 5 + c) % 256
                   for y in range(10) for x in range(6) for c in range(3))
    blob = encode_png(6, 10, 3, pixels)
    rows = [(20, "image", blob, "image/png", 6, 10, None)]
    out = resize_images(
        spark.createDataFrame(rows, MEDIA_SCHEMA), width=3, height=5
    )
    r = out.collect()[0]
    assert r["decode_ok"] == "ok_stdlib"
    w, h, ch, px = decode_png(bytes(r["payload"]))
    assert (w, h, ch) == (3, 5, 3)
    # floor-mapped nearest: out(x,y) = src(2x, 2y)
    expected = resize_nearest(6, 10, 3, pixels, 3, 5)
    assert px == expected
    # byte-determinism of the re-encode
    r2 = resize_images(
        spark.createDataFrame(rows, MEDIA_SCHEMA), width=3, height=5
    ).collect()[0]
    assert bytes(r2["payload"]) == bytes(r["payload"])


# ---------------------------------------------------------------------------
# stdlib WAV codec: real audio decode (RIFF + integer PCM, struct-only)
# ---------------------------------------------------------------------------

from calp_cva_tracking_pipeline_spark.operators.wav_stdlib import (
    decode_wav,
    encode_wav,
    is_wav,
    rms_envelope_features,
)


def test_wav_roundtrip_mono16_stereo8():
    frames16 = struct.pack("<8h", 0, 1000, -1000, 32767, -32768, 5, -5, 0)
    blob = encode_wav(16000, 1, 2, frames16)
    assert is_wav(blob)
    assert decode_wav(blob) == (16000, 1, 2, frames16)
    frames8 = bytes([128, 255, 0, 128, 200, 56])  # 3 stereo frames
    blob8 = encode_wav(8000, 2, 1, frames8)
    assert decode_wav(blob8) == (8000, 2, 1, frames8)


def test_wav_rejects_unsupported():
    import pytest

    # float PCM (tag 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        decode_wav(blob)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVEtruncated")
    with pytest.raises(ValueError):
        decode_wav(b"OggS definitely not wav")


def test_wav_rms_envelope_golden():
    # 800 samples: first half silence, second half constant 16384
    # (half full-scale) -> bins 0-3 = 0.0, bins 4-7 = 0.5 exactly
    frames = struct.pack("<400h", *([0] * 400)) + struct.pack(
        "<400h", *([16384] * 400)
    )
    blob = encode_wav(8000, 1, 2, frames)
    feats = rms_envelope_features(blob, bins=8)
    assert feats[:4] == [0.0] * 4
    for v in feats[4:]:
        assert abs(v - 0.5) < 1e-9


def test_wav_stereo_mono_mix():
    # L=+2000, R=-2000 per frame -> mono mix 0 -> zero envelope
    frames = struct.pack("<8h", *([2000, -2000] * 4))
    feats = rms_envelope_features(encode_wav(8000, 2, 2, frames), bins=2)
    assert feats == [0.0, 0.0]


def test_extract_features_real_wav_path(spark):
    frames = struct.pack("<64h", *([12000, -12000] * 32))
    blob = encode_wav(16000, 1, 2, frames)
    corrupt = blob[:20]  # signature ok, truncated chunks
    rows = [
        (30, "audio", blob, "audio/wav", None, None, 4),
        (31, "audio", corrupt, "audio/wav", None, None, 1),
        (32, "audio", bytes([7] * 16), "audio/wav", None, None, 1),
    ]
    out = extract_features(spark.createDataFrame(rows, MEDIA_SCHEMA))
    got = {r["media_id"]: r for r in out.collect()}
    assert got[30]["decode_ok"] == "ok_stdlib"
    assert got[30]["feature"] == rms_envelope_features(blob, bins=8)
    assert got[31]["decode_ok"] == "error"
    assert got[32]["decode_ok"] == "stubbed"  # no RIFF signature


# ---------------------------------------------------------------------------
# BMP stdlib codec (round 7): third real decode path
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_and_golden_features():
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        decode_bmp,
        encode_bmp,
        grayscale_box_features_bmp,
        is_bmp,
    )

    # 4x2 RGB test card
    rgb = bytes(
        [
            255, 0, 0,   0, 255, 0,   0, 0, 255,   255, 255, 255,
            0, 0, 0,     128, 128, 128,  255, 255, 0,  0, 255, 255,
        ]
    )
    payload = encode_bmp(4, 2, rgb)
    assert is_bmp(payload)
    w, h, ch, out = decode_bmp(payload)
    assert (w, h, ch) == (4, 2, 3)
    assert out == rgb  # lossless round-trip incl. BGR swap + row padding
    feats = grayscale_box_features_bmp(payload, grid=2)
    assert len(feats) == 4 and all(0.0 <= f <= 1.0 for f in feats)
    # top-left cell covers the red/green corner; bottom-right the cyan
    lum = lambda r, g, b: (299 * r + 587 * g + 114 * b) // 1000
    assert feats[0] == (lum(255, 0, 0) + lum(0, 255, 0)) / (255 * 2)


def test_bmp_rejects_unsupported_variants():
    import struct

    import pytest

    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        decode_bmp,
        encode_bmp,
    )

    good = bytearray(encode_bmp(2, 2, bytes(12)))
    # flip bpp to 8 (palette) → must raise, never silently mis-decode
    bad = bytearray(good)
    struct.pack_into("<H", bad, 28, 8)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad))
    # RLE compression flag
    bad2 = bytearray(good)
    struct.pack_into("<I", bad2, 30, 1)
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad2))
    # truncated pixel data
    with pytest.raises(ValueError):
        decode_bmp(bytes(good[:-3]))


def test_bmp_rows_decode_ok_stdlib_through_pipeline(spark):
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        encode_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    payload = encode_bmp(8, 8, bytes(range(0, 192)))
    rows = [
        (1, "image", bytearray(payload), "image/bmp", 8, 8, None),
        (2, "image", bytearray(b"\xff\xd8\xff jpeg-ish"), "image/jpeg",
         None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_features(df).collect()}
    assert out[1].decode_ok == "ok_stdlib"  # real BMP decode ran
    assert len(out[1].feature) == 64
    assert out[2].decode_ok == "stubbed"    # jpeg stays audited-stub
