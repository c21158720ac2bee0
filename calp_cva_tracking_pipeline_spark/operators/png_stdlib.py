"""Minimal stdlib PNG codec (T20 real-decode fallback).

The multimodal tier's real decode path wants PIL, but deploy images for
pure-text clusters often lack codec libraries entirely — and this build
container forbids installs. PNG needs nothing beyond stdlib: the container
format is length-prefixed chunks, the pixel stream is zlib (stdlib) over
per-row filters. This module implements the subset the engine's image
kernels need — 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced,
all five row filters on decode; filter-0 rows on encode — mirroring the
S6 xlsx precedent (sources/xlsx_stdlib.py): a real, tested codec with no
third-party dependency.

Not supported (raise ValueError, callers fall back to the stub): palette
color (needs PLTE indirection), bit depths != 8, interlacing. Those are
re-encode concerns, not feature-extraction concerns, at the corpus tier.

Pixels are flat ``bytes`` row-major, ``channels`` interleaved — the layout
zlib hands back, so decode does no copies beyond unfiltering.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# colortype -> channel count (3 = palette, unsupported)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLORTYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> IHDR color type


def is_png(payload: bytes | None) -> bool:
    return payload is not None and bytes(payload[:8]) == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, pixels). Raises ValueError on anything
    outside the supported subset or on corrupt streams."""
    data = bytes(payload)
    if not is_png(data):
        raise ValueError("not a PNG signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # skip CRC (integrity is the transport's job)
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            seen_end = True
            break
    if width < 0 or not seen_end or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("pixel stream length mismatch")
    out = bytearray(stride * height)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[(y - 1) * stride : y * stride] if y else bytes(stride)
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (row[x] + row[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = row[x - bpp] if x >= bpp else 0
                upleft = prev[x - bpp] if x >= bpp else 0
                row[x] = (row[x] + _paeth(left, prev[x], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown row filter {ftype}")
        out[y * stride : (y + 1) * stride] = row
    return width, height, channels, bytes(out)


def encode_png(
    width: int, height: int, channels: int, pixels: bytes, level: int = 6
) -> bytes:
    """Filter-0 rows + fixed zlib level → byte-deterministic output for a
    given (pixels, level) — the property resize_images' contract needs."""
    if channels not in _COLORTYPE:
        raise ValueError(f"channels must be 1/2/3/4: {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLORTYPE[channels], 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def to_grayscale(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Integer ITU-R 601 luma ((299R + 587G + 114B) // 1000); alpha
    ignored. Already-grey images pass through."""
    if channels in (1, 2):
        if channels == 1:
            return pixels
        return bytes(pixels[i] for i in range(0, len(pixels), 2))
    out = bytearray(width * height)
    for i in range(width * height):
        r, g, b = pixels[i * channels : i * channels + 3]
        out[i] = (299 * r + 587 * g + 114 * b) // 1000
    return bytes(out)


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    out_w: int,
    out_h: int,
) -> bytes:
    """Deterministic nearest-neighbor: source index = (i*src)//dst (the
    floor mapping, stable across platforms — no float rounding)."""
    out = bytearray(out_w * out_h * channels)
    for oy in range(out_h):
        sy = (oy * height) // out_h
        for ox in range(out_w):
            sx = (ox * width) // out_w
            src = (sy * width + sx) * channels
            dst = (oy * out_w + ox) * channels
            out[dst : dst + channels] = pixels[src : src + channels]
    return bytes(out)


def grayscale_box_features(payload: bytes, grid: int = 8) -> list[float]:
    """The stdlib real-decode feature kernel: decode → integer luma →
    ``grid``×``grid`` box-mean pooling → [0,1] floats. Deterministic
    (integer sums, one float division per cell); values differ from the
    PIL path's resample kernel, so callers tag rows with which codec ran
    (decode_ok = ok vs ok_stdlib) — never mix paths within one corpus
    build."""
    width, height, channels, pixels = decode_png(payload)
    grey = to_grayscale(width, height, channels, pixels)
    feats: list[float] = []
    for gy in range(grid):
        y0, y1 = (gy * height) // grid, ((gy + 1) * height) // grid
        y1 = max(y1, y0 + 1)
        for gx in range(grid):
            x0, x1 = (gx * width) // grid, ((gx + 1) * width) // grid
            x1 = max(x1, x0 + 1)
            total = 0
            for y in range(min(y0, height - 1), min(y1, height)):
                row = y * width
                for x in range(min(x0, width - 1), min(x1, width)):
                    total += grey[row + x]
            n = (min(y1, height) - min(y0, height - 1)) * (
                min(x1, width) - min(x0, width - 1)
            )
            feats.append(total / (255.0 * max(n, 1)))
    return feats
