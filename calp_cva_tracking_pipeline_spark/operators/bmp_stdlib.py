"""Real BMP decoding with ZERO dependencies — pure `struct` over the
Windows DIB format, the third stdlib-expressible codec next to PNG
(`png_stdlib`) and WAV (`wav_stdlib`).

Scope (the formats real pipelines actually meet from screenshots and
legacy exports): uncompressed BI_RGB, 24 or 32 bits per pixel, BITMAPINFOHEADER
or newer (V4/V5 — same leading fields), bottom-up or top-down row order.
Palette, RLE and 16-bpp variants raise — the caller's dispatch falls back
to the audited stub, never a silent wrong decode. Rows are padded to
4-byte boundaries per the spec; pixels are stored BGR(A), converted to
RGB here so the shared grayscale/pooling kernel (`png_stdlib`) applies
unchanged.
"""

from __future__ import annotations

import struct


def is_bmp(payload: bytes | None) -> bool:
    return payload is not None and len(payload) > 54 and payload[:2] == b"BM"


def decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels=3, RGB pixel bytes, top-down row
    order). Raises ValueError on anything outside the supported
    uncompressed 24/32-bpp BI_RGB envelope."""
    if not is_bmp(payload):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported DIB header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP: planes={planes} bpp={bpp} "
            f"compression={compression}"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    ch_in = bpp // 8
    row_stride = (width * ch_in + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + row_stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = data_offset + src_row * row_stride
        dst = y * width * 3
        for x in range(width):
            b = payload[base + x * ch_in]
            g = payload[base + x * ch_in + 1]
            r = payload[base + x * ch_in + 2]
            out[dst + x * 3] = r
            out[dst + x * 3 + 1] = g
            out[dst + x * 3 + 2] = b
    return width, height, 3, bytes(out)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal bottom-up 24-bpp BI_RGB writer (test fixture twin of
    ``decode_bmp`` — round-trip golden tests need a known-good
    encoder)."""
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    row_stride = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_stride - width * 3)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            r, g, b = rgb[i], rgb[i + 1], rgb[i + 2]
            row += bytes((b, g, r))
        body += row + pad
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
        2835, 2835, 0, 0,
    )
    return header + dib + bytes(body)


def grayscale_box_features_bmp(payload: bytes, grid: int = 8) -> list[float]:
    """BMP twin of ``png_stdlib.grayscale_box_features``: decode →
    shared integer-luma + box-mean pooling kernel → grid² floats."""
    from calp_cva_tracking_pipeline_spark.operators.png_stdlib import (
        to_grayscale,
    )

    width, height, channels, pixels = decode_bmp(payload)
    grey = to_grayscale(width, height, channels, pixels)
    feats: list[float] = []
    for gy in range(grid):
        y0, y1 = (gy * height) // grid, ((gy + 1) * height) // grid
        y1 = max(y1, y0 + 1)
        for gx in range(grid):
            x0, x1 = (gx * width) // grid, ((gx + 1) * width) // grid
            x1 = max(x1, x0 + 1)
            total = 0
            n = 0
            for y in range(min(y0, height - 1), min(y1, height)):
                row = y * width
                for x in range(min(x0, width - 1), min(x1, width)):
                    total += grey[row + x]
                    n += 1
            feats.append(total / (255 * max(n, 1)))
    return feats
