"""Minimal stdlib WAV (RIFF PCM) codec (T20 real-decode fallback, audio).

Companion to png_stdlib: the audio modality's decode path should not
require torchaudio/soundfile for the formats stdlib arithmetic can
handle. WAV PCM is length-prefixed RIFF chunks over raw integer samples —
``struct`` covers it completely (the ``wave`` module is avoided on
purpose: it leans on the deprecated ``audioop`` for some paths and can't
read from arbitrary chunk layouts).

Supported: format tag 1 (integer PCM), 8-bit unsigned / 16-bit signed
little-endian, any channel count / sample rate. Unsupported (ValueError,
callers fall back to the stub): float PCM (tag 3), compressed tags,
24/32-bit widths — rare in training corpora that haven't already been
normalized, and a deploy image doing serious audio work brings real
codecs anyway.
"""

from __future__ import annotations

import struct

_RIFF = b"RIFF"
_WAVE = b"WAVE"


def is_wav(payload: bytes | None) -> bool:
    return (
        payload is not None
        and bytes(payload[:4]) == _RIFF
        and bytes(payload[8:12]) == _WAVE
    )


def decode_wav(payload: bytes) -> tuple[int, int, int, bytes]:
    """→ (sample_rate, channels, sample_width_bytes, frames).

    ``frames`` is the raw interleaved PCM byte stream from the data
    chunk. Raises ValueError outside the supported subset."""
    data = bytes(payload)
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE signature")
    pos = 12
    rate = channels = width = -1
    frames: bytes | None = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            tag, channels, rate, _byterate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise ValueError(f"unsupported WAV format tag {tag}")
            if bits not in (8, 16):
                raise ValueError(f"unsupported bit depth {bits}")
            width = bits // 8
        elif ctype == b"data":
            frames = body
    if rate < 0 or frames is None:
        raise ValueError("missing fmt/data chunk")
    frame_bytes = channels * width
    if frame_bytes == 0 or len(frames) % frame_bytes:
        raise ValueError("data chunk not frame-aligned")
    return rate, channels, width, frames


def encode_wav(
    rate: int, channels: int, width: int, frames: bytes
) -> bytes:
    """Canonical-layout PCM writer (fmt then data) — byte-deterministic."""
    if width not in (1, 2):
        raise ValueError(f"sample width must be 1 or 2 bytes: {width}")
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * width,
        channels * width, width * 8,
    )
    data_len = len(frames)
    riff_len = 4 + (8 + len(fmt)) + (8 + data_len + (data_len & 1))
    return (
        _RIFF + struct.pack("<I", riff_len) + _WAVE
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_len) + frames
        + (b"\x00" if data_len & 1 else b"")
    )


def _mono_samples(channels: int, width: int, frames: bytes) -> list[int]:
    """Channel-averaged integer samples centered on 0 (8-bit unsigned is
    re-centered by -128; 16-bit is already signed)."""
    if width == 1:
        raw = [b - 128 for b in frames]
    else:
        raw = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    n = len(raw) // channels
    return [
        sum(raw[i * channels : (i + 1) * channels]) // channels
        for i in range(n)
    ]


def rms_envelope_features(payload: bytes, bins: int = 8) -> list[float]:
    """The stdlib real-decode audio feature kernel: decode → mono mix →
    ``bins`` equal time windows → per-window RMS normalized to [0,1].
    Integer sums of squares, one sqrt+division per bin — deterministic.
    Empty data chunk → all-zero envelope (a decoded silence, not an
    error)."""
    import math

    _rate, channels, width, frames = decode_wav(payload)
    mono = _mono_samples(channels, width, frames)
    full = 128.0 if width == 1 else 32768.0
    n = len(mono)
    feats: list[float] = []
    for b in range(bins):
        lo, hi = (b * n) // bins, ((b + 1) * n) // bins
        if hi <= lo:
            feats.append(0.0)
            continue
        acc = 0
        for i in range(lo, hi):
            acc += mono[i] * mono[i]
        feats.append(min(math.sqrt(acc / (hi - lo)) / full, 1.0))
    return feats
