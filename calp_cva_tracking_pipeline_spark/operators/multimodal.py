"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` payloads with typed metadata, processed via
Arrow-batched ``mapInPandas`` so decode parallelism follows data partitioning
(the 100 TB pattern: one partition ≈ one decode batch, executors scale out).

Decode paths, in preference order per row (the ``decode_ok`` column
records which ran — never mix paths within one corpus build):

- ``ok`` — PIL, any format it recognizes (absent in this container);
- ``ok_stdlib`` — the dependency-free codecs for payloads carrying a real
  container signature: PNG (operators.png_stdlib: zlib + struct, 8-bit
  grey/RGB/RGBA, all five row filters), uncompressed 24/32-bpp BMP
  (operators.bmp_stdlib: struct over the DIB format, bottom-up or
  top-down) and WAV PCM (operators.wav_stdlib: RIFF + 8/16-bit integer
  PCM) — REAL decodes, golden-tested in tests/test_multimodal.py
  without any codec library;
- ``stubbed`` — deterministic byte-histogram fake for everything else
  (jpeg/video — ffmpeg-class codecs are not stdlib-expressible);
- ``error`` — a recognized payload that failed to decode (corrupt).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("decode_ok", StringType(), False),  # ok|stubbed|error
    ]
)

RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("decode_ok", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("decode_ok", StringType(), False),
    ]
)


def _decode_image_real(payload: bytes) -> list[float]:  # pragma: no cover
    """PIL decode path — requires PIL; raises if unavailable."""
    from io import BytesIO

    from PIL import Image  # noqa: F401

    img = Image.open(BytesIO(payload)).convert("L").resize((8, 8))
    return [p / 255.0 for p in img.getdata()]


def _decode_image_stdlib(payload: bytes) -> list[float]:
    """Real image decode with zero dependencies: PNG (operators.
    png_stdlib) or uncompressed 24/32-bpp BMP (operators.bmp_stdlib),
    grey luma + 8×8 box-mean pooling either way. Raises on anything
    else (jpeg/webp are not stdlib-expressible — they stay stubbed)."""
    from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
        grayscale_box_features_bmp,
        is_bmp,
    )
    from calp_cva_tracking_pipeline_spark.operators.png_stdlib import (
        grayscale_box_features,
        is_png,
    )

    if is_png(payload):
        return grayscale_box_features(payload, grid=8)
    if is_bmp(payload):
        return grayscale_box_features_bmp(payload, grid=8)
    raise ValueError("unsupported image format for stdlib decode")


def _decode_audio_stdlib(payload: bytes) -> list[float]:
    """Real WAV PCM decode with zero dependencies (operators.wav_stdlib):
    mono mix + 8-bin RMS envelope. Raises on non-WAV/unsupported. The
    8-dim output matches the image path's pooled-grid dimensionality
    convention (FEATURE_SCHEMA is variable-length; downstream models key
    on media_type)."""
    from calp_cva_tracking_pipeline_spark.operators.wav_stdlib import (
        rms_envelope_features,
    )

    return rms_envelope_features(payload, bins=8)


def _decode_stub(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic fake: byte-histogram features from the raw payload.

    Marked STUB — replace with _decode_image_real / ffmpeg frame-sampling
    when codec libraries are present on the cluster.
    """
    if payload is None:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    total = max(len(payload), 1)
    return [c / total for c in counts]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over media rows → FEATURE_SCHEMA.

    Decode work happens inside executor Python workers on Arrow batches;
    repartition upstream by media_id for even decode load.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - codec libs absent in this container
            from PIL import Image  # noqa: F401

            have_pil = True
        except ImportError:
            have_pil = False
        from calp_cva_tracking_pipeline_spark.operators.bmp_stdlib import (
            is_bmp,
        )
        from calp_cva_tracking_pipeline_spark.operators.png_stdlib import (
            is_png,
        )
        from calp_cva_tracking_pipeline_spark.operators.wav_stdlib import (
            is_wav,
        )

        for pdf in batches:
            feats, status = [], []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                if have_pil and mtype == "image" and payload is not None:
                    try:  # pragma: no cover
                        feats.append(_decode_image_real(payload))
                        status.append("ok")
                        continue
                    except Exception:
                        feats.append(_decode_stub(payload))
                        status.append("error")
                        continue
                if (
                    mtype == "image"
                    and (is_png(payload) or is_bmp(payload))
                ) or (mtype == "audio" and is_wav(payload)):
                    try:
                        feats.append(
                            _decode_image_stdlib(payload)
                            if mtype == "image"
                            else _decode_audio_stdlib(payload)
                        )
                        status.append("ok_stdlib")
                        continue
                    except Exception:
                        feats.append(_decode_stub(payload))
                        status.append("error")
                        continue
                feats.append(_decode_stub(payload))
                status.append("stubbed")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_ok": status,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame, width: int = 224, height: int = 224
) -> DataFrame:
    """mapInPandas image resize → RESIZE_SCHEMA (one row per image).

    PIL when present (``ok``); else a REAL nearest-neighbor resize +
    re-encode through the stdlib PNG codec for PNG payloads
    (``ok_stdlib`` — byte-deterministic: floor-mapped sampling, filter-0
    rows, fixed zlib level); else the STUB fake truncates/pads the raw
    payload to width*height bytes (``stubbed``) so the Spark-side
    contract stays testable for formats with no stdlib codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:  # pragma: no cover - codec libs absent in this container
            from io import BytesIO

            from PIL import Image

            have_pil = True
        except ImportError:
            have_pil = False
        from calp_cva_tracking_pipeline_spark.operators import png_stdlib

        target = width * height
        for pdf in batches:
            payloads, status = [], []
            for payload in pdf["payload"]:
                if payload is None:
                    payloads.append(None)
                    status.append("stubbed")
                    continue
                if have_pil:  # pragma: no cover
                    try:
                        img = Image.open(BytesIO(payload)).resize(
                            (width, height)
                        )
                        buf = BytesIO()
                        img.save(buf, format="PNG")
                        payloads.append(buf.getvalue())
                        status.append("ok")
                        continue
                    except Exception:
                        status.append("error")
                elif png_stdlib.is_png(payload):
                    try:
                        w0, h0, ch, px = png_stdlib.decode_png(payload)
                        resized = png_stdlib.resize_nearest(
                            w0, h0, ch, px, width, height
                        )
                        payloads.append(
                            png_stdlib.encode_png(width, height, ch, resized)
                        )
                        status.append("ok_stdlib")
                        continue
                    except Exception:
                        status.append("error")
                else:
                    status.append("stubbed")
                # STUB: deterministic truncate/cycle-pad to target size
                raw = bytes(payload)
                reps = (target // max(len(raw), 1)) + 1
                payloads.append((raw * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                    "decode_ok": status,
                }
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """mapInPandas video frame sampling → FRAME_SCHEMA (row per frame).

    Emits one row per sampled timestamp up to ``max_frames``, bounded by
    the row's ``duration_ms`` metadata. Real path would invoke ffmpeg per
    batch (pragma-gated); the STUB fake slices the payload evenly so frame
    boundaries are deterministic. The fan-out (1 video → N frame rows)
    happens inside the executor, so downstream repartitioning sees frame
    granularity — the shape that matters at 100 TB.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "frame_index": [], "frame_ms": [],
                "payload": [], "decode_ok": [],
            }
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # Arrow hands nullable ints to pandas as float NaN
                if payload is None or pd.isna(duration) or duration <= 0:
                    continue
                n = min(max_frames, max(int(duration // every_ms), 1))
                raw = bytes(payload)
                step = max(len(raw) // n, 1)
                for i in range(n):
                    out["media_id"].append(media_id)
                    out["frame_index"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["payload"].append(raw[i * step:(i + 1) * step])
                    out["decode_ok"].append("stubbed")
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)
