"""Property-based tests (hypothesis) for the stdlib media codecs — pure
functions, so these run without a Spark session and explore the input
space the golden tests can't enumerate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from calp_cva_tracking_pipeline_spark.operators.png_stdlib import (
    decode_png,
    encode_png,
    grayscale_box_features,
    resize_nearest,
    to_grayscale,
)
from calp_cva_tracking_pipeline_spark.operators.wav_stdlib import (
    decode_wav,
    encode_wav,
    rms_envelope_features,
)


@st.composite
def _images(draw):
    w = draw(st.integers(1, 12))
    h = draw(st.integers(1, 12))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    pixels = draw(
        st.binary(min_size=w * h * ch, max_size=w * h * ch)
    )
    return w, h, ch, pixels


@settings(max_examples=60, deadline=None)
@given(_images())
def test_png_roundtrip_property(img):
    w, h, ch, pixels = img
    assert decode_png(encode_png(w, h, ch, pixels)) == (w, h, ch, pixels)


@settings(max_examples=40, deadline=None)
@given(_images(), st.integers(1, 8), st.integers(1, 8))
def test_png_resize_property(img, ow, oh):
    w, h, ch, pixels = img
    out = resize_nearest(w, h, ch, pixels, ow, oh)
    assert len(out) == ow * oh * ch
    # every output pixel is some input pixel (nearest never invents values)
    in_px = {
        pixels[i * ch : (i + 1) * ch] for i in range(w * h)
    }
    out_px = {out[i * ch : (i + 1) * ch] for i in range(ow * oh)}
    assert out_px <= in_px


@settings(max_examples=40, deadline=None)
@given(_images())
def test_png_features_bounded(img):
    w, h, ch, pixels = img
    grey = to_grayscale(w, h, ch, pixels)
    assert len(grey) == w * h
    feats = grayscale_box_features(encode_png(w, h, ch, pixels), grid=4)
    assert len(feats) == 16
    assert all(0.0 <= f <= 1.0 for f in feats)


@st.composite
def _wavs(draw):
    ch = draw(st.integers(1, 3))
    width = draw(st.sampled_from([1, 2]))
    n_frames = draw(st.integers(0, 200))
    frames = draw(
        st.binary(
            min_size=n_frames * ch * width, max_size=n_frames * ch * width
        )
    )
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    return rate, ch, width, frames


@settings(max_examples=60, deadline=None)
@given(_wavs())
def test_wav_roundtrip_property(wav):
    rate, ch, width, frames = wav
    assert decode_wav(encode_wav(rate, ch, width, frames)) == (
        rate, ch, width, frames,
    )


@settings(max_examples=40, deadline=None)
@given(_wavs(), st.integers(1, 8))
def test_wav_envelope_bounded(wav, bins):
    rate, ch, width, frames = wav
    feats = rms_envelope_features(
        encode_wav(rate, ch, width, frames), bins=bins
    )
    assert len(feats) == bins
    assert all(0.0 <= f <= 1.0 for f in feats)
