"""Hypothesis fuzz for the codec layer (imaging/audio/video/sniffer).

Two contracts, both load-bearing for executor code:

1. Decoders FAIL LOUDLY on malformed input — ``ValueError``, never a stray
   ``struct.error`` / ``IndexError`` / hang.  Query code that needs
   poisoned rows to survive wraps decode in its own try/except; the typed
   error is what lets it distinguish "bad payload" from a codec bug.
2. Encode→decode round-trips EXACTLY for the lossless containers at any
   shape (incl. the BMP row-padding and PPM header edge cases fixed sizes
   would never hit), and the header sniffer agrees with the encoder for
   every shape without touching pixel data.

Shapes are kept tiny (≤ 24 px a side) so 200 examples run in seconds.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.audio import decode_wav, encode_wav
from crawler_spark.functions.imaging import (
    decode_bmp,
    decode_image,
    decode_jpeg,
    decode_png,
    decode_ppm,
    encode_image,
    encode_jpeg,
    psnr,
    sniff_image_meta,
)
from crawler_spark.functions.video import decode_y4m, encode_y4m, sample_frames

garbage = st.binary(max_size=400)


def _rgb(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3)).astype(np.uint8)


@settings(max_examples=200, deadline=None)
@given(data=garbage)
def test_decoders_raise_valueerror_only(data):
    for dec in (decode_png, decode_ppm, decode_bmp, decode_jpeg):
        try:
            dec(data)
        except ValueError:
            pass
    try:
        decode_wav(data)
    except ValueError:
        pass
    try:
        decode_y4m(data)
        sample_frames(data)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(data=garbage)
def test_decoders_raise_on_magic_prefixed_garbage(data):
    """The hard half of the contract: bytes that PASS the magic check but
    are torn/corrupt after it must still fail as ValueError."""
    for magic, dec in (
        (b"\x89PNG\r\n\x1a\n", decode_png),
        (b"P6\n", decode_ppm),
        (b"BM", decode_bmp),
        (b"\xff\xd8", decode_jpeg),
        (b"RIFF", decode_wav),
        (b"YUV4MPEG2 ", decode_y4m),
    ):
        try:
            dec(magic + data)
        except ValueError:
            pass


@settings(max_examples=150, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    fmt=st.sampled_from(["png", "ppm", "bmp"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_lossless_roundtrip_and_sniff_any_shape(h, w, fmt, seed):
    arr = _rgb(seed, h, w)
    raw = encode_image(arr, fmt)
    assert np.array_equal(decode_image(raw, fmt), arr)
    assert sniff_image_meta(raw) == (fmt, w, h)


@settings(max_examples=60, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24), seed=st.integers(0, 2**31 - 1))
def test_jpeg_decodes_any_shape_with_sane_error(h, w, seed):
    arr = _rgb(seed, h, w)
    raw = encode_jpeg(arr)
    out = decode_jpeg(raw)
    assert out.shape == arr.shape and out.dtype == np.uint8
    assert sniff_image_meta(raw) == ("jpeg", w, h)
    # worst-case random noise at default quality still bounds the error;
    # the strict PSNR>=40dB gate lives in test_imaging with pinned configs
    assert psnr(arr, out) >= 20.0


@settings(max_examples=100, deadline=None)
@given(
    n=st.integers(0, 200),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    samples = (
        np.random.RandomState(seed).randint(-(2**15), 2**15, n).astype(np.int16)
    )
    out, out_rate = decode_wav(encode_wav(samples, rate))
    assert out_rate == rate
    assert np.array_equal(out, samples[:, None])  # decode returns (n, ch)


@settings(max_examples=60, deadline=None)
@given(
    nf=st.integers(1, 6),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_any_shape(nf, h, w, seed):
    frames = np.random.RandomState(seed).randint(0, 256, (nf, h, w)).astype(np.uint8)
    out, fps = decode_y4m(encode_y4m(frames, fps=25))
    assert fps == 25
    assert np.array_equal(out, frames)
