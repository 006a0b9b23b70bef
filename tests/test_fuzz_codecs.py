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


# ---------------------------------------------------------------- MJPEG


@settings(max_examples=200, deadline=None)
@given(data=garbage)
def test_mjpeg_decoders_raise_valueerror_only(data):
    from crawler_spark.functions.video import decode_mjpeg, sample_frames_mjpeg

    for payload in (data, b"\xff\xd8" + data):
        try:
            decode_mjpeg(payload)
            sample_frames_mjpeg(payload)
        except ValueError:
            pass


@settings(max_examples=60, deadline=None)
@given(
    nf=st.integers(1, 4),
    h=st.integers(4, 20),
    w=st.integers(4, 20),
    seed=st.integers(0, 10_000),
)
def test_mjpeg_parity_with_per_frame_jpeg(nf, h, w, seed):
    """decode_mjpeg(encode_mjpeg(frames)) must be pixel-identical to decoding
    each frame's own encode_jpeg — the container adds zero pixel semantics."""
    from crawler_spark.functions.video import decode_mjpeg, encode_mjpeg, split_mjpeg

    frames = [_rgb(seed + i, h, w) for i in range(nf)]
    stream = encode_mjpeg(frames, quality=90)
    parts = split_mjpeg(stream)
    assert len(parts) == nf
    assert parts == [encode_jpeg(f, quality=90) for f in frames]
    got = decode_mjpeg(stream)
    want = [decode_jpeg(encode_jpeg(f, quality=90)) for f in frames]
    assert all((g == w_).all() for g, w_ in zip(got, want))


def test_mjpeg_split_survives_comment_payload_with_eoi_bytes():
    """A COM segment whose payload contains FF D9 must not truncate the
    frame: the splitter walks segment lengths, it does not string-search."""
    from crawler_spark.functions.video import decode_mjpeg, split_mjpeg

    f0, f1 = _rgb(1, 8, 8), _rgb(2, 8, 8)
    j0, j1 = encode_jpeg(f0), encode_jpeg(f1)
    payload = b"trap\xff\xd9trap"
    com = b"\xff\xfe" + (len(payload) + 2).to_bytes(2, "big") + payload
    spliced = j0[:2] + com + j0[2:]  # COM right after SOI
    parts = split_mjpeg(spliced + j1)
    assert len(parts) == 2 and parts[0] == spliced and parts[1] == j1
    dec = decode_mjpeg(spliced + j1)
    assert (dec[0] == decode_jpeg(j0)).all() and (dec[1] == decode_jpeg(j1)).all()


def test_mjpeg_split_handles_restart_markers():
    from crawler_spark.functions.video import decode_mjpeg, split_mjpeg

    f = _rgb(3, 24, 24)
    j = encode_jpeg(f, quality=85, restart_interval=2)
    assert b"\xff\xd0" in j or b"\xff\xd1" in j  # RSTn actually present
    assert split_mjpeg(j + j) == [j, j]
    dec = decode_mjpeg(j + j)
    assert (dec[0] == dec[1]).all() and (dec[0] == decode_jpeg(j)).all()


# ---------------------------------------------------------------- G.711 μ-law


def _ulaw_ref_encode(x: int) -> int:
    """Scalar CCITT reference arithmetic (BIAS 0x84, CLIP 32635)."""
    sign = 0x80 if x < 0 else 0
    m = min(abs(x), 32635) + 0x84
    seg = 7
    for s in range(8):
        if m >> (s + 8) == 0:
            seg = s
            break
    return ~(sign | (seg << 4) | ((m >> (seg + 3)) & 0x0F)) & 0xFF


def _ulaw_ref_decode(u: int) -> int:
    u = ~u & 0xFF
    mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)) - 0x84
    return -mag if u & 0x80 else mag


def test_mulaw_encode_matches_reference_full_space():
    from crawler_spark.functions.audio import encode_mulaw

    xs = np.arange(-32768, 32768, dtype=np.int64)
    got = np.frombuffer(encode_mulaw(xs), dtype=np.uint8)
    want = np.array([_ulaw_ref_encode(int(x)) for x in xs], dtype=np.uint8)
    assert (got == want).all()
    assert got[32768] == 0xFF  # spec: zero companded to 0xFF


def test_mulaw_decode_matches_reference_all_codes():
    from crawler_spark.functions.audio import decode_mulaw

    got = decode_mulaw(bytes(range(256)))
    want = np.array([_ulaw_ref_decode(b) for b in range(256)], dtype=np.int16)
    assert (got == want).all()


def test_mulaw_companding_idempotent_and_bounded():
    """decode∘encode is a fixed point on VALUES (decoding a re-encoded
    decoded value changes nothing — codes can differ only at μ-law's two
    zero representations, 0x7F/0xFF) and quantization error is bounded by
    half the top-segment step (≤ 512)."""
    from crawler_spark.functions.audio import decode_mulaw, encode_mulaw

    xs = np.arange(-32768, 32768, 7, dtype=np.int64)
    rt = decode_mulaw(encode_mulaw(xs))
    assert (decode_mulaw(encode_mulaw(rt)) == rt).all()
    err = np.abs(rt.astype(np.int64) - np.clip(xs, -32635, 32635))
    assert int(err.max()) <= 512
