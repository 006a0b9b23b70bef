"""Codec roundtrip + invariant tests (FIXTURES.md §1, BASELINE.json input_hint)."""

import numpy as np
import pytest

from crawler_spark.functions.imaging import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_image,
    encode_png,
    encode_ppm,
    ahash64,
    phash64,
    psnr,
)


def _img(i: int, h: int = 16, w: int = 16) -> np.ndarray:
    rng = np.random.default_rng(i)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", ["png", "ppm", "bmp"])
@pytest.mark.parametrize("hw", [(16, 16), (24, 32), (48, 64), (17, 13)])
def test_roundtrip_lossless(fmt, hw):
    h, w = hw
    arr = _img(h * 1000 + w, h, w)
    data = encode_image(arr, fmt)
    back = decode_image(data, fmt)
    assert back.shape == arr.shape
    assert np.array_equal(back, arr)
    assert psnr(arr, back) == float("inf")  # lossless ⇒ PSNR=∞ ≥ 40dB


def test_png_filters_decode():
    # our writer emits filter 0; verify the reader handles Up(2) and Sub(1)
    arr = _img(7, 8, 8)
    import struct
    import zlib

    from crawler_spark.functions.imaging import _PNG_SIG, _png_chunk

    h, w = 8, 8
    rows = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):
        line = arr[y].reshape(-1)
        if y % 2 == 0:  # Sub
            enc = line.copy()
            enc[3:] = (line[3:].astype(np.int16) - line[:-3].astype(np.int16)).astype(np.uint8)
            rows.append(bytes([1]) + enc.tobytes())
        else:  # Up
            enc = (line.astype(np.int16) - prev.astype(np.int16)).astype(np.uint8)
            rows.append(bytes([2]) + enc.tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), arr)


def test_ppm_header_parsing():
    arr = _img(3, 4, 5)
    data = encode_ppm(arr)
    assert data.startswith(b"P6\n5 4\n255\n")
    assert np.array_equal(decode_ppm(data), arr)


def test_bmp_padding():
    # width 5 → row 15 bytes → 1 pad byte; exercises stride handling
    arr = _img(4, 6, 5)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_phash_deterministic_and_sensitive():
    a = _img(1, 32, 32)
    assert phash64(a) == phash64(a.copy())
    b = a.copy()
    b[:16] = 255 - b[:16]  # flip half the image → phash must move
    assert phash64(a) != phash64(b)
    assert isinstance(phash64(a), int)
    assert -(2**63) <= phash64(a) < 2**63


def test_ahash64_integer_exact():
    # known tile: pixel p = p*4 → sum = 8064; bit = 1 iff 256p > 8064 ⇔ p > 31.5
    tile = (np.arange(64, dtype=np.uint8) * 4).reshape(8, 8)
    expected_bits = [1 if 256 * p > 8064 else 0 for p in range(64)]
    val = 0
    for b in expected_bits:
        val = (val << 1) | b
    expected = int(np.int64(np.uint64(val)))
    assert ahash64(tile) == expected
    # grayscale-as-RGB uses channel 0 and matches the 2-D form
    rgb = np.repeat(tile.reshape(8, 8, 1), 3, axis=2)
    assert ahash64(rgb) == ahash64(tile)
    # ties (64·v == Σv) resolve to 0: a constant tile hashes to all-zero bits
    assert ahash64(np.full((8, 8), 77, dtype=np.uint8)) == 0
    # the hash survives the lossless PNG roundtrip (the q49 contract)
    assert ahash64(decode_png(encode_png(rgb))) == ahash64(tile)
    with pytest.raises(ValueError):
        ahash64(np.zeros((16, 16), dtype=np.uint8))


def test_jpeg_stub():
    with pytest.raises(NotImplementedError):
        encode_image(_img(0), "jpeg")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8", "jpeg")


def test_psnr_known_value():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0, 0] = 255
    mse = 255.0**2 / (8 * 8 * 3)
    assert abs(psnr(a, b) - 10 * np.log10(255.0**2 / mse)) < 1e-9


def test_stubbed_codec_rows_are_skipped_not_passed():
    """A jpeg (stub codec) row must yield NULL flags — never a silent pass
    (round-1 counted any jpeg row, even a corrupt one, as verified)."""
    from crawler_spark.functions.imaging import decode_check_rows

    arr = _img(1, 4, 4)
    out = decode_check_rows(
        ["a", "b"],
        [b"\xff\xd8\x00bad", encode_image(arr, "ppm")],
        ["jpeg", "ppm"],
        [4, 4],
        [4, 4],
        [0, phash64(arr)],
    )
    jrow = out[out["image_id"] == "a"].iloc[0]
    assert jrow["decode_ok"] is None and jrow["shape_ok"] is None and jrow["phash_ok"] is None
    prow = out[out["image_id"] == "b"].iloc[0]
    assert bool(prow["decode_ok"]) and bool(prow["shape_ok"]) and bool(prow["phash_ok"])
