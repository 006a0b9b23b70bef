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


@pytest.mark.parametrize("hw", [(16, 16), (24, 32), (17, 13), (8, 8)])
def test_jpeg_roundtrip_lossy_psnr_gate(hw):
    """The north rule's lossy invariant, end to end on the hardest content:
    uniform-noise tiles (exactly what the fixtures carry).  At the default
    quality the roundtrip must clear PSNR >= 40 dB while staying genuinely
    lossy (bit-identical output would mean the codec isn't a DCT codec)."""
    h, w = hw
    arr = _img(h * 100 + w, h, w)
    data = encode_image(arr, "jpeg")
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    back = decode_image(data, "jpeg")
    assert back.shape == arr.shape
    assert not np.array_equal(back, arr)  # genuinely lossy
    assert psnr(arr, back) >= 40.0


def test_jpeg_smooth_content_near_exact():
    # a horizontal ramp has almost no AC energy: quantization loses nothing
    x = np.linspace(0, 255, 64).astype(np.uint8)
    smooth = np.stack([np.tile(x, (64, 1))] * 3, axis=-1)
    back = decode_image(encode_image(smooth, "jpeg"), "jpeg")
    assert psnr(smooth, back) > 55.0


def test_jpeg_quality_monotone():
    from crawler_spark.functions.imaging import decode_jpeg, encode_jpeg

    arr = _img(9, 32, 32)
    p = [psnr(arr, decode_jpeg(encode_jpeg(arr, q))) for q in (50, 80, 95, 100)]
    assert p == sorted(p)  # higher quality → higher fidelity
    assert len(encode_jpeg(arr, 50)) < len(encode_jpeg(arr, 100))


@pytest.mark.parametrize("hw", [(16, 16), (17, 13), (32, 24), (9, 9)])
@pytest.mark.parametrize("ri", [0, 1, 3])
def test_jpeg_420_and_restart_decode_paths(hw, ri):
    """Exercise the decoder's 2x2-upsample and RSTn paths with real streams
    (our own 4:2:0 + restart-interval encoder emits them)."""
    from crawler_spark.functions.imaging import decode_jpeg, encode_jpeg

    arr = _img(hw[0] * 10 + hw[1], *hw)
    d420 = decode_jpeg(encode_jpeg(arr, 95, subsampling="420", restart_interval=ri))
    assert d420.shape == arr.shape
    # luma survives chroma decimation: Y-plane PSNR stays high even on noise
    luma = lambda a: 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    ly, lb = luma(arr.astype(np.float64)), luma(d420.astype(np.float64))
    mse = np.mean((ly - lb) ** 2)
    assert 10 * np.log10(255.0**2 / max(mse, 1e-12)) > 30.0


def test_jpeg_restart_interval_is_bitstream_only():
    # RSTn segmentation must not change decoded pixels (pure resilience)
    from crawler_spark.functions.imaging import decode_jpeg, encode_jpeg

    arr = _img(5, 24, 24)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(arr, 98)),
        decode_jpeg(encode_jpeg(arr, 98, restart_interval=2)),
    )


def test_jpeg_grayscale_single_component_scan():
    """Hand-build a 1-component (luma-only) stream: the decoder must take the
    grayscale branch and replicate Y into all three RGB channels."""
    import struct

    from crawler_spark.functions.imaging import (
        _AC_BITS,
        _AC_ENC,
        _AC_VALS,
        _DC_BITS,
        _DC_ENC,
        _DC_VALS,
        _ZZ_ARR,
        _BitWriter,
        _dct_quant_blocks,
        _encode_block,
        _scaled_quant,
        _seg,
        _QLUMA,
        decode_jpeg,
    )

    gray = _img(11, 16, 16)[:, :, 0].astype(np.int64)
    qt = _scaled_quant(_QLUMA, 98)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xFFDB, bytes([0]) + bytes(int(x) for x in qt.ravel()[_ZZ_ARR]))
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, b"\x00" + _DC_BITS + _DC_VALS)
    out += _seg(0xFFC4, b"\x10" + _AC_BITS + _AC_VALS)
    out += _seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")
    coefs = _dct_quant_blocks(gray, 16, 16, qt)
    bw = _BitWriter()
    pred = 0
    for by in range(2):
        for bx in range(2):
            pred = _encode_block(bw, coefs[by, bx].ravel()[_ZZ_ARR], pred, _DC_ENC, _AC_ENC)
    bw.flush()
    out += bw.buf + b"\xff\xd9"
    rgb = decode_jpeg(bytes(out))
    assert rgb.shape == (16, 16, 3)
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and np.array_equal(
        rgb[:, :, 1], rgb[:, :, 2]
    )
    assert psnr(np.repeat(gray[:, :, None], 3, axis=2).astype(np.uint8), rgb) >= 40.0


def test_jpeg_rejects_malformed():
    from crawler_spark.functions.imaging import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc2\x00\x05\x08\x00\x01")  # progressive SOF2


def test_psnr_known_value():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0, 0] = 255
    mse = 255.0**2 / (8 * 8 * 3)
    assert abs(psnr(a, b) - 10 * np.log10(255.0**2 / mse)) < 1e-9


def test_corrupt_jpeg_rows_fail_and_stubbed_rows_skip(monkeypatch):
    """Three distinct outcomes must stay distinguishable in decode_check_rows:
    a corrupt row FAILS (False flags), a stubbed-codec row is SKIPPED (NULL
    flags — a missing codec must never masquerade as a pass), and a good row
    passes.  JPEG is a real codec now, so the stub path is pinned with a
    synthetic format."""
    from crawler_spark.functions import imaging
    from crawler_spark.functions.imaging import decode_check_rows

    def _stub_decode(data):
        raise NotImplementedError("synthetic stub codec")

    monkeypatch.setitem(imaging._CODECS, "fake", (None, _stub_decode))
    arr = _img(1, 4, 4)
    out = decode_check_rows(
        ["a", "b", "c"],
        [b"\xff\xd8\x00bad", encode_image(arr, "ppm"), b"\x00"],
        ["jpeg", "ppm", "fake"],
        [4, 4, 4],
        [4, 4, 4],
        [0, phash64(arr), 0],
    )
    jrow = out[out["image_id"] == "a"].iloc[0]
    assert jrow["decode_ok"] is False  # corrupt jpeg = FAIL, not skip
    prow = out[out["image_id"] == "b"].iloc[0]
    assert bool(prow["decode_ok"]) and bool(prow["shape_ok"]) and bool(prow["phash_ok"])
    srow = out[out["image_id"] == "c"].iloc[0]
    assert srow["decode_ok"] is None and srow["shape_ok"] is None and srow["phash_ok"] is None


def test_jpeg_rows_clear_payload_invariants_end_to_end():
    """input_hint shape with fmt='jpeg': decode_ok, shape_ok, exact phash_ok
    (fixtures store the post-decode phash for lossy rows), and the re-encode
    roundtrip PSNR — the north rule's per-row lossy gate — all green."""
    from crawler_spark.fixtures import make_image
    from crawler_spark.functions.imaging import decode_check_rows

    ids, raws, fmts, ws, hs, phs = [], [], [], [], [], []
    for i in range(6):
        data, w, h, fmt, _cap, ph = make_image(i, px=[16, 24], fmts=["jpeg"])
        ids.append(f"img{i}")
        raws.append(data)
        fmts.append(fmt)
        ws.append(w)
        hs.append(h)
        phs.append(ph)
    out = decode_check_rows(ids, raws, fmts, ws, hs, phs)
    assert bool(out["decode_ok"].all()) and bool(out["shape_ok"].all())
    assert bool(out["phash_ok"].all())
    assert (out["psnr_db"] >= 40.0).all()


def test_sniff_image_meta_reads_every_container_header_only():
    """(fmt, w, h) from a prefix parse of real encoder output — all four
    containers, including JPEG variants whose SOF sits behind APP0/DQT/DHT
    segments and 4:2:0 / restart-interval streams."""
    import numpy as np

    from crawler_spark.functions.imaging import (
        encode_image,
        encode_jpeg,
        sniff_image_meta,
    )

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (13, 9, 3)).astype(np.uint8)
    for fmt in ("png", "ppm", "bmp"):
        assert sniff_image_meta(encode_image(arr, fmt)) == (fmt, 9, 13)
    assert sniff_image_meta(encode_jpeg(arr)) == ("jpeg", 9, 13)
    assert sniff_image_meta(encode_jpeg(arr, subsampling="420")) == ("jpeg", 9, 13)
    assert sniff_image_meta(encode_jpeg(arr, restart_interval=2)) == ("jpeg", 9, 13)
    # header-only: the parse must succeed on a prefix that cannot decode
    assert sniff_image_meta(encode_jpeg(arr)[:200]) == ("jpeg", 9, 13)


def test_sniff_image_meta_degrades_never_raises():
    import numpy as np

    from crawler_spark.functions.imaging import encode_image, sniff_image_meta

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    none = (None, None, None)
    assert sniff_image_meta(b"") == none
    assert sniff_image_meta(b"hello world, not an image at all") == none
    for fmt in ("png", "ppm", "bmp"):
        assert sniff_image_meta(encode_image(arr, fmt)[:6]) == none
    # P6 with an incomplete (unterminated) height token: not a full header
    assert sniff_image_meta(b"P6\n12 3") == none
    assert sniff_image_meta(b"P6\nab cd\n255\n") == none
    # JPEG SOI but scan starts before any SOF: malformed, degrade
    assert sniff_image_meta(b"\xff\xd8\xff\xda\x00\x04\x01\x00") == none
