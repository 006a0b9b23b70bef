"""Multimodal plumbing tests (SURVEY.md §2.7 image additions): schema, batch
shape, stub behavior, and poisoned-row survival of the mapInPandas feature
extractor — the Spark-side contract is real even where codecs are stubbed."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.imaging import decode_image, encode_image, phash64
from crawler_spark.functions.multimodal import (
    IMAGE_FEATURE_SCHEMA,
    audio_decode_stub,
    image_features_map_in_pandas,
    resize_block_mean,
    video_frame_sample_stub,
)


def _img_df(spark, rows):
    return spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")


def test_image_features_real_decode(spark):
    rng = np.random.default_rng(3)
    rows = []
    arrs = {}
    for i, fmt in enumerate(["png", "ppm", "bmp"]):
        arr = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        arrs[f"im{i}"] = arr
        rows.append((f"im{i}", bytearray(encode_image(arr, fmt)), fmt))
    out = {
        r.image_id: r
        for r in _img_df(spark, rows)
        .mapInPandas(image_features_map_in_pandas, IMAGE_FEATURE_SCHEMA)
        .collect()
    }
    assert len(out) == 3
    for iid, arr in arrs.items():
        r = out[iid]
        assert (r.w, r.h) == (32, 24)
        m = arr.reshape(-1, 3).mean(axis=0)
        assert abs(r.mean_r - m[0]) < 1e-6 and abs(r.mean_b - m[2]) < 1e-6
        assert r.phash == phash64(arr)
        thumb = np.frombuffer(bytes(r.thumb8), dtype=np.uint8).reshape(8, 8, 3)
        assert np.array_equal(thumb, resize_block_mean(arr, 8, 8))


def test_image_features_poisoned_rows_survive_and_jpeg_decodes(spark):
    """Corrupt bytes yield NULL-feature rows, not errors; a real JPEG row now
    decodes to full features (the codec is no longer stubbed)."""
    rng = np.random.default_rng(4)
    good = encode_image(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), "png")
    jarr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        ("ok", bytearray(good), "png"),
        ("bad", bytearray(b"\x00garbage"), "png"),
        ("jpg_trunc", bytearray(b"\xff\xd8\xff"), "jpeg"),  # corrupt (truncated)
        ("jpg_ok", bytearray(encode_image(jarr, "jpeg")), "jpeg"),
    ]
    out = {
        r.image_id: r
        for r in _img_df(spark, rows)
        .mapInPandas(image_features_map_in_pandas, IMAGE_FEATURE_SCHEMA)
        .collect()
    }
    assert len(out) == 4
    assert out["ok"].phash is not None
    assert out["bad"].phash is None and out["bad"].w is None
    assert out["jpg_trunc"].phash is None  # poisoned row: metadata-only
    assert out["jpg_ok"].phash is not None and (out["jpg_ok"].w, out["jpg_ok"].h) == (16, 16)


def test_resize_block_mean_identity_and_downsample():
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(resize_block_mean(arr, 4, 4), arr)
    half = resize_block_mean(arr, 2, 2)
    assert half.shape == (2, 2, 3)
    assert np.array_equal(half[0, 0], arr[:2, :2].reshape(-1, 3).mean(axis=0).astype(np.uint8))


def test_audio_video_stubs_raise_with_contract():
    """Perceptually-compressed codecs stay honestly stubbed."""
    with pytest.raises(NotImplementedError, match="sample_rate"):
        audio_decode_stub(b"\x00", "mp3")
    with pytest.raises(NotImplementedError, match="one-row-per-frame"):
        video_frame_sample_stub(b"\x00", "mp4")


def test_audio_wav_roundtrip_exact():
    """PCM WAV is a REAL codec path now (functions/audio.py): encode/decode
    round-trips bit-exactly for mono and stereo, and the multimodal
    audio_decode_stub routes fmt='wav' through it with the documented
    float32 [-1, 1] contract."""
    from crawler_spark.functions.audio import decode_wav, encode_wav

    rng = np.random.default_rng(6)
    for ch in (1, 2):
        samples = rng.integers(-32768, 32768, (137, ch)).astype(np.int16)
        decoded, sr = decode_wav(encode_wav(samples, sample_rate=22050))
        assert sr == 22050
        assert np.array_equal(decoded, samples)
    # stub routing: bytes -> float32 in [-1, 1]
    mono = rng.integers(-32768, 32768, 64).astype(np.int16)
    f = audio_decode_stub(encode_wav(mono), "wav")
    assert f.dtype == np.float32 and f.shape == (64, 1)
    assert np.abs(f).max() <= 1.0
    assert np.array_equal((f[:, 0] * 32768.0).astype(np.int16), mono)


def test_audio_wav_malformed_fails_loudly():
    from crawler_spark.functions.audio import decode_wav, encode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x00garbage")
    # non-PCM format code rejected
    good = bytearray(encode_wav(np.zeros(4, np.int16)))
    good[20] = 3  # fmt tag audio_format field -> IEEE float
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(good))


def test_video_y4m_roundtrip_and_sampling():
    """y4m is a REAL codec path now (functions/video.py): round-trip is
    bit-exact and sample_frames keeps the one-row-per-sampled-frame,
    (frame_idx, frame) contract the stub documented."""
    from crawler_spark.functions.video import decode_y4m, encode_y4m, sample_frames

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (7, 6, 9), dtype=np.uint8)
    blob = encode_y4m(frames, fps=30)
    decoded, fps = decode_y4m(blob)
    assert fps == 30
    assert np.array_equal(decoded, frames)
    sampled = sample_frames(blob, stride=3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for i, fr in sampled:
        assert np.array_equal(fr, frames[i])
    # stub routing for fmt='y4m'
    via_stub = video_frame_sample_stub(blob, "y4m", stride=3)
    assert len(via_stub) == 3 and np.array_equal(via_stub[1], frames[3])


def test_video_y4m_malformed_fails_loudly():
    from crawler_spark.functions.video import decode_y4m

    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"nope\n")
    with pytest.raises(ValueError, match="Cmono"):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\nFRAME\n\x00\x00\x00\x00")


def test_roundtrip_all_codecs_exact():
    """Lossless invariant backing the PSNR=inf claim in the payload check."""
    rng = np.random.default_rng(5)
    for fmt in ("png", "ppm", "bmp"):
        for shape in ((8, 8, 3), (17, 5, 3), (33, 48, 3)):
            arr = rng.integers(0, 256, shape, dtype=np.uint8)
            assert np.array_equal(decode_image(encode_image(arr, fmt), fmt), arr)


def test_audio_stub_mulaw_branch_real():
    import numpy as np

    from crawler_spark.functions.audio import encode_mulaw
    from crawler_spark.functions.multimodal import audio_decode_stub

    pcm = np.array([0, 1000, -1000, 32000, -32000], dtype=np.int64)
    out = audio_decode_stub(encode_mulaw(pcm), "ulaw")
    assert out.shape == (5, 1) and out.dtype == np.float32
    assert float(np.abs(out).max()) <= 1.0
    # companded roundtrip stays within the μ-law quantization bound
    assert np.abs(out[:, 0] * 32768.0 - np.clip(pcm, -32635, 32635)).max() <= 512


def test_video_stub_mjpeg_branch_real():
    import numpy as np

    from crawler_spark.functions.imaging import psnr
    from crawler_spark.functions.multimodal import video_frame_sample_stub
    from crawler_spark.functions.video import encode_mjpeg

    rng = np.random.RandomState(7)
    frames = []
    for _ in range(5):
        a = np.zeros((16, 16, 3), np.uint8)
        for by in range(2):
            for bx in range(2):
                a[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = rng.randint(0, 256, 3)
        frames.append(a)
    got = video_frame_sample_stub(encode_mjpeg(frames, quality=90), "mjpeg", stride=2)
    assert len(got) == 3  # frames 0, 2, 4
    for orig, dec in zip(frames[::2], got):
        assert dec.shape == (16, 16, 3)
        assert psnr(orig, dec) >= 40.0


def test_remaining_stubs_still_raise():
    import numpy as np
    import pytest as _pytest

    from crawler_spark.functions.multimodal import (
        audio_decode_stub,
        video_frame_sample_stub,
    )

    with _pytest.raises(NotImplementedError):
        audio_decode_stub(b"\x00" * 16, "mp3")
    with _pytest.raises(NotImplementedError):
        video_frame_sample_stub(b"\x00" * 16, "h264")
