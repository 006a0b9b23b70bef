"""Minimal REAL audio codec: PCM WAV (RIFF/WAVE, 16-bit little-endian).

Closes the multimodal audio stub (functions/multimodal.audio_decode_stub)
for the one audio format that needs no codec library — uncompressed PCM in
a RIFF container, written here straight from the public WAVE spec (the same
byte layout `wave` in the stdlib produces; implemented directly so the
chunk walk mirrors imaging.decode_png and malformed payloads fail loudly).
Perceptually-compressed formats (mp3/aac/flac) remain honestly stubbed —
they need real codec libraries.

Contract (mirrors imaging.py): encode (n_samples, channels) int16 →
bytes; decode bytes → (samples int16 (n, ch), sample_rate).  Lossless by
construction, so the crawl's PSNR/equality payload gates apply unchanged.
"""

from __future__ import annotations

import struct

import numpy as np

from crawler_spark.functions.imaging import _loud

__all__ = ["encode_wav", "decode_wav", "encode_mulaw", "decode_mulaw"]


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n, ch) int16 → RIFF/WAVE PCM bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    assert samples.dtype == np.int16
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_loud
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ((n, ch) int16, sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    channels = sample_rate = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1:
                raise ValueError(f"only PCM supported, got format {audio_fmt}")
        elif tag == b"data":
            pcm = payload
    if pcm is None or channels is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported, got {bits}")
    samples = np.frombuffer(pcm, dtype="<i2")
    return samples.reshape(-1, channels), sample_rate


# --------------------------------------------------------------------------
# G.711 μ-law: the second REAL audio codec (ITU-T G.711, one table from the
# public spec — no codec library needed).  Telephony/VoIP byte-per-sample
# companding: 14-bit magnitude → biased segment/mantissa → complemented
# byte.  Both directions are pure integer arithmetic, so the DECODE side has
# an exact ANSI-SQL twin (queries.py q81) — unlike WAV this codec is lossy,
# but its loss is a closed-form integer quantization, not a transform.
# Encode here follows the canonical CCITT reference arithmetic (BIAS=0x84,
# CLIP=32635); decode is its exact inverse on the 256-byte code space.
# --------------------------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def encode_mulaw(samples: np.ndarray) -> bytes:
    """int16 PCM → one μ-law byte per sample (vectorized table-free form)."""
    x = np.asarray(samples, dtype=np.int64).ravel()
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    # segment = position of the highest set bit above bit 7 (0..7)
    seg = np.maximum(np.int64(np.log2(mag)) - 7, 0)
    # guard against float log2 edge error at exact powers of two
    seg = np.where(mag >> (seg + 8) > 0, seg + 1, seg)
    seg = np.where(mag >> (seg + 7) == 0, seg - 1, seg)
    mant = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | mant) & 0xFF).astype(np.uint8).tobytes()


@_loud
def decode_mulaw(data: bytes) -> np.ndarray:
    """μ-law bytes → int16 PCM (the exact G.711 expansion)."""
    u = ~np.frombuffer(data, dtype=np.uint8).astype(np.int64) & 0xFF
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + _ULAW_BIAS) << seg) - _ULAW_BIAS
    return np.where(u & 0x80, -mag, mag).astype(np.int16)
