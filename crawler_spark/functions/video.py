"""Minimal REAL video codec: YUV4MPEG2 (y4m), mono (Cmono) plane.

Closes the multimodal video stub (functions/multimodal.video_frame_sample
_stub) for the one video container that needs no codec library — y4m is
raw planar frames behind an ASCII parameter header (the format mjpegtools/
ffmpeg use for uncompressed interchange).  Mono keeps one byte per pixel;
the frame-sampling contract (one output row per sampled frame, keyed
(video_id, frame_idx)) is exactly what the stub documented.  Compressed
video (h264/vp9/av1) remains honestly stubbed.
"""

from __future__ import annotations

import numpy as np

from crawler_spark.functions.imaging import _loud

__all__ = ["encode_y4m", "decode_y4m", "sample_frames"]

_MAGIC = b"YUV4MPEG2"


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 mono → y4m bytes."""
    n, h, w = frames.shape
    assert frames.dtype == np.uint8
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode("ascii")
    out = [head]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


@_loud
def decode_y4m(data: bytes) -> tuple[np.ndarray, int]:
    """y4m bytes → ((n_frames, h, w) uint8 mono, fps)."""
    nl = data.index(b"\n")
    header = data[:nl].split(b" ")
    if header[0] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    colorspace = b"C420jpeg"  # spec default when C is absent
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C":
            colorspace = tok
    if colorspace != b"Cmono":
        raise ValueError(f"only Cmono supported, got {colorspace!r}")
    if not (w and h):
        raise ValueError("missing W/H parameters")
    frame_bytes = w * h
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=pos).reshape(h, w)
        )
        pos += frame_bytes
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), fps or 25


@_loud
def sample_frames(data: bytes, stride: int = 30) -> list[tuple[int, np.ndarray]]:
    """Decode + stride-sample: [(frame_idx, (h, w) uint8), ...] — the
    one-row-per-sampled-frame contract the video stub documented."""
    frames, _fps = decode_y4m(data)
    return [(i, frames[i]) for i in range(0, len(frames), stride)]
