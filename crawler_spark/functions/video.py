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


# --------------------------------------------------------------------------
# MJPEG (bare JPEG-stream container): concatenated baseline JFIF frames.
# The oldest video-over-HTTP format (IP cameras, multipart/x-mixed-replace
# streams) and the simplest compressed container — each frame is a complete
# T.81 baseline JPEG, so the existing from-spec codec (functions/imaging)
# does all pixel work and this layer only needs a spec-correct frame
# splitter.  Splitting walks the marker structure (ISO/IEC 10918-1 §B):
# length-delimited segments are skipped by their length field (so an APPn/
# COM payload containing FF D9 can never truncate a frame), entropy-coded
# data after SOS is scanned honoring byte stuffing (FF 00) and restart
# markers (FF D0-D7), and the first structural marker ending the scan must
# be EOI for baseline single-scan frames.
# --------------------------------------------------------------------------

_SOI, _EOI, _SOS = 0xD8, 0xD9, 0xDA


def encode_mjpeg(frames: "list[np.ndarray] | np.ndarray", quality: int = 90) -> bytes:
    """[(h, w, 3) uint8 RGB, ...] → concatenated baseline-JPEG stream."""
    from crawler_spark.functions.imaging import encode_jpeg

    return b"".join(encode_jpeg(np.asarray(f), quality=quality) for f in frames)


def _jpeg_frame_end(data: bytes, pos: int) -> int:
    """Index one past the EOI of the JPEG frame starting at ``pos`` (SOI)."""
    if data[pos : pos + 2] != b"\xff\xd8":
        raise ValueError("frame does not start with SOI")
    p = pos + 2
    n = len(data)
    while p + 1 < n:
        if data[p] != 0xFF:
            raise ValueError(f"expected marker at {p}")
        m = data[p + 1]
        if m == _EOI:
            return p + 2
        if m == _SOI:
            raise ValueError("nested SOI before EOI")
        if 0xD0 <= m <= 0xD7 or m in (0x01, 0xFF):  # RSTn / TEM / fill
            p += 2
            continue
        seg_len = int.from_bytes(data[p + 2 : p + 4], "big")
        p += 2 + seg_len
        if m == _SOS:
            # entropy-coded data: skip stuffed FF00 + restart markers until
            # the next structural marker (EOI for baseline single-scan)
            while True:
                q = data.find(b"\xff", p)
                if q < 0 or q + 1 >= n:
                    raise ValueError("unterminated entropy-coded segment")
                nxt = data[q + 1]
                if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                    p = q + 2
                    continue
                p = q
                break
    raise ValueError("unterminated JPEG frame (no EOI)")


def split_mjpeg(data: bytes) -> list[bytes]:
    """MJPEG stream → per-frame JPEG byte strings (no pixel work)."""
    out = []
    pos = 0
    while pos < len(data):
        end = _jpeg_frame_end(data, pos)
        out.append(data[pos:end])
        pos = end
    return out


@_loud
def decode_mjpeg(data: bytes) -> "list[np.ndarray]":
    """MJPEG bytes → [(h, w, 3) uint8 RGB per frame] via the from-spec
    baseline JPEG decoder."""
    from crawler_spark.functions.imaging import decode_jpeg

    return [decode_jpeg(f) for f in split_mjpeg(data)]


@_loud
def sample_frames_mjpeg(data: bytes, stride: int = 30) -> "list[tuple[int, np.ndarray]]":
    """Frame splitting is container-level, so only every ``stride``-th frame
    pays a JPEG decode — the point of frame-sampling a 100 TB video corpus."""
    from crawler_spark.functions.imaging import decode_jpeg

    parts = split_mjpeg(data)
    return [(i, decode_jpeg(parts[i])) for i in range(0, len(parts), stride)]
