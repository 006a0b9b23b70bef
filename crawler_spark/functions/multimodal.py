"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract for 100 TB multimodal pipelines:

* payloads are ``binary`` columns with typed metadata beside them
  (``w/h/fmt`` for images; ``sample_rate/channels`` for audio; ``fps/frames``
  for video)
* transforms run as ``mapInPandas`` over Arrow batches — schema in/out is
  explicit, partitioning carries (modality, fmt) so one batch decodes one
  codec
* decode is REAL for every input_hint image format — PNG/PPM/BMP and
  baseline JPEG (functions/imaging, written from ITU-T T.81) — plus PCM WAV
  and G.711 μ-law audio (functions/audio) and YUV4MPEG2-mono and MJPEG video
  (functions/video).  Only codecs that genuinely need a codec library —
  perceptual audio (mp3/aac) and inter-frame-predicted video (h264/vp9) —
  remain STUBBED behind NotImplementedError, with the full plumbing (schema,
  batch shape, partition discipline) in place and tested.

Feature extraction here is deliberately cheap + deterministic (mean
channel values, resize by block-mean, frame sampling by stride) — the
point is the distributed plumbing, not the vision model.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from crawler_spark.functions.imaging import decode_image, phash64

__all__ = [
    "IMAGE_FEATURE_SCHEMA",
    "image_features_map_in_pandas",
    "resize_block_mean",
    "audio_decode_stub",
    "video_frame_sample_stub",
]

IMAGE_FEATURE_SCHEMA = (
    "image_id string, fmt string, w int, h int, "
    "mean_r double, mean_g double, mean_b double, phash long, thumb8 binary"
)


def resize_block_mean(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic downsample by integer block mean (no interpolation lib)."""
    h, w, c = arr.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = arr[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean(axis=(0, 1))
    return out.astype(np.uint8)


def image_features_map_in_pandas(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
    """mapInPandas body: (image_id, bytes, fmt) → IMAGE_FEATURE_SCHEMA rows.

    Decode → channel means, 64-bit phash, 8×8 RGB thumbnail.  Corrupt rows
    (or any future stubbed codec) surface with NULL features instead of
    failing the batch — at scale a poisoned row must never kill a
    100-partition stage.
    """
    import pandas as pd

    for pdf in batches:
        rows = []
        for image_id, raw, fmt in zip(
            pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()
        ):
            rec = {
                "image_id": image_id,
                "fmt": fmt,
                "w": None,
                "h": None,
                "mean_r": None,
                "mean_g": None,
                "mean_b": None,
                "phash": None,
                "thumb8": None,
            }
            try:
                arr = decode_image(bytes(raw), fmt)
                m = arr.reshape(-1, 3).mean(axis=0)
                rec.update(
                    w=int(arr.shape[1]),
                    h=int(arr.shape[0]),
                    mean_r=float(m[0]),
                    mean_g=float(m[1]),
                    mean_b=float(m[2]),
                    phash=phash64(arr),
                    thumb8=resize_block_mean(arr, 8, 8).tobytes(),
                )
            except NotImplementedError:
                pass  # stubbed codec: metadata-only row
            except Exception:
                pass  # corrupt payload: NULL features, row survives
            rows.append(rec)
        yield pd.DataFrame(rows)


def audio_decode_stub(data: bytes, fmt: str) -> np.ndarray:
    """Audio decode: REAL for PCM WAV (functions/audio.py — RIFF needs no
    codec library) and G.711 μ-law (one-table telephony companding, written
    from the public ITU-T spec); perceptual codecs (mp3/aac) remain honestly
    stubbed.

    Contract: bytes → float32 (n_samples, channels) in [-1, 1].
    """
    if fmt == "wav":
        from crawler_spark.functions.audio import decode_wav

        samples, _sr = decode_wav(data)
        return samples.astype(np.float32) / 32768.0
    if fmt in ("ulaw", "mulaw"):
        from crawler_spark.functions.audio import decode_mulaw

        return decode_mulaw(data)[:, None].astype(np.float32) / 32768.0
    raise NotImplementedError(
        f"audio decode ({fmt}) requires a codec library not present here; "
        "plumbing contract: binary column + (sample_rate, channels) metadata "
        "→ mapInPandas batches of float32 sample arrays"
    )


def video_frame_sample_stub(data: bytes, fmt: str, stride: int = 30) -> list[np.ndarray]:
    """Video frame sampling: REAL for YUV4MPEG2 mono (raw planar frames) and
    MJPEG (concatenated baseline JPEGs riding the from-spec T.81 codec —
    functions/video.split_mjpeg walks the marker structure so only sampled
    frames pay a decode); inter-frame-predicted codecs (h264/vp9) remain
    honestly stubbed.  One output row per sampled frame, keyed
    (video_id, frame_idx)."""
    if fmt == "y4m":
        from crawler_spark.functions.video import sample_frames

        return [frame for _idx, frame in sample_frames(data, stride)]
    if fmt == "mjpeg":
        from crawler_spark.functions.video import sample_frames_mjpeg

        return [frame for _idx, frame in sample_frames_mjpeg(data, stride)]
    raise NotImplementedError(
        f"video decode ({fmt}) requires a codec library not present here; "
        "enabled implementations must keep the one-row-per-frame contract"
    )
