"""Multimodal payload operators: image resize, video frame-sampling,
audio feature extraction — opaque ``binary`` columns with typed metadata,
processed in Arrow batches via ``mapInPandas``.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; payload decode for container formats whose
codec libraries are NOT in this sandbox (JPEG via PIL, video via ffmpeg,
audio via soundfile) is STUBBED behind ``NotImplementedError`` with an
import-try, exactly as the build contract specifies — swap the stub for
the real decoder on a cluster image that ships the library.  The raw/png
paths are fully real (functions/png.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from gotrackmaster_spark.operators.images import decode_image

try:  # pragma: no cover - not present in this sandbox
    from PIL import Image as _PIL_Image  # noqa: N813
except ImportError:
    _PIL_Image = None


def decode_any(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode raw/png/qnt4 natively; JPEG and friends require PIL —
    stubbed when absent."""
    if fmt in ("raw", "png", "qnt4"):
        return decode_image(data, w, h, fmt)
    if fmt in ("jpeg", "jpg", "webp"):
        if _PIL_Image is None:
            raise NotImplementedError(
                f"fmt {fmt!r} needs PIL, which is not in this sandbox; "
                "the Spark plumbing is real — install pillow to enable"
            )
        import io

        return np.asarray(_PIL_Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(f"unknown payload format {fmt!r}")


def resize_block_mean(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic resize: block-mean when the factor divides evenly,
    nearest-neighbour otherwise (no interpolation libs needed)."""
    h, w, c = px.shape
    if h % out_h == 0 and w % out_w == 0:
        return (
            px.reshape(out_h, h // out_h, out_w, w // out_w, c)
            .mean(axis=(1, 3))
            .astype(np.uint8)
        )
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[yi[:, None], xi[None, :], :]


def resize_images(images: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Batch resize: (image_id, fmt, small_bytes raw out_w×out_h×3)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                px = decode_any(r.bytes, r.w, r.h, r.fmt)
                small = resize_block_mean(px, out_w, out_h)
                out.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "w": out_w,
                        "h": out_h,
                        "bytes": small.tobytes(),
                    }
                )
            yield pd.DataFrame(out)

    return images.mapInPandas(
        fn, "image_id string, fmt string, w int, h int, bytes binary"
    )


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plumbing for video payloads.

    No video codec ships in the sandbox, so frames come from a
    DETERMINISTIC FAKE decoder: frame k of a payload is the payload bytes
    viewed as a repeating uint8 stream offset by k (stable across runs,
    shaped like real output: one row per sampled frame with frame_idx and
    a raw RGB thumbnail).  Swap ``_fake_decode_frame`` for an ffmpeg/ PyAV
    call on a real image."""

    fw, fh = 16, 12

    def _fake_decode_frame(data: bytes, k: int) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8)
        need = fw * fh * 3
        reps = int(np.ceil((need + k) / max(len(buf), 1)))
        return np.tile(buf, max(reps, 1))[k : k + need].reshape(fh, fw, 3)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                n_frames = int(r.n_frames)
                for k in range(0, n_frames, every_n):
                    frame = _fake_decode_frame(r.bytes, k)
                    out.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": k,
                            "w": fw,
                            "h": fh,
                            "frame": frame.tobytes(),
                        }
                    )
            yield pd.DataFrame(out)

    return videos.mapInPandas(
        fn, "video_id string, frame_idx int, w int, h int, frame binary"
    )


def audio_features(audio: DataFrame, frame: int = 256) -> DataFrame:
    """Audio feature extraction plumbing: payload = int16 PCM mono bytes
    (raw PCM needs no codec — this path is REAL); per-window RMS + zero
    crossing rate.  Container formats (mp3/ogg) would gate on a codec lib
    exactly like decode_any."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                pcm = np.frombuffer(r.bytes, dtype=np.int16).astype(np.float64)
                n = len(pcm) // frame
                if n == 0:
                    continue
                x = pcm[: n * frame].reshape(n, frame)
                rms = np.sqrt((x * x).mean(axis=1))
                zcr = (np.diff(np.signbit(x), axis=1) != 0).sum(axis=1) / (frame - 1)
                for i in range(n):
                    out.append(
                        {
                            "audio_id": r.audio_id,
                            "win": i,
                            "rms": float(rms[i]),
                            "zcr": float(zcr[i]),
                        }
                    )
            yield pd.DataFrame(out)

    return audio.mapInPandas(fn, "audio_id string, win int, rms double, zcr double")
