"""Multimodal plumbing: resize/frame-sample/audio-features schemas, batch
shapes, and deterministic values; codec stubs raise cleanly."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


def test_resize_images_real_payloads(spark):
    from gotrackmaster_spark.operators.images import synthesize_images
    from gotrackmaster_spark.operators.multimodal import resize_images

    imgs = synthesize_images(spark, SF_DIR, w=32, h=24).limit(60)
    small = resize_images(imgs, out_w=8, out_h=8).collect()
    assert len(small) == 60
    for r in small:
        assert (r.w, r.h) == (8, 8)
        assert len(r.bytes) == 8 * 8 * 3


def test_resize_block_mean_exact():
    from gotrackmaster_spark.operators.multimodal import resize_block_mean

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = resize_block_mean(px, 2, 2)
    assert out.shape == (2, 2, 3)
    assert out[0, 0, 0] == px[0:2, 0:2, 0].mean().astype(np.uint8)


def test_jpeg_stub_raises_cleanly():
    from gotrackmaster_spark.operators.multimodal import decode_any

    with pytest.raises(NotImplementedError, match="PIL"):
        decode_any(b"\xff\xd8\xff", 4, 4, "jpeg")


def test_video_frame_sampling_plumbing(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.multimodal import sample_video_frames

    vids = spark.range(5).select(
        F.concat(F.lit("vid"), F.col("id")).alias("video_id"),
        F.lit(bytes(range(256)) * 8).alias("bytes"),
        F.lit(30).alias("n_frames"),
    )
    frames = sample_video_frames(vids, every_n=10).collect()
    assert len(frames) == 5 * 3  # frames 0, 10, 20
    assert all(len(r.frame) == 16 * 12 * 3 for r in frames)
    # deterministic: same input → same frame bytes
    again = sample_video_frames(vids, every_n=10).collect()
    assert sorted((r.video_id, r.frame_idx, r.frame) for r in again) == sorted(
        (r.video_id, r.frame_idx, r.frame) for r in frames
    )


def test_audio_features_real_pcm(spark):
    from pyspark.sql import functions as F

    from gotrackmaster_spark.operators.multimodal import audio_features

    t = np.arange(2048)
    pcm = (np.sin(t / 10.0) * 10000).astype(np.int16).tobytes()
    audio = spark.range(3).select(
        F.concat(F.lit("a"), F.col("id")).alias("audio_id"),
        F.lit(pcm).alias("bytes"),
    )
    feats = audio_features(audio, frame=256).collect()
    assert len(feats) == 3 * 8
    assert all(6000 < r.rms < 8500 for r in feats)  # sine RMS ≈ amp/√2
    assert all(0.0 < r.zcr < 0.1 for r in feats)
