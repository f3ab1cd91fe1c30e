"""Multimodal plumbing tests: schemas, batch shapes, deterministic stub
codecs, byte-budget partitioning. The codec internals are stubs; the
Spark-side dataflow is the thing under test."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.multimodal import (
    audio_features,
    image_features,
    repartition_by_bytes,
    synth_media_df,
    video_frame_sample,
)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def media(spark):
    df = synth_media_df(spark, 90)
    df.cache().count()
    return df


def test_image_features_shape(media, spark):
    out = image_features(media, bins=16).collect()
    assert len(out) == media.filter(F.col("kind") == "image").count()
    for r in out:
        v = np.array(r["feature"])
        assert v.shape == (48,)  # 3 channels x 16 bins
        assert abs(v.sum() - 1.0) < 1e-3  # normalized histogram


def test_image_features_deterministic(media, spark):
    a = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media).collect())
    b = sorted((r["media_id"], tuple(r["feature"])) for r in image_features(media).collect())
    assert a == b


def test_audio_features_shape(media):
    out = audio_features(media, n_windows=32).collect()
    assert len(out) == 30
    assert all(len(r["feature"]) == 32 for r in out)
    assert all(all(0.0 <= x <= 1.0 for x in r["feature"]) for r in out)


def test_audio_features_peak_stat(media):
    """stat="peak" shares the decode/window plumbing but reduces by max:
    every peak bounds its window's RMS from above, and an unknown stat
    is rejected up front."""
    peaks = {r["media_id"]: r["feature"] for r in audio_features(media, stat="peak").collect()}
    rms = {r["media_id"]: r["feature"] for r in audio_features(media).collect()}
    assert set(peaks) == set(rms) and len(peaks) == 30
    for mid, pv in peaks.items():
        assert len(pv) == 32
        assert all(p >= r - 1e-6 for p, r in zip(pv, rms[mid]))
    with pytest.raises(ValueError, match="stat"):
        audio_features(media, stat="median")


def test_video_frame_sample(media):
    out = video_frame_sample(media, every_ms=500)
    rows = out.collect()
    assert out.columns == ["media_id", "frame_idx", "frame"]
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r)
        assert isinstance(r["frame"], (bytes, bytearray))
    # frame counts follow duration/every_ms from metadata
    meta = {r["media_id"]: r["meta"]["duration_ms"] for r in media.filter("kind='video'").collect()}
    for mid, frames in per.items():
        assert len(frames) == max(1, meta[mid] // 500)


def test_repartition_by_bytes(media, spark):
    df = repartition_by_bytes(media, "content", target_bytes=8 << 10)
    assert df.rdd.getNumPartitions() > media.rdd.getNumPartitions()
    assert df.count() == media.count()
