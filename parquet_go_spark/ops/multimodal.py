"""Multimodal column handling: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched UDFs.

The Spark-side plumbing — schemas, batch shapes, partition sizing, UDF
signatures — is real and tested. Decode is REAL for the container
formats pure numpy can parse — WAV (RIFF PCM 8/16-bit + float32), BMP
(24/32-bit uncompressed) and PPM/PGM binary — sniffed by magic bytes
(``decode_wav`` / ``decode_bmp`` / ``decode_ppm``). Compressed codecs
(JPEG, MP3, H.264) need libraries the sandbox lacks, so unknown payloads
fall back to a clearly-marked deterministic fake whose output shape
matches a real decoder's; swapping in Pillow/torchaudio/PyAV is a
one-function change per modality.

Scale notes: payloads dominate row size, so jobs repartition by byte
budget (``repartition_by_bytes``) rather than row count before the UDF;
feature outputs are fixed-size float arrays, ~100-1000x smaller than the
inputs, so downstream stages shuffle features, never payloads.
"""

from __future__ import annotations

import struct
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
    "decode_wav",
    "decode_bmp",
    "decode_ppm",
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
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real RIFF/WAVE decode, pure numpy: walk the chunk list, parse the
    ``fmt `` chunk, and convert the ``data`` chunk's PCM to mono float32
    in [-1, 1] (multi-channel mixes by mean). Supports integer PCM
    (format 1) at 8/16/32 bits and IEEE float32 (format 3).
    -> (samples float32, sample_rate)."""
    mv = memoryview(payload)
    if len(mv) < 12 or bytes(mv[0:4]) != b"RIFF" or bytes(mv[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(mv):
        cid = bytes(mv[pos : pos + 4])
        size = int.from_bytes(mv[pos + 4 : pos + 8], "little")
        body = mv[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = bytes(body)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAVE missing fmt/data chunk")
    audio_format, n_ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if audio_format == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAVE format {audio_format}/{bits}-bit")
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1).astype(np.float32)
    return x, int(rate)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Real BMP decode, pure numpy: BITMAPFILEHEADER + BITMAPINFOHEADER,
    uncompressed 24/32-bit, bottom-up or top-down rows, 4-byte row
    alignment, BGR(A) -> RGB. -> (height, width, 3) uint8."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, comp = struct.unpack_from("<HI", payload, 28)
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up, h = h > 0, abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    raw = np.frombuffer(payload, np.uint8, stride * h, data_off).reshape(h, stride)
    px = raw[:, : w * nb].reshape(h, w, nb)
    if bottom_up:
        px = px[::-1]
    return np.ascontiguousarray(px[..., 2::-1])  # BGR(A) -> RGB


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real binary-PPM/PGM decode, pure numpy: P6 -> (h, w, 3), P5 ->
    (h, w, 1); whitespace/#-comment header, maxval <= 255."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    nums: list[int] = []
    pos = 2
    while len(nums) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM/PGM header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end-of-line
            pos = payload.index(b"\n", pos) + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            nums.append(int(payload[pos:end]))
            pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = nums
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    ch = 3 if payload[:2] == b"P6" else 1
    return np.frombuffer(payload, np.uint8, h * w * ch, pos).reshape(h, w, ch)


def _to_channels(img: np.ndarray, channels: int) -> np.ndarray:
    """Normalize a decoded (h, w, c) array to the metadata-declared
    channel count so feature vectors stay ONE size across a table that
    mixes containers (P5 gray, P6/BMP color): gray replicates into the
    COLOR channels only, extra channels slice off, single-channel takes
    the uint8 channel mean, missing alpha pads opaque 255 (gray -> RGBA
    must not put luminance in alpha). A falsy/invalid declared count
    trusts the container."""
    c = img.shape[-1]
    if not channels or channels < 1 or c == channels:
        return img
    if c == 1 and channels > 1:
        img = np.repeat(img, min(channels, 3), axis=-1)
        c = img.shape[-1]
        if c == channels:
            return img
    if channels == 1:
        return img.mean(axis=-1, dtype=np.float64).astype(np.uint8)[..., None]
    if c > channels:
        return np.ascontiguousarray(img[..., :channels])
    pad = np.full((*img.shape[:-1], channels - c), 255, np.uint8)
    return np.concatenate([img, pad], axis=-1)


def _codec_image_decode(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Decode an image payload to (height, width, channels) uint8 — the
    channel count ALWAYS honors the declared metadata (container shapes
    are channel-normalized via ``_to_channels``), so one media table
    yields one feature dimension; spatial dims come from the container
    on real decodes and from the metadata on the fake.

    REAL for BMP and binary PPM/PGM (sniffed by magic bytes, pure
    numpy); compressed codecs fall back to Pillow when importable, else
    to the deterministic fake: tile the payload bytes into the
    metadata-declared shape — same dtype, shape, and value range a real
    decoder produces.

    Metadata is DATA and may be wrong: NULL or non-positive declared
    dims coerce to safe defaults (channels -> 3, the RGB convention;
    width/height -> 32) instead of a TypeError killing the task — and
    the coercion happens before BOTH the real and fake paths, so a
    NULL-channels table still yields one feature dimension. Declared
    dims are also CAPPED (8192x8192x64): the fake path allocates from
    metadata alone, so one forged row must not OOM the task — the same
    forged-header discipline as the core decode governor."""
    channels = min(int(channels), 64) if channels and channels >= 1 else 3
    width = min(int(width), 8192) if width and width >= 1 else 32
    height = min(int(height), 8192) if height and height >= 1 else 32
    if payload is None:  # NULL content: the fake path serves zeros
        payload = b""
    head = payload[:2]
    if head in (b"BM", b"P6", b"P5"):
        # Sniff-then-verify: arbitrary bytes (e.g. text docs in mixed
        # tables) can START with a magic pair without being a container;
        # a parse failure falls through to the fake instead of killing
        # the whole job over one payload.
        try:
            img = decode_bmp(payload) if head == b"BM" else decode_ppm(payload)
            return _to_channels(img, channels)
        except Exception:
            pass
    try:  # pragma: no cover - real path when Pillow exists
        import io

        from PIL import Image  # noqa

        return _to_channels(
            np.asarray(Image.open(io.BytesIO(payload)).convert("RGB")), channels
        )
    except Exception:
        n = height * width * channels
        raw = np.frombuffer(payload, dtype=np.uint8)
        if not len(raw):  # zero-byte payload: tile() stays empty, reshape dies
            raw = np.zeros(1, np.uint8)
        reps = n // len(raw) + 1
        return np.tile(raw, reps)[:n].reshape(height, width, channels)


def _codec_audio_decode(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """Decode audio to float32 PCM in [-1, 1]. REAL for RIFF/WAVE PCM
    (pure numpy, sniffed by magic); other codecs take the deterministic
    fake with the same contract.

    NULL/invalid metadata coerces (sample_rate -> 8000, duration_ms ->
    1000) and the fake sample count is capped at 10^8 (~400 MB float32)
    — the image path's forged-metadata discipline, previously missing
    here: one NULL sample_rate row was a TypeError that killed the
    whole job, and a forged duration was an unbounded allocation."""
    if payload is None:
        payload = b""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return decode_wav(payload)[0]
        except Exception:
            pass  # magic-byte false positive / truncated chunk list

    sample_rate = int(sample_rate) if sample_rate and sample_rate > 0 else 8000
    duration_ms = int(duration_ms) if duration_ms and duration_ms > 0 else 1000
    n = min(max(1, sample_rate * duration_ms // 1000), 100_000_000)
    raw = np.frombuffer(payload, dtype=np.uint8)
    reps = n // max(len(raw), 1) + 1
    return (np.tile(raw, reps)[:n].astype(np.float32) - 127.5) / 127.5


def _codec_video_keyframes(payload: bytes, duration_ms: int, every_ms: int) -> list[bytes]:
    """Extract frame payloads every ``every_ms``. STUB: deterministic
    byte-slices standing in for encoded frames. NULL/invalid metadata
    coerces (duration_ms -> 1000) and the frame count is capped at
    100k — same forged-metadata discipline as the other modalities."""
    if payload is None:
        payload = b""
    duration_ms = int(duration_ms) if duration_ms and duration_ms > 0 else 1000
    k = min(max(1, duration_ms // max(every_ms, 1)), 100_000)
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
                m = m or {}  # a NULL meta struct arrives as None
                img = _codec_image_decode(
                    payload, m.get("width"), m.get("height"), m.get("channels")
                )
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
                m = m or {}
                pcm = _codec_audio_decode(payload, m.get("sample_rate"), m.get("duration_ms"))
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
                for i, fr in enumerate(
                    _codec_video_keyframes(payload, (m or {}).get("duration_ms"), every_ms)
                ):
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
