"""Real pure-numpy media decode (WAV / BMP / PPM-PGM): fixtures are
written by INDEPENDENT struct-level writers in this file, decoded by
ops/multimodal, and compared sample-for-sample — then fed end-to-end
through the Spark featurizers so the driver-graded plumbing consumes
real container bytes, not synthetic fakes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from parquet_go_spark.ops.multimodal import (
    audio_features,
    decode_bmp,
    decode_ppm,
    decode_wav,
    image_features,
)

pytestmark = pytest.mark.spark


# ------------------------------------------------------------- writers
def write_wav(samples: np.ndarray, rate: int, bits: int = 16, channels: int = 1) -> bytes:
    if bits == 16:
        pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
        fmt_code = 1
    elif bits == 8:
        pcm = (np.clip(samples, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
        fmt_code = 1
    else:  # float32
        pcm = samples.astype("<f4").tobytes()
        fmt_code = 3
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


def write_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    if not top_down:
        rows = rows[::-1]
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    head = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 14 + 40)
    return head + info + data


def write_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + b"\n# fixture\n" + f"{w} {h}\n255\n".encode() + img.tobytes()


# -------------------------------------------------------------- decode
def test_wav_roundtrip_16bit_mono():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    got, rate = decode_wav(write_wav(x, 8000))
    assert rate == 8000 and got.dtype == np.float32 and len(got) == 8000
    # write scales by 32767, decode divides by 32768: up to 1.5 LSB off
    assert np.max(np.abs(got - np.clip(x, -1, 1))) <= 2 / 32768


def test_wav_float32_exact_and_8bit():
    x = np.linspace(-1, 1, 441, dtype=np.float32)
    got, rate = decode_wav(write_wav(x, 44100, bits=32))
    assert rate == 44100 and np.array_equal(got, x)  # float PCM is exact
    got8, _ = decode_wav(write_wav(x, 44100, bits=8))
    assert np.max(np.abs(got8 - x)) <= 2 / 128


def test_wav_stereo_mixes_to_mono():
    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.5, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2], inter[1::2] = left, right
    got, _ = decode_wav(write_wav(inter, 16000, bits=32, channels=2))
    assert len(got) == 100 and np.allclose(got, 0.0)


def test_wav_rejects_non_riff():
    with pytest.raises(ValueError):
        decode_wav(b"\x00" * 64)


def test_bmp_roundtrip_both_orientations():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 10, 3), dtype=np.uint8)  # odd width: padding path
    assert np.array_equal(decode_bmp(write_bmp(img)), img)
    assert np.array_equal(decode_bmp(write_bmp(img, top_down=True)), img)


def test_ppm_and_pgm_roundtrip():
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(write_ppm(rgb)), rgb)
    gray = rng.integers(0, 256, (4, 7, 1), dtype=np.uint8)
    assert np.array_equal(decode_ppm(write_ppm(gray)), gray)


def test_magic_byte_false_positives_fall_back_to_fake():
    """Payloads that merely START with container magic (text docs in a
    mixed table, truncated files) must take the deterministic fake, not
    crash the job or hang the header parser."""
    from parquet_go_spark.ops.multimodal import (
        _codec_audio_decode,
        _codec_image_decode,
    )

    for payload in (b"BMW is a carmaker, not a bitmap header", b"BM\x01"):
        img = _codec_image_decode(payload, 4, 3, 3)
        assert img.shape == (3, 4, 3) and img.dtype == np.uint8
    for payload in (b"P6 polynomial time", b"P6\n# only comments", b"P5"):
        img = _codec_image_decode(payload, 2, 2, 3)
        assert img.shape == (2, 2, 3)
    x = _codec_audio_decode(b"RIFF1234WAVEgarbage-no-chunks", 8000, 10)
    assert x.dtype == np.float32 and len(x) == 80


# --------------------------------------------- end-to-end featurizers
def test_image_features_consume_real_bmp_and_ppm(spark):
    rng = np.random.default_rng(21)
    imgs = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(4)]
    payloads = [write_bmp(imgs[0]), write_ppm(imgs[1]), write_bmp(imgs[2], top_down=True), write_ppm(imgs[3])]
    rows = [
        (i, "image", p, {"width": 32, "height": 24, "channels": 3, "sample_rate": 0, "duration_ms": 0, "codec": "bmp"})
        for i, p in enumerate(payloads)
    ]
    from parquet_go_spark.ops.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: np.array(r["feature"]) for r in image_features(df, bins=16).collect()}
    for i, img in enumerate(imgs):
        hist = np.concatenate(
            [np.histogram(img[..., c], bins=16, range=(0, 256))[0] for c in range(3)]
        ).astype(np.float64)
        want = (hist / hist.sum()).astype(np.float32)
        assert np.array_equal(got[i], want), i  # decode was REAL, not the fake


def test_audio_features_consume_real_wav(spark):
    rng = np.random.default_rng(23)
    pcm = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    rows = [
        (0, "audio", write_wav(pcm, 8000, bits=32),
         {"width": 0, "height": 0, "channels": 1, "sample_rate": 8000, "duration_ms": 500, "codec": "wav"})
    ]
    from parquet_go_spark.ops.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = np.array(audio_features(df, n_windows=8, stat="peak").collect()[0]["feature"])
    want = np.abs(pcm[: 4000 // 8 * 8].reshape(8, -1)).max(axis=1).astype(np.float32)
    assert np.array_equal(got, want)  # float32 PCM round-trips exactly
