"""Randomized differential fuzz for the pure-numpy media decoders:
synthesize valid WAV/BMP/PPM containers in plain Python with KNOWN
sample/pixel data, decode with the library, and compare exactly —
plus truncation sweeps asserting every prefix either raises a clean
ValueError/struct.error or returns without crashing the process (the
featurizer wraps decode in a fallback, so "no segfault/unbounded
alloc" is the contract for garbage).
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from parquet_go_spark.ops.multimodal import decode_bmp, decode_ppm, decode_wav


def _wav_bytes(rate, samples_by_ch, bits, fmt):
    """Build a RIFF/WAVE file: samples_by_ch is (n, ch) int/float."""
    n, ch = samples_by_ch.shape
    if fmt == 3:
        data = samples_by_ch.astype("<f4").tobytes()
    elif bits == 16:
        data = samples_by_ch.astype("<i2").tobytes()
    elif bits == 32:
        data = samples_by_ch.astype("<i4").tobytes()
    else:
        data = (samples_by_ch + 128).astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt_chunk = struct.pack("<HHIIHH", fmt, ch, rate, rate * block, block, bits)
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    # insert a junk chunk to exercise the chunk walk (odd size -> padding)
    junk = b"\x99" * 7
    body += b"JUNK" + struct.pack("<I", len(junk)) + junk + b"\x00"
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("seed", range(12))
def test_wav_differential(seed):
    rng = random.Random(seed)
    npr = np.random.default_rng(seed)
    ch = rng.choice([1, 2, 3])
    n = rng.choice([0, 1, 7, 256, 1000])
    rate = rng.choice([8000, 16000, 44100])
    fmt, bits = rng.choice([(1, 8), (1, 16), (1, 32), (3, 32)])
    if fmt == 3:
        s = npr.uniform(-1, 1, size=(n, ch)).astype(np.float32)
        want = s.astype(np.float64)
    elif bits == 8:
        s = npr.integers(-128, 128, size=(n, ch))
        want = s / 128.0
    elif bits == 16:
        s = npr.integers(-(2**15), 2**15, size=(n, ch))
        want = s / 32768.0
    else:
        s = npr.integers(-(2**31), 2**31, size=(n, ch), dtype=np.int64)
        want = s / 2147483648.0
    payload = _wav_bytes(rate, s, bits, fmt)
    got, got_rate = decode_wav(payload)
    assert got_rate == rate
    np.testing.assert_allclose(got, want.mean(axis=1).astype(np.float32), rtol=0, atol=1e-7)


@pytest.mark.parametrize("seed", range(12))
def test_bmp_differential(seed):
    rng = random.Random(100 + seed)
    npr = np.random.default_rng(100 + seed)
    w, h = rng.choice([(1, 1), (3, 2), (7, 5), (16, 16), (33, 9)])
    bpp = rng.choice([24, 32])
    bottom_up = rng.choice([True, False])
    nb = bpp // 8
    px = npr.integers(0, 256, size=(h, w, nb), dtype=np.uint8)  # BGR(A) rows as stored
    stride = (w * nb + 3) & ~3
    rows = []
    order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in order:
        row = px[y].tobytes()
        rows.append(row + b"\x00" * (stride - len(row)))
    pixel_data = b"".join(rows)
    data_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", data_off + len(pixel_data), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, bpp, 0, len(pixel_data), 0, 0, 0, 0
    )
    got = decode_bmp(header + info + pixel_data)
    want = px[..., 2::-1]  # BGR(A) -> RGB
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", range(8))
def test_ppm_differential(seed):
    rng = random.Random(200 + seed)
    npr = np.random.default_rng(200 + seed)
    w, h = rng.choice([(1, 1), (4, 3), (17, 11)])
    gray = rng.choice([True, False])
    ch = 1 if gray else 3
    px = npr.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    magic = b"P5" if gray else b"P6"
    header = magic + b"\n# a comment\n" + f"{w} {h}\n255\n".encode()
    got = decode_ppm(header + px.tobytes())
    np.testing.assert_array_equal(got, px)


def test_truncation_sweep_never_crashes_process():
    """Every truncated prefix of a valid container either raises a
    clean error or returns a well-formed result — no segfault, no
    unbounded allocation, and the featurizer path always has a
    fallback to catch the raise."""
    npr = np.random.default_rng(7)
    wav = _wav_bytes(8000, npr.integers(-100, 100, size=(64, 2)), 16, 1)
    px = npr.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    ppm = b"P6\n4 5\n255\n" + px.tobytes()
    for payload, fn in ((wav, decode_wav), (ppm, decode_ppm)):
        for cut in range(0, len(payload), 3):
            try:
                fn(payload[:cut])
            except Exception:
                pass
    # and through the featurizer contract: truncated bytes never kill it
    from parquet_go_spark.ops.multimodal import _codec_audio_decode, _codec_image_decode

    for cut in range(0, len(wav), 7):
        out = _codec_audio_decode(wav[:cut], 8000, 100)
        assert out.dtype == np.float32
    bmp_like = b"BM" + bytes(30)
    assert _codec_image_decode(bmp_like, 8, 8, 3).shape == (8, 8, 3)
