"""FSST and BYTE_STREAM_SPLIT tests (north-star codecs, spec-driven,
self-round-trip per SURVEY.md §7 step 2)."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.kernels import bytestreamsplit as bss
from parquet_go_spark.kernels import fsst

RNG = np.random.default_rng(7)

WORDS = (
    "the quick brown fox jumps over lazy dog http www com org html page "
    "content web site data click here terms privacy policy copyright"
).split()


def make_texts(n, min_words=5, max_words=60):
    texts = []
    for _ in range(n):
        k = RNG.integers(min_words, max_words)
        texts.append((" ".join(RNG.choice(WORDS, size=k)) + ".").encode())
    return texts


def to_flat(values):
    lens = np.array([len(v) for v in values], dtype=np.int64)
    data = np.frombuffer(b"".join(values), dtype=np.uint8) if values else np.empty(0, np.uint8)
    return lens, data


@pytest.mark.parametrize("n", [0, 1, 3, 500])
def test_fsst_roundtrip(n):
    texts = make_texts(n) if n else []
    lens, data = to_flat(texts)
    enc = fsst.encode_column(lens, data)
    ol, od, pos = fsst.decode_column(enc)
    assert pos == len(enc)
    np.testing.assert_array_equal(ol, lens)
    np.testing.assert_array_equal(od, data)


def test_fsst_compresses_web_text():
    texts = make_texts(2000)
    lens, data = to_flat(texts)
    enc = fsst.encode_column(lens, data)
    ratio = len(enc) / int(lens.sum())
    assert ratio < 0.55, f"FSST ratio {ratio:.2f} too weak on wordy text"
    ol, od, _ = fsst.decode_column(enc)
    np.testing.assert_array_equal(od, data)


def test_fsst_handles_escape_heavy_binary():
    # random bytes: almost everything escapes (incl. 0xff literals)
    lens = np.full(50, 64, dtype=np.int64)
    data = RNG.integers(0, 256, size=int(lens.sum()), dtype=np.uint8)
    enc = fsst.encode_column(lens, data)
    ol, od, _ = fsst.decode_column(enc)
    np.testing.assert_array_equal(ol, lens)
    np.testing.assert_array_equal(od, data)


def test_fsst_empty_and_zero_length_strings():
    vals = [b"", b"aaa", b"", b"aaaaaa", b""]
    lens, data = to_flat(vals)
    enc = fsst.encode_column(lens, data)
    ol, od, _ = fsst.decode_column(enc)
    np.testing.assert_array_equal(ol, lens)
    np.testing.assert_array_equal(od, data)


def test_fsst_symbols_never_cross_string_boundaries():
    # "abab|abab" must not produce a symbol spanning the boundary; decoded
    # per-string lengths prove boundaries survived
    vals = [b"abababab"] * 100 + [b"babababa"] * 100
    lens, data = to_flat(vals)
    enc = fsst.encode_column(lens, data)
    ol, od, _ = fsst.decode_column(enc)
    np.testing.assert_array_equal(ol, lens)
    np.testing.assert_array_equal(od, data)


@pytest.mark.parametrize("dt", [np.float32, np.float64, np.int32, np.int64])
def test_bss_roundtrip(dt):
    if np.issubdtype(dt, np.floating):
        vals = RNG.normal(scale=1e6, size=1001).astype(dt)
    else:
        vals = RNG.integers(-(2**20), 2**20, size=1001).astype(dt)
    enc = bss.encode(vals)
    out, pos = bss.decode(enc, len(vals), np.dtype(dt))
    assert pos == len(enc)
    np.testing.assert_array_equal(out, vals)


def test_bss_improves_compressibility():
    import zlib

    vals = (np.arange(10000, dtype=np.float64) * 1.5 + 1e9).astype(np.float64)
    plain = vals.tobytes()
    split = bss.encode(vals)
    assert len(zlib.compress(split)) < len(zlib.compress(plain))


def test_zdict_roundtrip_and_training():
    import numpy as np
    import pyarrow as pa

    from parquet_go_spark.core.chunk import decode_chunk, encode_chunk
    from parquet_go_spark.core.columns import from_arrow, to_arrow
    from parquet_go_spark.kernels import bytearrays

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "common-prefix/path"]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 40))) for _ in range(2000)]
    texts[3] = None
    arr = pa.array(texts)
    cd = from_arrow(arr)
    for comp in ("none", "snappy", "zlib"):
        blob, meta = encode_chunk(cd, encoding="zdict", compression=comp)
        assert to_arrow(decode_chunk(blob, logical=cd.logical)).equals(arr)
    # entropy coding must beat plain by a wide margin on repetitive text
    assert meta.encoded_bytes < meta.raw_bytes // 3
    # trained dict: empty for tiny streams, contiguous slices otherwise
    assert bytearrays.train_zdict(np.array([10], np.int64), np.zeros(10, np.uint8)) == b""
    zd = bytearrays.train_zdict(cd.lengths, cd.data)
    assert 0 < len(zd) <= 1 << 13
    # dict actually used: chunk flags bit 2 set
    blob2, _ = encode_chunk(cd, encoding="zdict")
    assert blob2[8] & 2


def test_zdict_kernel_truncation():
    import numpy as np
    import pytest as _pytest

    from parquet_go_spark.kernels import bytearrays

    lens = np.array([3, 0, 5], np.int64)
    data = np.frombuffer(b"abcdefgh", np.uint8)
    enc = bytearrays.encode_zdict(lens, data)
    ol, od, pos = bytearrays.decode_zdict(enc)
    assert np.array_equal(ol, lens) and bytes(od) == b"abcdefgh" and pos == len(enc)
    with _pytest.raises(Exception):
        bytearrays.decode_zdict(enc[: len(enc) // 2])


def test_zdict_zstd_codec_path():
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from parquet_go_spark.core.chunk import decode_chunk, encode_chunk
    from parquet_go_spark.core.columns import from_arrow, to_arrow
    from parquet_go_spark.kernels import bytearrays

    rng = np.random.default_rng(11)
    vocab = [f"token{i}" for i in range(500)]
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(3000)]
    arr = pa.array(texts)
    cd = from_arrow(arr)
    # forced zstd and forced deflate both round-trip bit-exact
    for codec in (0, 1):
        enc = bytearrays.encode_zdict(cd.lengths, cd.data, codec=codec)
        assert enc[len(enc) - len(enc) :][0:1]  # non-empty
        ol, od, pos = bytearrays.decode_zdict(enc)
        assert np.array_equal(ol, cd.lengths) and np.array_equal(od, cd.data)
    # the chunk-level adaptive choice round-trips through encode/decode
    blob, meta = encode_chunk(cd, encoding="zdict")
    assert meta.encoding == "zdict"
    assert to_arrow(decode_chunk(blob, logical=cd.logical)).equals(arr)
    # unknown codec byte raises ValueError, never a crash
    enc = bytearrays.encode_zdict(cd.lengths[:5], cd.data[: int(cd.lengths[:5].sum())], codec=1)
    from parquet_go_spark.kernels.varint import read_uvarint

    mv = memoryview(enc)
    _, p = read_uvarint(mv, 0)
    _, p = read_uvarint(mv, p)
    bad = bytearray(enc)
    bad[p] = 7
    with _pytest.raises(ValueError, match="codec"):
        bytearrays.decode_zdict(bytes(bad))
    # corrupt zstd frame surfaces as ValueError
    bad = bytearray(enc)
    bad[p + 3] ^= 0xFF
    with _pytest.raises(ValueError):
        bytearrays.decode_zdict(bytes(bad))


def test_zdict_codec_choice_follows_data_shape():
    import numpy as np

    from parquet_go_spark.kernels import bytearrays

    # large low-structure text: zstd-3 must win (deflate can't save >=10%)
    rng = np.random.default_rng(7)
    words = np.array([f"w{i:04d}" for i in range(8000)])
    big = " ".join(rng.choice(words, 400_000)).encode()
    lens = np.array([len(big)], np.int64)
    data = np.frombuffer(big, np.uint8)
    assert bytearrays.choose_zdict_codec(lens, data) == 1
