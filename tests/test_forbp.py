"""Frame-of-reference + bit-pack codec (``kernels/forbp.py``): kernel
round-trips incl. wrapping extremes, closed-form size estimate, chunk-layer
integration, and the selector preferring FOR over delta-BP on
clustered-but-unsorted int64 data (the shape where value spread is small
but deltas carry the full range)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.core import from_arrow, to_arrow
from parquet_go_spark.core.chunk import decode_chunk, encode_chunk
from parquet_go_spark.kernels import forbp

RNG = np.random.default_rng(23)


@pytest.mark.parametrize("bits", [32, 64])
@pytest.mark.parametrize("n", [0, 1, 2, 7, 8, 9, 31, 255, 256, 257, 5000])
def test_forbp_roundtrip_random(bits, n):
    info = np.iinfo(np.int32 if bits == 32 else np.int64)
    vals = RNG.integers(info.min, info.max, size=n, dtype=np.int64, endpoint=True)
    if bits == 32:
        vals = vals.astype(np.int32)
    enc = forbp.encode(vals, bits)
    assert len(enc) == forbp.estimate_size(vals, bits)
    out, pos = forbp.decode(enc, 0, bits)
    assert pos == len(enc)
    np.testing.assert_array_equal(out, vals)


@pytest.mark.parametrize("bits", [32, 64])
def test_forbp_extremes_wrap(bits):
    info = np.iinfo(np.int32 if bits == 32 else np.int64)
    dt = np.int32 if bits == 32 else np.int64
    vals = np.array([info.min, info.max, 0, -1, 1, info.min, info.max], dtype=dt)
    enc = forbp.encode(vals, bits)
    out, pos = forbp.decode(enc, 0, bits)
    assert pos == len(enc)
    np.testing.assert_array_equal(out, vals)
    # full-spread degrades to full width (8-value pad groups), never wrong
    assert len(enc) <= -(-len(vals) // 8) * 8 * (bits // 8) + 16


def test_forbp_constant_column_is_tiny():
    vals = np.full(100_000, 1_650_000_000_000_000, dtype=np.int64)
    enc = forbp.encode(vals, 64)
    assert len(enc) < 32  # header only: width 0, no packed bytes
    out, _ = forbp.decode(enc, 0, 64)
    np.testing.assert_array_equal(out, vals)


def test_forbp_clustered_beats_delta_bp():
    # crawl-batch timestamps: small value spread, unsorted -> deltas
    # alternate sign and carry the spread twice over
    from parquet_go_spark.kernels import deltabp

    base = 1_650_000_000_000_000
    vals = base + RNG.integers(0, 3_600_000_000, size=50_000).astype(np.int64)
    assert len(forbp.encode(vals, 64)) < len(deltabp.encode(vals, 64))


def test_forbp_stream_is_self_delimiting():
    a = RNG.integers(0, 1 << 40, size=333).astype(np.int64)
    b = RNG.integers(-(1 << 20), 1 << 20, size=77).astype(np.int64)
    buf = forbp.encode(a, 64) + forbp.encode(b, 64)
    out_a, pos = forbp.decode(buf, 0, 64)
    out_b, pos = forbp.decode(buf, pos, 64)
    assert pos == len(buf)
    np.testing.assert_array_equal(out_a, a)
    np.testing.assert_array_equal(out_b, b)


def test_forbp_truncated_raises():
    enc = forbp.encode(np.arange(1000, dtype=np.int64), 64)
    with pytest.raises(ValueError):
        forbp.decode(enc[: len(enc) // 2], 0, 64)


# ------------------------------------------------------------- chunk layer
@pytest.mark.parametrize("ptype", ["int32", "int64"])
@pytest.mark.parametrize("compression", ["none", "snappy"])
def test_chunk_forced_for_bp_roundtrip(ptype, compression):
    n = 20_000
    if ptype == "int32":
        arr = pa.array(RNG.integers(-(2**28), 2**28, n), type=pa.int32())
    else:
        arr = pa.array(RNG.integers(-(2**50), 2**50, n), type=pa.int64())
    col = from_arrow(arr)
    blob, meta = encode_chunk(col, encoding="for_bp", compression=compression)
    assert meta.encoding == "for_bp"
    out = decode_chunk(blob, logical=col.logical)
    assert to_arrow(out).cast(arr.type).equals(arr)


def test_chunk_forced_for_bp_with_nulls_multipage():
    n = 30_000
    vals = RNG.integers(0, 1 << 30, n).astype(np.int64)
    mask = RNG.random(n) < 0.1
    arr = pa.array([None if m else int(v) for v, m in zip(vals, mask)], type=pa.int64())
    col = from_arrow(arr)
    blob, meta = encode_chunk(col, encoding="for_bp", max_page=4096)
    assert meta.num_pages > 1  # per-page FOR references exercised
    out = decode_chunk(blob, logical=col.logical)
    assert to_arrow(out).equals(arr)


def test_selector_picks_for_bp_on_clustered_unsorted():
    base = 1_650_000_000_000_000
    vals = base + RNG.integers(0, 3_600_000_000, size=50_000).astype(np.int64)
    arr = pa.array(vals, type=pa.timestamp("us"))
    col = from_arrow(arr)
    blob, meta = encode_chunk(col, profile="auto")
    assert meta.encoding == "for_bp"
    out = decode_chunk(blob, logical=col.logical)
    assert to_arrow(out).cast(arr.type).equals(arr)


def test_selector_keeps_delta_bp_on_sorted():
    # near-monotonic warc_ts: tiny deltas beat FOR's full-window spread
    ts = 1_600_000_000_000_000 + np.cumsum(
        RNG.integers(0, 3_600_000, size=50_000)
    ).astype(np.int64)
    arr = pa.array(ts, type=pa.timestamp("us"))
    col = from_arrow(arr)
    _blob, meta = encode_chunk(col, profile="auto")
    assert meta.encoding == "delta_bp"
