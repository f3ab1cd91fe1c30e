"""ALP codec (``kernels/alp.py``, VLDB'24 decimal scheme): bit-exact
kernel round-trips for every input class (decimals, noise, IEEE
specials, float32), chunk-layer integration with nulls and pages, and
the selector picking ALP on decimal columns while refusing noise.
The reference has no float codec beyond PLAIN (``type_float.go``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_spark.core import from_arrow, to_arrow
from parquet_go_spark.core.chunk import decode_chunk, encode_chunk
from parquet_go_spark.kernels import alp

RNG = np.random.default_rng(31)


def _bits(a: np.ndarray):
    return a.view(np.uint32 if a.dtype == np.dtype(np.float32) else np.uint64)


def _roundtrip(vals: np.ndarray):
    enc = alp.encode(vals)
    out, pos = alp.decode(enc, 0, len(vals), vals.dtype)
    assert pos == len(enc)
    np.testing.assert_array_equal(_bits(out), _bits(vals))
    return enc


@pytest.mark.parametrize("n", [0, 1, 2, 7, 8, 1000, 50_000])
def test_decimal_doubles_roundtrip_and_compress(n):
    vals = RNG.integers(-(10**7), 10**7, n) / 100.0
    enc = _roundtrip(vals)
    if n >= 1000:
        assert len(enc) < n * 8 * 0.45  # well under PLAIN


def test_float32_decimals():
    vals = (RNG.integers(0, 10**5, 20_000) / 10.0).astype(np.float32)
    enc = _roundtrip(vals)
    assert len(enc) < len(vals) * 4 * 0.7


def test_noise_is_all_exceptions_but_exact():
    vals = RNG.standard_normal(5_000)
    _roundtrip(vals)


def test_ieee_specials_and_extremes():
    vals = np.array(
        [np.nan, -np.nan, np.inf, -np.inf, -0.0, 0.0, 1e308, -1e308,
         5e-324, -5e-324, 2.0**53, 2.0**53 + 2, 123.456, -99.99],
        np.float64,
    )
    _roundtrip(vals)


def test_integer_valued_doubles_pick_e0():
    vals = RNG.integers(0, 10**6, 10_000).astype(np.float64)
    enc = alp.encode(vals)
    assert enc[0] == 0  # exponent byte
    _roundtrip(vals)


def test_trailing_zero_decimals_large_magnitude():
    # prices in micros: value spread forces wide digits unless FOR absorbs it
    base = 1_650_000_000.0
    vals = base + RNG.integers(0, 10**6, 20_000) / 100.0
    enc = _roundtrip(vals)
    assert len(enc) < len(vals) * 8 * 0.5


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.integers(-(10**9), 10**9).map(lambda i: i / 1000.0),
        ),
        max_size=300,
    )
)
def test_fuzz_roundtrip(xs):
    vals = np.array(xs, np.float64)
    _roundtrip(vals)


def test_decode_rejects_forged_exception_count():
    vals = RNG.integers(0, 1000, 100) / 10.0
    enc = bytearray(alp.encode(vals))
    assert enc[0] == 0  # decimal scheme: [scheme, e, n_exc u32, ...]
    enc[2:6] = (10**6).to_bytes(4, "little")  # n_exc >> nvals
    with pytest.raises(ValueError):
        alp.decode(bytes(enc), 0, len(vals), np.float64)


@pytest.mark.parametrize("compression", ["none", "snappy"])
@pytest.mark.parametrize("ptype", ["float", "double"])
def test_chunk_forced_alp_roundtrip(ptype, compression):
    n = 20_000
    raw = RNG.integers(-(10**6), 10**6, n) / 100.0
    arr = pa.array(raw.astype(np.float32) if ptype == "float" else raw,
                   type=pa.float32() if ptype == "float" else pa.float64())
    col = from_arrow(arr)
    blob, meta = encode_chunk(col, encoding="alp", compression=compression)
    assert meta.encoding == "alp"
    out = decode_chunk(blob, logical=col.logical)
    assert to_arrow(out).cast(arr.type).equals(arr)


def test_chunk_alp_with_nulls_multipage():
    n = 30_000
    raw = RNG.integers(0, 10**6, n) / 100.0
    mask = RNG.random(n) < 0.1
    arr = pa.array([None if m else float(v) for v, m in zip(raw, mask)], type=pa.float64())
    col = from_arrow(arr)
    blob, meta = encode_chunk(col, encoding="alp", max_page=4096)
    assert meta.encoding == "alp"
    out = decode_chunk(blob, logical=col.logical)
    assert to_arrow(out).equals(arr)


def test_selector_picks_alp_on_decimals_and_dict_on_low_cardinality():
    dec = pa.array(RNG.integers(-(10**6), 10**6, 40_000) / 100.0, type=pa.float64())
    blob, meta = encode_chunk(from_arrow(dec), profile="auto", compression="snappy")
    assert meta.encoding == "alp"
    # low-cardinality floats: the dictionary stays strictly cheaper
    lowcard = pa.array(RNG.choice([0.05, 0.1, 0.25], 40_000), type=pa.float64())
    _blob2, meta2 = encode_chunk(from_arrow(lowcard), profile="auto", compression="snappy")
    assert meta2.encoding == "rle_dict"


# ---------------------------------------------------------------- ALP-RD

def test_rd_noise_doubles_beat_plain_and_stay_exact():
    vals = RNG.standard_normal(20_000)
    enc = _roundtrip(vals)
    assert enc[0] == 1  # RD scheme byte
    assert len(enc) < len(vals) * 8 * 0.92


def test_rd_embedding_floats_beat_byteplane_codecs():
    import pyarrow.parquet as pq

    vals = np.asarray(
        pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        .column("embedding").combine_chunks().values,
        dtype=np.float32,
    )
    enc = _roundtrip(vals)
    assert enc[0] == 1
    # zstd on raw/byte-split planes leaves this data at ~0.93 of raw;
    # the bit-aligned split must do better with no block codec at all
    assert len(enc) < len(vals) * 4 * 0.90


def test_rd_left_exceptions_patched():
    # a few values with exotic exponents force left-dictionary misses
    vals = np.concatenate([
        RNG.standard_normal(5_000),
        np.array([1e300, -1e-300, 5e-324, np.inf, np.nan]),
    ])
    enc = _roundtrip(vals)
    assert enc[0] == 1


def test_rd_decode_rejects_forged_right_width():
    vals = RNG.standard_normal(1_000)
    enc = bytearray(alp.encode(vals))
    assert enc[0] == 1
    enc[1] = 7  # float64 right width must be in [48, 63]
    with pytest.raises(ValueError):
        alp.decode(bytes(enc), 0, len(vals), np.float64)


def test_rd_decode_rejects_truncation():
    vals = RNG.standard_normal(1_000)
    enc = alp.encode(vals)
    assert enc[0] == 1
    with pytest.raises(ValueError):
        alp.decode(enc[: len(enc) // 2], 0, len(vals), np.float64)


def test_chunk_auto_picks_alp_rd_on_noise_floats():
    vals = RNG.standard_normal(40_000).astype(np.float32)
    blob, meta = encode_chunk(from_arrow(pa.array(vals, type=pa.float32())),
                              profile="auto", compression="zstd")
    assert meta.encoding == "alp"
    out = decode_chunk(blob, logical="float")
    np.testing.assert_array_equal(_bits(np.asarray(out.values)), _bits(vals))


def test_chunk_hint_matches_per_page_search_on_homogeneous_data():
    """choose_params hoists the (e, rb) search to chunk level (VERDICT
    r2 #4): on homogeneous data the hinted encode must produce the very
    bytes the per-page search would."""
    rng = np.random.default_rng(7)
    # decimal-shaped doubles (prices)
    prices = np.round(rng.uniform(0, 1000, 50_000), 2)
    hint = alp.choose_params(prices)
    assert alp.encode(prices, hint=hint) == alp.encode(prices)
    # RD-shaped noise floats (embeddings)
    emb = rng.standard_normal(50_000).astype(np.float32)
    hint = alp.choose_params(emb)
    assert alp.encode(emb, hint=hint) == alp.encode(emb)


def test_chunk_hint_diverging_page_resarches():
    """A page whose data diverges from the chunk hint must re-search,
    not limp along with a bad exponent."""
    rng = np.random.default_rng(8)
    decimals = np.round(rng.uniform(0, 100, 10_000), 2)
    # hint fitted to micro-scale decimals (e=6), page holds 2-decimals
    micro = np.round(rng.uniform(0, 1e-3, 10_000), 6)
    bad_hint = alp.choose_params(micro)
    out = alp.encode(decimals, hint=bad_hint)
    vals, _ = alp.decode(out, 0, len(decimals), np.float64)
    assert vals.tobytes() == decimals.tobytes()
    # size must stay near the properly-searched encode (no blowup)
    assert len(out) <= int(len(alp.encode(decimals)) * 1.05)


def test_encode_rejects_u32_position_overflow_guard():
    """The u32-position invariant is checked explicitly, not implied by
    page sizing (ADVICE r2). A 2^32-value array would need 32 GiB, so
    trigger the guard with a zero-stride broadcast view: same reported
    length, one backing element."""
    big = np.broadcast_to(np.zeros(1, np.float64), (1 << 32,))
    with pytest.raises(ValueError, match="u32 exception positions"):
        alp.encode(big)
