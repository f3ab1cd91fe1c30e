"""ALP — Adaptive Lossless floating-Point compression (Afroozeh & Boncz,
"ALP: Adaptive Lossless floating-Point Compression", VLDB 2024), decimal
scheme. Most real-world floats are decimals: ``v == round(v * 10^e) /
10^e`` bit-exactly for some small ``e``. The digit stream is then a
bounded-range integer column and rides the existing frame-of-reference +
bit-pack kernel (``kernels/forbp.py``); values the decimal scheme cannot
reproduce bit-for-bit (noise, NaN, ±Inf, > 2^62 digits) are patched
exceptions stored raw.

The reference has no float codec beyond PLAIN (``type_float.go`` /
``type_double.go``); this extends the north-star lightweight-codec
family to float/double columns (prices, scores, coordinates), where
BYTE_STREAM_SPLIT only helps the downstream block compressor.

Wire format (all LE):
  u8   e            decimal exponent, 0..18
  u32  n_exceptions
  u32  * n_exc      exception positions (page-relative)
  raw  * n_exc      exception values (4 or 8 bytes each)
  forbp int64 stream of the digits (exceptions carry a filler digit)

Decode is division by the exactly-representable double ``10^e``
(correctly rounded, e <= 18 < 2^53), the same expression the encoder
verifies against — round-trips are bit-identical BY CONSTRUCTION for
every input, including -0.0 and every NaN payload (verification compares
IEEE bit patterns, not float equality).
"""

from __future__ import annotations

import struct

import numpy as np

from . import forbp

__all__ = ["encode", "decode", "estimate_size"]

_MAX_E = 18
_SAMPLE = 1024


def _decode_expr(digits: np.ndarray, e: int, dtype: np.dtype) -> np.ndarray:
    scale = 10.0**e  # exact double for e <= 22
    out = digits.astype(np.float64) / scale
    if dtype == np.dtype(np.float32):
        return out.astype(np.float32)
    return out


def _digits_and_exceptions(values: np.ndarray, e: int):
    """(int64 digits, exception mask) for exponent ``e`` — exception =
    decode would not reproduce the input bits."""
    v64 = values.astype(np.float64)
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = np.rint(v64 * (10.0**e))
    ok = np.isfinite(scaled) & (np.abs(scaled) < float(1 << 62))
    digits = np.zeros(len(values), np.int64)
    digits[ok] = scaled[ok].astype(np.int64)
    dec = _decode_expr(digits, e, values.dtype)
    ibits = np.uint32 if values.dtype == np.dtype(np.float32) else np.uint64
    exact = dec.view(ibits) == values.view(ibits)
    return digits, ~(ok & exact)


def _choose_e(values: np.ndarray) -> int:
    """Smallest exponent minimizing (exceptions, digit range) on a
    strided sample — the ALP paper's (e, f) search collapsed to one
    scan because our digit stream is FOR-encoded (the frame absorbs
    any common power-of-ten factor's magnitude, so only the exception
    count and bit width matter)."""
    n = len(values)
    sample = values[:: max(n // _SAMPLE, 1)][:_SAMPLE]
    best_e, best_cost = 0, float("inf")
    for e in range(_MAX_E + 1):
        digits, exc = _digits_and_exceptions(sample, e)
        good = digits[~exc]
        if len(good):
            spread = int(good.max()) - int(good.min())
            bits = int(spread).bit_length()
        else:
            bits = 64
        itemsize = values.dtype.itemsize
        cost = len(sample) * bits / 8.0 + int(exc.sum()) * (itemsize + 4)
        if cost < best_cost - 1e-9:
            best_e, best_cost = e, cost
    return best_e


def encode(values: np.ndarray) -> bytes:
    if values.dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        raise ValueError(f"alp encodes float32/float64, got {values.dtype}")
    e = _choose_e(values)
    digits, exc = _digits_and_exceptions(values, e)
    pos = np.flatnonzero(exc).astype(np.uint32)
    # filler keeps the FOR frame tight (paper: first non-exception digit)
    valid = digits[~exc]
    if len(pos) and len(valid):
        digits[exc] = valid[0]
    out = bytearray()
    out.append(e)
    out += struct.pack("<I", len(pos))
    out += pos.tobytes()
    out += values[exc].tobytes()
    out += forbp.encode(digits, 64)
    return bytes(out)


def decode(payload, pos: int, nvals: int, dtype) -> tuple[np.ndarray, int]:
    dtype = np.dtype(dtype)
    e = payload[pos]
    pos += 1
    (n_exc,) = struct.unpack_from("<I", payload, pos)
    pos += 4
    if n_exc > nvals:
        raise ValueError(f"alp: {n_exc} exceptions > {nvals} values")
    exc_pos = np.frombuffer(payload, np.uint32, n_exc, pos)
    pos += 4 * n_exc
    exc_vals = np.frombuffer(payload, dtype, n_exc, pos)
    pos += dtype.itemsize * n_exc
    digits, pos = forbp.decode(payload, pos, 64)
    if len(digits) < nvals or (n_exc and exc_pos.max(initial=0) >= nvals):
        raise ValueError("alp: truncated digit stream or bad exception position")
    vals = _decode_expr(digits[:nvals], e, dtype)
    if n_exc:
        vals[exc_pos] = exc_vals
    return vals, pos


def estimate_size(values: np.ndarray) -> float:
    """Sample-based size estimate for the selector (same shape as the
    kernels' other closed-form estimates)."""
    n = len(values)
    if n == 0:
        return 5.0
    e = _choose_e(values)
    sample = values[:: max(n // _SAMPLE, 1)][:_SAMPLE]
    digits, exc = _digits_and_exceptions(sample, e)
    exc_rate = float(exc.mean())
    good = digits[~exc]
    if len(good):
        bits = max(int(int(good.max()) - int(good.min())).bit_length(), 1)
    else:
        bits = 64
    itemsize = values.dtype.itemsize
    return 5.0 + n * (bits / 8.0 + exc_rate * (itemsize + 4))
