"""PLAIN encoders/decoders for every Parquet physical type, vectorized.

Byte-identical to the reference: raw little-endian values for fixed-width
types (``type_int32.go:11-53``, ``type_float.go:12-55``), LSB-first
bit-packed booleans padded to a whole byte (``type_boolean.go:71-98``),
and 4-byte LE length-prefixed buffers for variable byte arrays
(``type_bytearray.go:57-96``).

Variable-length (string/binary) columns are represented throughout this
engine as ``(lengths: int64[n], data: uint8[sum lengths])`` — the Arrow
layout minus the offsets' first zero — so every kernel is a flat numpy
pass with no per-value Python.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_bool",
    "decode_bool",
    "encode_fixed",
    "decode_fixed",
    "encode_byte_array",
    "decode_byte_array",
    "encode_fixed_byte_array",
    "decode_fixed_byte_array",
    "interleave",
]

_DTYPES = {
    "int32": np.dtype("<i4"),
    "int64": np.dtype("<i8"),
    "float": np.dtype("<f4"),
    "double": np.dtype("<f8"),
}


def encode_bool(values: np.ndarray) -> bytes:
    """PLAIN boolean: LSB-first bit-packed, zero-padded to a byte."""
    return np.packbits(values.astype(bool), bitorder="little").tobytes()


def decode_bool(buf, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    nbytes = (count + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf, np.uint8, nbytes, pos), bitorder="little")
    return bits[:count].astype(bool), pos + nbytes


def encode_fixed(values: np.ndarray, kind: str) -> bytes:
    """PLAIN int32/int64/float/double: raw LE values."""
    return np.ascontiguousarray(values.astype(_DTYPES[kind], copy=False)).tobytes()


def decode_fixed(buf, count: int, kind: str, pos: int = 0) -> tuple[np.ndarray, int]:
    dt = _DTYPES[kind]
    vals = np.frombuffer(buf, dt, count, pos)
    return vals, pos + count * dt.itemsize


def interleave(seg_a: np.ndarray, len_a: np.ndarray, seg_b: np.ndarray, len_b: np.ndarray) -> np.ndarray:
    """Interleave two streams of variable segments: a0 b0 a1 b1 ... -> uint8."""
    n = len(len_a)
    total = int(len_a.sum() + len_b.sum())
    out = np.empty(total, dtype=np.uint8)
    pair = len_a + len_b
    start = np.concatenate([[0], np.cumsum(pair)[:-1]])
    a_src = np.concatenate([[0], np.cumsum(len_a)[:-1]])
    idx = np.repeat(start, len_a) + (np.arange(int(len_a.sum())) - np.repeat(a_src, len_a))
    out[idx] = seg_a
    b_src = np.concatenate([[0], np.cumsum(len_b)[:-1]])
    idx = np.repeat(start + len_a, len_b) + (np.arange(int(len_b.sum())) - np.repeat(b_src, len_b))
    out[idx] = seg_b
    return out


def encode_byte_array(lengths: np.ndarray, data: np.ndarray) -> bytes:
    """PLAIN BYTE_ARRAY: per value 4-byte LE length + raw bytes."""
    n = len(lengths)
    if n == 0:
        return b""
    lengths = lengths.astype(np.int64, copy=False)
    total = int(lengths.sum())
    out = np.empty(total + 4 * n, dtype=np.uint8)
    ends = np.cumsum(lengths) + 4 * np.arange(1, n + 1, dtype=np.int64)
    dst_starts = ends - lengths
    lens32 = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    lp = dst_starts - 4
    for j in range(4):
        out[lp + j] = lens32[:, j]
    if total:
        if total // n >= 32:
            # long segments: n memcpy slices beat building a gather index
            src_starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
            for d, s, l in zip(dst_starts.tolist(), src_starts.tolist(), lengths.tolist()):
                out[d : d + l] = data[s : s + l]
        else:
            # short segments: shift every data byte by 4*(seg_index+1)
            seg_starts = np.cumsum(lengths)[:-1]
            # zero-length tails can start at == total: no data bytes follow
            seg_starts = seg_starts[seg_starts < total]
            bump = np.bincount(seg_starts, minlength=total).astype(np.int64) * 4
            shift = np.cumsum(bump) + 4
            out[np.arange(total, dtype=np.int64) + shift] = data
    return out.tobytes()


def decode_byte_array(buf, count: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (lengths, data, new_pos). Sequential length walk done via numpy scan."""
    if count == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint8), pos
    mv = np.frombuffer(buf, np.uint8)
    lengths = np.empty(count, dtype=np.int64)
    # lengths are data-dependent; walk with a python loop over *values* only
    # for the generic case. Fast path: decode assuming contiguity via
    # iterative scan (still O(n) python). Used only for dict pages /
    # compat; hot paths use delta-length instead.
    p = pos
    starts = np.empty(count, dtype=np.int64)
    for i in range(count):
        l = int(mv[p]) | int(mv[p + 1]) << 8 | int(mv[p + 2]) << 16 | int(mv[p + 3]) << 24
        lengths[i] = l
        starts[i] = p + 4
        p += 4 + l
    total = int(lengths.sum())
    data = np.empty(total, dtype=np.uint8)
    src = np.repeat(starts, lengths) + (
        np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths)
    )
    data[:] = mv[src]
    return lengths, data, p


def encode_fixed_byte_array(data: np.ndarray) -> bytes:
    """PLAIN FIXED_LEN_BYTE_ARRAY: raw concatenated bytes."""
    return np.ascontiguousarray(data, dtype=np.uint8).tobytes()


def decode_fixed_byte_array(buf, count: int, length: int, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    total = count * length
    data = np.frombuffer(buf, np.uint8, total, pos)
    return np.full(count, length, dtype=np.int64), data, pos + total
