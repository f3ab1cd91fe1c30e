"""Vectorized LSB-first bit-packing kernels (Parquet bit-packed layout).

Semantics match the generated Go kernels in the reference
(``bitbacking32.go`` / ``bitpacking64.go``: ``pack8int32_N`` /
``unpack8int32_N``): groups of 8 values are packed into ``width`` bytes,
value *i* occupies bits ``[i*width, (i+1)*width)`` of the little-endian
bitstream (least-significant bit of byte 0 first).

Implementation: where the Go reference generates one straight-line
function per width, we exploit the same structural fact — within a group
of 8 values every (value lane i, output byte lane b) pair has a *constant*
shift ``i*width - 8*b`` — so packing n values is ``~width+8`` whole-array
shift/or ops over ``n/8``-element columns. No per-element shift tables,
no bit-matrix materialization; runs at GB/s.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["pack", "unpack", "packed_size"]


def packed_size(count: int, width: int) -> int:
    """Byte size of *count* packed values (count must be a multiple of 8)."""
    return (count * width) // 8


@functools.lru_cache(maxsize=None)
def _pack_plan(width: int) -> list[tuple[int, int, int]]:
    """(byte_lane b, value_lane i, shift s) with s = 8b - i*width; the
    contribution of value i to byte b is (v >> s) if s>=0 else (v << -s)."""
    plan = []
    for b in range(width):
        for i in range(8):
            lo, hi = i * width, (i + 1) * width
            if lo < 8 * b + 8 and hi > 8 * b:
                plan.append((b, i, 8 * b - lo))
    return plan


def pack(values: np.ndarray, width: int) -> bytes:
    """Bit-pack ``values`` (len multiple of 8) at ``width`` bits, LSB-first."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if n % 8 != 0:
        raise ValueError(f"pack: length {n} not a multiple of 8")
    if not 0 < width <= 64:
        raise ValueError(f"pack: invalid width {width}")
    u = values.astype(np.uint64, copy=False)
    if width < 64:
        u = u & np.uint64((1 << width) - 1)
    g = n // 8
    lanes = u.reshape(g, 8)
    out = np.zeros((g, width), dtype=np.uint8)
    for b, i, s in _pack_plan(width):
        col = lanes[:, i]
        term = (col >> np.uint64(s)) if s >= 0 else (col << np.uint64(-s))
        out[:, b] |= term.astype(np.uint8)
    return out.tobytes()


@functools.lru_cache(maxsize=None)
def _unpack_plan(width: int) -> list[tuple[int, int, int]]:
    """(value_lane i, byte_lane b, shift s): value i |= byte_b shifted by s
    (positive = left shift)."""
    plan = []
    for i in range(8):
        lo, hi = i * width, (i + 1) * width
        for b in range(lo // 8, (hi + 7) // 8):
            plan.append((i, b, 8 * b - lo))
    return plan


def unpack(data: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns ``uint64`` array of length ``count``.

    ``count`` need not be a multiple of 8 (trailing pad values dropped), but
    ``data`` must hold ``ceil(count/8)*width`` bytes at least.
    """
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    groups = (count + 7) // 8
    buf = np.frombuffer(data, dtype=np.uint8, count=groups * width).reshape(groups, width)
    vals = np.zeros((groups, 8), dtype=np.uint64)
    for i, b, s in _unpack_plan(width):
        col = buf[:, b].astype(np.uint64)
        vals[:, i] |= (col << np.uint64(s)) if s >= 0 else (col >> np.uint64(-s))
    if width < 64:
        vals &= np.uint64((1 << width) - 1)
    return vals.reshape(-1)[:count]
