"""Vectorized LSB-first bit-packing kernels (Parquet bit-packed layout).

Semantics match the generated Go kernels in the reference
(``bitbacking32.go`` / ``bitpacking64.go``: ``pack8int32_N`` /
``unpack8int32_N``): groups of 8 values are packed into ``width`` bytes,
value *i* occupies bits ``[i*width, (i+1)*width)`` of the little-endian
bitstream (least-significant bit of byte 0 first).

Unlike the reference (one fixed function per width, 8 values at a time),
these kernels are numpy-vectorized over the whole array: the bitstream is
materialized as a flat bit matrix and packed with ``np.packbits`` /
``np.unpackbits`` (C-speed), which reproduces the exact same bytes for
every width 0..64.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack", "unpack", "packed_size"]


def packed_size(count: int, width: int) -> int:
    """Byte size of *count* packed values (count must be a multiple of 8)."""
    return (count * width) // 8


def pack(values: np.ndarray, width: int) -> bytes:
    """Bit-pack ``values`` (len multiple of 8) at ``width`` bits, LSB-first.

    Values are masked to ``width`` bits (two's-complement wrap), matching the
    Go kernels which shift/or raw uint casts.
    """
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
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((u[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


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
    need = groups * width
    buf = np.frombuffer(data, dtype=np.uint8, count=need)
    bits = np.unpackbits(buf, bitorder="little")
    bits = bits[: groups * 8 * width].reshape(-1, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    vals = (bits << shifts).sum(axis=1, dtype=np.uint64)
    return vals[:count]
