"""BYTE_STREAM_SPLIT codec (Parquet spec; absent from the reference —
``README.md:44`` lists it unimplemented, the enum exists at
``parquet/parquet.thrift:475``). Built spec-first for the ``html``-binary /
float fallback path in the north star.

Layout: for n values of k bytes each, emit all first bytes, then all second
bytes, ... (k streams of n bytes). This is a pure transpose — one numpy
reshape — and makes IEEE floats / similar-magnitude ints far more
compressible by the downstream block compressor.
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode", "decode"]


def encode(values: np.ndarray, itemsize: int | None = None) -> bytes:
    """values: fixed-width array (or raw uint8 with explicit itemsize)."""
    if itemsize is None:
        itemsize = values.dtype.itemsize
    raw = np.ascontiguousarray(values).view(np.uint8).reshape(-1, itemsize)
    return np.ascontiguousarray(raw.T).tobytes()


def decode(buf, count: int, dtype: np.dtype, pos: int = 0) -> tuple[np.ndarray, int]:
    itemsize = np.dtype(dtype).itemsize
    total = count * itemsize
    raw = np.frombuffer(buf, np.uint8, total, pos).reshape(itemsize, count)
    vals = np.ascontiguousarray(raw.T).reshape(-1).view(dtype)
    return vals, pos + total
