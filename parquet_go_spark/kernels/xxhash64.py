"""XXH64 (Yann Collet's xxHash, public-domain spec) — the hash the
parquet-format BloomFilter.md mandates (seed 0 over plain-encoded
values).

Two forms:

* :func:`xxh64` — scalar over one byte string; the probe side hashes a
  single predicate literal, and it doubles as the independent reference
  the vectorized form is tested against.
* :func:`xxh64_column` — vectorized over a null-stripped byte column
  (lengths + contiguous data). Values are grouped BY LENGTH so every
  group shares one stripe count and the whole XXH64 state machine runs
  as numpy array ops over an (m, L) matrix — no per-value Python. Web
  columns (urls, tokens) have few distinct lengths relative to rows, so
  the grouping amortizes to ~O(distinct_lengths) kernel launches.

Spark's builtin ``F.xxhash64`` is the same algorithm at seed 42 over a
string's UTF-8 bytes, which gives the tests an independent oracle.
"""

from __future__ import annotations

import numpy as np

__all__ = ["xxh64", "xxh64_column"]

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 0) -> int:
    """Spec-literal scalar XXH64."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while pos + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while pos + 8 <= n:
        h ^= _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


# ------------------------------------------------------------- vectorized

_U = np.uint64
_LANE_PW = (_U(1) << (_U(8) * np.arange(8, dtype=np.uint64))).astype(np.uint64)


def _v_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def _v_round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _v_rotl(acc + lane * _U(_P2), 31) * _U(_P1)


def _lanes(m: np.ndarray, off: int, nbytes: int = 8) -> np.ndarray:
    """Little-endian integer lanes from byte matrix columns [off, off+nbytes)."""
    return m[:, off : off + nbytes].astype(np.uint64) @ _LANE_PW[:nbytes]


def _xxh64_fixed(m: np.ndarray, seed: int) -> np.ndarray:
    """XXH64 over every row of an (k, L) uint8 matrix (one shared L)."""
    k, n = m.shape
    pos = 0
    if n >= 32:
        v1 = np.full(k, (seed + _P1 + _P2) & _M, dtype=np.uint64)
        v2 = np.full(k, (seed + _P2) & _M, dtype=np.uint64)
        v3 = np.full(k, seed & _M, dtype=np.uint64)
        v4 = np.full(k, (seed - _P1) & _M, dtype=np.uint64)
        while pos + 32 <= n:
            v1 = _v_round(v1, _lanes(m, pos))
            v2 = _v_round(v2, _lanes(m, pos + 8))
            v3 = _v_round(v3, _lanes(m, pos + 16))
            v4 = _v_round(v4, _lanes(m, pos + 24))
            pos += 32
        h = _v_rotl(v1, 1) + _v_rotl(v2, 7) + _v_rotl(v3, 12) + _v_rotl(v4, 18)
        for v in (v1, v2, v3, v4):
            h = (h ^ _v_round(np.zeros(k, np.uint64), v)) * _U(_P1) + _U(_P4)
    else:
        h = np.full(k, (seed + _P5) & _M, dtype=np.uint64)
    h = h + _U(n)
    while pos + 8 <= n:
        h = h ^ _v_round(np.zeros(k, np.uint64), _lanes(m, pos))
        h = _v_rotl(h, 27) * _U(_P1) + _U(_P4)
        pos += 8
    if pos + 4 <= n:
        h = h ^ (_lanes(m, pos, 4) * _U(_P1))
        h = _v_rotl(h, 23) * _U(_P2) + _U(_P3)
        pos += 4
    while pos < n:
        h = h ^ (m[:, pos].astype(np.uint64) * _U(_P5))
        h = _v_rotl(h, 11) * _U(_P1)
        pos += 1
    h = h ^ (h >> _U(33))
    h = h * _U(_P2)
    h = h ^ (h >> _U(29))
    h = h * _U(_P3)
    h = h ^ (h >> _U(32))
    return h


def xxh64_column(lengths: np.ndarray, data: np.ndarray, seed: int = 0) -> np.ndarray:
    """XXH64 of every value in a byte column -> uint64[n].

    ``lengths``/``data`` follow the engine's null-stripped layout
    (contiguous value bytes). Values are grouped by length; each group
    hashes as one fully-vectorized fixed-width batch."""
    from ..core.columns import gather_segments

    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    order = np.argsort(lengths, kind="stable")
    sorted_lens = lengths[order]
    bounds = np.flatnonzero(np.diff(sorted_lens)) + 1
    group_edges = np.concatenate([[0], bounds, [n]])
    with np.errstate(over="ignore"):
        for gi in range(len(group_edges) - 1):
            lo, hi = int(group_edges[gi]), int(group_edges[gi + 1])
            idx = order[lo:hi]
            ln = int(sorted_lens[lo])
            if ln == 0:
                out[idx] = _U(xxh64(b"", seed))
                continue
            flat = gather_segments(data, starts[idx], np.full(hi - lo, ln, np.int64))
            out[idx] = _xxh64_fixed(flat.reshape(hi - lo, ln), seed)
    return out
