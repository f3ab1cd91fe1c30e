"""KMV (k-minimum-values) distinct-count sketch.

Mergeable distinct sketch for column statistics (reference O13 semantics,
``stats.go:9-225`` records per-chunk distinct counts; counts do not sum
across chunks, so a table-level distinct needs a mergeable summary).

Design: hash every distinct value to 64 bits (xxhash64, the engine's
bloom hash family), keep the ``k`` smallest distinct hashes.  Two regimes:

- **exact** — while a sketch has seen at most ``k`` distinct hashes it IS
  the full distinct-hash set, and a union of untruncated sketches is the
  exact table-level distinct count (modulo 64-bit hash collisions,
  ~n^2/2^65 — 1e-10 at 60k values).  This keeps small-scale oracle rows
  (`COUNT(DISTINCT c)`) bit-exact.
- **estimate** — once truncated, the classic KMV estimator
  ``(k - 1) / normalized k-th minimum`` (Bar-Yossef et al. 2002;
  Beyer et al., "On Synopses for Distinct-Value Estimation Under
  Multiset Operations", SIGMOD'07).  Relative error ~ 1/sqrt(k-2).

Serialized form: little-endian uint64 hashes, sorted ascending, with a
1-byte header flag (1 = truncated).  Merging is a uint64 set-union —
associative, commutative, idempotent, so sketches can merge across
chunks, partitions, files, and snapshots in any tree shape.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "KMV_K_DEFAULT",
    "kmv_from_hashes",
    "kmv_serialize",
    "kmv_deserialize",
    "kmv_merge",
    "kmv_count",
    "hash_column_values",
]

# Exact up to 2^18 distinct values per merged scope: covers every sf0.01
# driver/oracle table (lineitem = 60k rows), ~2 MiB worst-case state.
KMV_K_DEFAULT = 1 << 18

_FULL = float(1 << 64)


def kmv_from_hashes(hashes: np.ndarray, k: int = KMV_K_DEFAULT) -> tuple[np.ndarray, bool]:
    """Build sketch state from raw 64-bit value hashes.

    Returns (sorted unique uint64 hashes, truncated flag). ``truncated``
    is False exactly when the state is the complete distinct-hash set.
    """
    uq = np.unique(np.asarray(hashes, dtype=np.uint64))
    if len(uq) > k:
        return uq[:k], True
    return uq, False


def kmv_serialize(state: np.ndarray, truncated: bool) -> bytes:
    return bytes([1 if truncated else 0]) + state.astype("<u8").tobytes()


def kmv_deserialize(blob: bytes) -> tuple[np.ndarray, bool]:
    if not blob:
        return np.empty(0, np.uint64), False
    body = np.frombuffer(blob, dtype="<u8", offset=1)
    return body.astype(np.uint64, copy=False), bool(blob[0])


def kmv_merge(
    states: list[np.ndarray], truncated_flags: list[bool], k: int = KMV_K_DEFAULT
) -> tuple[np.ndarray, bool]:
    """Union partial sketches. Result is exact iff every input was.

    A truncated input's effective k IS its retained length — every hash
    above its own k-th minimum was discarded at build time, so the union
    is a valid KMV state only up to the SMALLEST such threshold.  Sketches
    built at different k therefore merge correctly (clipped to the
    tightest), instead of the caller's k silently inflating the estimator
    window past hashes the inputs never kept."""
    if not states:
        return np.empty(0, np.uint64), False
    eff_k = min(
        [k] + [len(s) for s, t in zip(states, truncated_flags) if t and len(s)]
    )
    uq = np.unique(np.concatenate([np.asarray(s, dtype=np.uint64) for s in states]))
    truncated = any(truncated_flags)
    if truncated:
        # once in estimate mode only the eff_k smallest are meaningful
        uq = uq[:eff_k]
    elif len(uq) > k:
        # all inputs exact: the union is still the complete hash set —
        # keep it exact for THIS merge; callers that re-serialize bounded
        # state cap it themselves (see ops/stats tree merge)
        return uq, False
    return uq, truncated


def kmv_count(state: np.ndarray, truncated: bool, k: int = KMV_K_DEFAULT) -> int:
    """Distinct-count readout: exact cardinality or the KMV estimator."""
    m = len(state)
    if not truncated or m < 2:
        return m
    m = min(m, k)
    kth = float(state[m - 1]) + 1.0  # normalized k-th minimum in (0, 1]
    return int(round((m - 1) / (kth / _FULL)))


def hash_column_values(col) -> np.ndarray:
    """64-bit hashes of a ColumnData's non-null values (bit-pattern
    identity: floats hash their IEEE bits, matching ``_factorize``'s
    distinct semantics)."""
    from .xxhash64 import _xxh64_fixed, xxh64_column

    if col.ptype == "bytes":
        return xxh64_column(col.lengths, col.data)
    if col.ptype == "flba":
        w = int(col.type_length)
        n = col.num_values
        m = np.ascontiguousarray(col.data[: n * w]).reshape(n, w)
        return _xxh64_fixed(m, 0)
    v = np.ascontiguousarray(col.values)
    if v.dtype == np.bool_:
        v = v.astype(np.uint8)
    m = v.view(np.uint8).reshape(len(v), v.dtype.itemsize)
    return _xxh64_fixed(m, 0)
