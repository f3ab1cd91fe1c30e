"""DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY codecs, vectorized.

Reference wire formats:
  * DELTA_LENGTH (``type_bytearray.go:98-187``): one DELTA_BINARY_PACKED
    int32 stream of all lengths (blockSize=128, miniBlocks=4,
    ``type_bytearray.go:174-187``), then the concatenated raw bytes.
  * DELTA (incremental, ``type_bytearray.go:189-292``): one delta-BP int32
    stream of shared-prefix lengths vs the previous value (first value's
    prefix vs the empty string = 0, ``helpers.go:234-246``), then the
    DELTA_LENGTH encoding of the suffixes.

Columns arrive as ``(lengths, data)`` flat arrays (Arrow layout), so the
prefix computation is a single segmented numpy compare of each value
against its predecessor — no per-row Python.
"""

from __future__ import annotations

import numpy as np

from . import deltabp

__all__ = [
    "encode_delta_length",
    "decode_delta_length",
    "common_prefix_lengths",
    "encode_delta",
    "decode_delta",
    "train_zdict",
    "encode_zdict",
    "decode_zdict",
]


# --------------------------------------------------- trained-dict DEFLATE
def train_zdict(lengths: np.ndarray, data: np.ndarray, cap: int = 1 << 13) -> bytes:
    """Train a per-chunk preset dictionary for DEFLATE: up to 16
    contiguous 512-byte slices evenly spaced through the value stream
    (contiguous substrings, not strided bytes — DEFLATE matches
    substrings). The dictionary pays off on small chunks and at page
    starts, before the 32 KiB window warms up; it is the sandbox-available
    analogue of a trained zstd dictionary."""
    total = int(lengths.sum())
    if total <= cap:
        return b""  # stream smaller than a useful dict: window covers it
    n_slices = max(1, cap // 512)
    starts = np.linspace(0, total - 512, n_slices).astype(np.int64)
    return b"".join(bytes(data[s : s + 512]) for s in starts)


def encode_zdict(
    lengths: np.ndarray, data: np.ndarray, zdict: bytes = b"", level: int | None = None
) -> bytes:
    """Delta-length layout with the value bytes DEFLATE-compressed under
    an optional per-chunk trained dictionary:
      uvarint raw_len | uvarint comp_len | deflate(values, zdict)
      | delta-BP int32 lengths stream
    The codec-selector picks this when entropy coding the values beats the
    lightweight codecs even after the block-compression stage.

    ``level=None`` adapts per stream from STRIDED disjoint samples (a
    head-only probe mischose whole chunks: one unrepresentative first
    page sent a 240 MB html stream to level 6 at ~6 MB/s — 20 s for one
    chunk — while sibling chunks took level 1 at ~200 MB/s, a 30x
    bimodal task skew that sank the N->4N scaling run). Policy is
    throughput-first at scale: streams > 32 MiB always take level 1
    (level 6 on a large chunk costs seconds per task for a minority size
    win); smaller streams take level 6 only when a sampled side-by-side
    shows it saving >= 20% over level 1. The DEFLATE stream is
    self-describing, so decode never needs the choice."""
    import zlib as _z

    from .varint import uvarint

    raw = np.ascontiguousarray(data, dtype=np.uint8).tobytes()
    if level is None:
        n = len(raw)
        if n <= 1 << 16:
            level = 6  # small stream: level 6 is microseconds anyway
        elif n > 1 << 25:
            level = 1  # large chunk: the throughput path, always
        else:
            k, w = 8, 1 << 15  # 8 x 32 KiB disjoint strided samples
            step = n // k
            s = b"".join(raw[i * step : i * step + w] for i in range(k))
            level = 6 if len(_z.compress(s, 6)) <= 0.8 * len(_z.compress(s, 1)) else 1
    co = _z.compressobj(level, _z.DEFLATED, 15, 9, 0, zdict) if zdict else _z.compressobj(level)
    comp = co.compress(raw) + co.flush()
    lens = deltabp.encode(lengths.astype(np.int32, copy=False), 32)
    return bytes(uvarint(len(raw)) + uvarint(len(comp)) + comp + lens)


def decode_zdict(buf, pos: int = 0, zdict: bytes = b"") -> tuple[np.ndarray, np.ndarray, int]:
    """-> (lengths, data, new_pos)."""
    import zlib as _z

    from .varint import read_uvarint

    mv = memoryview(buf)
    raw_len, pos = read_uvarint(mv, pos)
    comp_len, pos = read_uvarint(mv, pos)
    do = _z.decompressobj(15, zdict) if zdict else _z.decompressobj()
    raw = do.decompress(bytes(mv[pos : pos + comp_len]), raw_len)
    if len(raw) != raw_len:
        raise ValueError("zdict stream truncated")
    pos += comp_len
    lengths, pos = deltabp.decode(buf, pos, 32)
    lengths = lengths.astype(np.int64)
    if int(lengths.sum()) != raw_len:
        raise ValueError("zdict length stream inconsistent")
    return lengths, np.frombuffer(raw, np.uint8), pos


def encode_delta_length(lengths: np.ndarray, data: np.ndarray) -> bytes:
    lens = deltabp.encode(lengths.astype(np.int32, copy=False), 32)
    return lens + np.ascontiguousarray(data, dtype=np.uint8).tobytes()


def decode_delta_length(buf, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (lengths, data, new_pos)."""
    lengths, pos = deltabp.decode(buf, pos, 32)
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    data = np.frombuffer(buf, np.uint8, total, pos)
    return lengths, data, pos + total


def common_prefix_lengths(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """prefix[i] = shared prefix length of value i with value i-1 (prefix[0]=0).

    Segmented compare: value i's first ``min(len[i-1], len[i])`` bytes are
    compared elementwise with value i-1's; the first mismatch position is
    found with ``np.minimum.reduceat``.
    """
    n = len(lengths)
    out = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return out
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    cmp_len = np.minimum(lengths[:-1], lengths[1:])  # for pairs (i-1, i)
    total = int(cmp_len.sum())
    if total == 0:
        return out
    seg_starts_flat = np.concatenate([[0], np.cumsum(cmp_len)[:-1]])
    within = np.arange(total) - np.repeat(seg_starts_flat, cmp_len)
    prev_idx = np.repeat(starts[:-1], cmp_len) + within
    cur_idx = np.repeat(starts[1:], cmp_len) + within
    neq = data[prev_idx] != data[cur_idx]
    # first mismatch index per segment (or cmp_len if none)
    miss = np.where(neq, within, np.iinfo(np.int64).max)
    nonempty = cmp_len > 0
    red = np.minimum.reduceat(miss, seg_starts_flat[nonempty]) if nonempty.any() else miss[:0]
    pref = cmp_len.copy()
    pref_ne = np.minimum(red, cmp_len[nonempty])
    pref[nonempty] = pref_ne
    out[1:] = pref
    return out


def encode_delta(lengths: np.ndarray, data: np.ndarray) -> bytes:
    """DELTA_BYTE_ARRAY: prefix lens (delta-BP) + suffixes (delta-length)."""
    n = len(lengths)
    if n == 0:
        return deltabp.encode(np.empty(0, np.int32), 32) + encode_delta_length(
            np.empty(0, np.int64), np.empty(0, np.uint8)
        )
    prefixes = common_prefix_lengths(lengths, data)
    suffix_lens = lengths - prefixes
    # gather suffix bytes
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    total = int(suffix_lens.sum())
    src = np.repeat(starts + prefixes, suffix_lens) + (
        np.arange(total)
        - np.repeat(np.concatenate([[0], np.cumsum(suffix_lens)[:-1]]), suffix_lens)
    )
    suffix_data = data[src] if total else np.empty(0, dtype=np.uint8)
    head = deltabp.encode(prefixes.astype(np.int32), 32)
    return head + encode_delta_length(suffix_lens, suffix_data)


def decode_delta(buf, pos: int = 0) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (lengths, data, new_pos). Sequential prefix chains resolved in
    O(n) total work by materializing values front-to-back per "carry depth"
    is unnecessary: each output byte is either copied from the suffix
    stream or transitively from an earlier suffix byte. We resolve the
    indirection with pointer-chasing over at most ``log2(n)`` rounds."""
    prefixes, pos = deltabp.decode(buf, pos, 32)
    prefixes = prefixes.astype(np.int64)
    suffix_lens, suffix_data, pos = decode_delta_length(buf, pos)
    n = len(prefixes)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint8), pos
    if len(suffix_lens) != n:
        raise ValueError("delta byte array: prefix/suffix count mismatch")
    lengths = prefixes + suffix_lens
    out_starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    total = int(lengths.sum())
    # source index per output byte: suffix bytes map to the suffix stream,
    # prefix bytes map to the previous value's bytes (same offset).
    src = np.empty(total, dtype=np.int64)  # index into `out` (negative-1 means filled)
    filled = np.zeros(total, dtype=bool)
    out = np.empty(total, dtype=np.uint8)
    # fill suffix bytes directly
    suf_src = np.concatenate([[0], np.cumsum(suffix_lens)[:-1]])
    tgt = np.repeat(out_starts + prefixes, suffix_lens) + (
        np.arange(int(suffix_lens.sum())) - np.repeat(suf_src, suffix_lens)
    )
    out[tgt] = suffix_data
    filled[tgt] = True
    # prefix bytes point at previous value's identical offset
    prev_starts = np.concatenate([[0], out_starts[:-1]])
    ptgt = np.repeat(out_starts, prefixes) + (
        np.arange(int(prefixes.sum())) - np.repeat(np.concatenate([[0], np.cumsum(prefixes)[:-1]]), prefixes)
    )
    within = ptgt - np.repeat(out_starts, prefixes)
    src[ptgt] = np.repeat(prev_starts, prefixes) + within
    # resolve pointer chains to their suffix-byte roots by jump doubling:
    # chain depth halves every round -> log2(max depth) passes.
    pending = ptgt
    while len(pending):
        hop = src[pending]
        not_root = ~filled[hop]
        if not not_root.any():
            break
        upd = pending[not_root]
        src[upd] = src[hop[not_root]]
        pending = upd
    if len(ptgt):
        out[ptgt] = out[src[ptgt]]
    return lengths, out, pos
