"""Definition-level streams for flat nullable columns.

Our input tables are flat (max definition level 1, max repetition level 0 —
see SURVEY.md §1.3), so the V1 def-level stream is exactly the validity
bitmap RLE/BP-hybrid encoded at bit width 1 with a 4-byte LE size prefix
(reference: ``encodeLevelsV1``, ``helpers.go:262-276``; rep levels are
omitted entirely when max rep level is 0, ``page_v1.go:164-169``).

``mode="bp"`` matches the reference writer byte-for-byte; ``mode="auto"``
may use RLE runs (smaller for mostly-non-null columns), still decodable by
the reference.
"""

from __future__ import annotations

import numpy as np

from . import hybrid

__all__ = ["encode_def_levels", "decode_def_levels"]


def encode_def_levels(validity: np.ndarray, mode: str = "bp") -> bytes:
    """validity: bool array (True = non-null) -> size-prefixed hybrid stream."""
    lv = validity.astype(np.uint64, copy=False)
    if mode == "bp":
        body = hybrid.encode_bp(lv, 1)
    elif mode == "rle":
        body = hybrid.encode_rle(lv, 1)
    else:
        body = hybrid.encode_auto(lv, 1)
    return hybrid.with_size_prefix(body, 1)


def decode_def_levels(buf, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """-> (validity bool array, new_pos)."""
    vals, pos = hybrid.decode_sized(buf, 1, count, pos)
    return vals.astype(bool), pos
