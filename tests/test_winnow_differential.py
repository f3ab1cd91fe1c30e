"""Differential check of the winnowing kernel against an independent
pure-Python implementation — the numpy striding tricks in
``winnow_bytes`` (sliding_window_view hashes, reversed-argmin
rightmost-min selection, consecutive-duplicate collapse) are exactly
the kind of vectorization that silently drifts from the spec at
boundaries (n < k, m == w, all-equal hashes, wrap-around arithmetic).
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from parquet_go_spark.ops.winnow import winnow_bytes

_B = 1000003
_M61 = (1 << 61) - 1
_M64 = 1 << 64


def _winnow_py(data: bytes, k: int, w: int) -> tuple[list[int], list[int]]:
    """Spec implementation: rolling hash with numpy-uint64 wrap
    semantics, rightmost minimal hash per w-window, consecutive
    duplicates collapsed."""
    n = len(data)
    if n < k:
        return [], []
    powers = [pow(_B, k - 1 - j, 1 << 61) for j in range(k)]
    hashes = []
    for i in range(n - k + 1):
        total = 0
        for j in range(k):
            total = (total + (data[i + j] * powers[j]) % _M64) % _M64
        hashes.append(total & _M61)
    m = len(hashes)
    if m <= w:
        mn = min(hashes)
        i = max(j for j, h in enumerate(hashes) if h == mn)
        return [i], [hashes[i]]
    pos_out = []
    for start in range(m - w + 1):
        window = hashes[start : start + w]
        mn = min(window)
        i = start + max(j for j, h in enumerate(window) if h == mn)
        if not pos_out or pos_out[-1] != i:
            pos_out.append(i)
    return pos_out, [hashes[i] for i in pos_out]


@pytest.mark.parametrize("k,w", [(8, 16), (4, 5), (3, 2), (2, 1), (5, 50)])
def test_winnow_bytes_differential_random(k, w):
    rng = random.Random(k * 1000 + w)
    shapes = [0, 1, k - 1, k, k + 1, k + w - 2, k + w - 1, k + w, 37, 120, 400]
    for n in shapes:
        for alphabet in (256, 4, 1):  # incl. tiny alphabets -> hash ties
            data = bytes(rng.randrange(alphabet) for _ in range(n))
            want_p, want_h = _winnow_py(data, k, w)
            got_p, got_h = winnow_bytes(np.frombuffer(data, np.uint8), k, w)
            assert list(got_p) == want_p, (k, w, n, alphabet, data.hex())
            assert [int(x) for x in got_h] == want_h, (k, w, n, alphabet)


def test_winnow_all_equal_bytes_collapse():
    """An all-equal document has ONE distinct gram hash: every window's
    rightmost min advances each step, so positions must still be
    strictly increasing and deduplicated."""
    data = np.frombuffer(b"a" * 100, np.uint8)
    pos, fps = winnow_bytes(data, 8, 16)
    assert list(pos) == sorted(set(int(p) for p in pos))
    assert len(set(int(f) for f in fps)) == 1


def test_shared_substring_guarantee(spark):
    """SIGMOD'03 property through the full Spark op: any substring of
    length >= k + w - 1 shared by two documents yields a shared
    fingerprint, so duplicate_spans must flag a span in BOTH docs
    covering the planted region."""
    from parquet_go_spark.ops.winnow import duplicate_spans

    k, w = 8, 16
    shared = "this exact sentence is long enough to clear the winnowing window bound"
    assert len(shared) >= k + w - 1
    rng = random.Random(7)

    def noise(n):
        return "".join(rng.choice("qwertyuiopasdfghjklzxcvbnm QWERTY0123") for _ in range(n))

    rows = [
        (1, noise(200) + shared + noise(180)),
        (2, noise(150) + shared + noise(230)),
        (3, noise(400)),  # no planted overlap
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = duplicate_spans(df, k=k, w=w, gap=64, min_len=16).collect()
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for doc, lo in ((1, 200), (2, 150)):
        hits = [s for s in by_doc.get(doc, []) if s[0] < lo + len(shared) and s[1] > lo]
        assert hits, (doc, by_doc)
