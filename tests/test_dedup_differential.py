"""Randomized differential check of the dedup family against an
INDEPENDENT pure-Python reimplementation (hashlib md5, str.split) — the
ops-level analogue of the codec soak: the Spark SQL expression chains
(`split`/`element_at`/`concat_ws`/`array_min`/`conv`/`bit_count`) must
compute exactly what the operator definitions say on a seeded corpus
full of the shapes web text actually has: NULLs, empty strings, double
spaces, single-word docs, unicode, exact dups, and 1-2-word mutations.

Any divergence in tokenization (regex split semantics, trailing-empty
handling), shingle windowing (1-based element_at), hash-string
comparison (lexicographic array_min), or banding arithmetic shows up as
a set mismatch here.
"""

from __future__ import annotations

import hashlib
import random

import pytest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _shingles(text: str, k: int) -> list[str]:
    words = text.split(" ")
    if len(words) >= k:
        return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return [text]


def _minhash(text: str | None, bands: int, k: int) -> list[str | None]:
    if text is None:
        return [None] * bands
    sh = _shingles(text, k)
    return [min(_md5(f"b{b}|{s}") for s in sh) for b in range(bands)]


def _simhash(text: str | None) -> int | None:
    if text is None:
        return None
    seen = list(dict.fromkeys(text.split(" ")))
    hs = [int(_md5(w)[:15], 16) for w in seen]
    out = 0
    for b in range(60):
        votes = sum(1 if (h >> b) & 1 else -1 for h in hs)
        if votes > 0:
            out |= 1 << b
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260821)
    vocab = [f"w{i}" for i in range(40)] + ["naïve", "東京", "a.b,c!", "-", "ß"]
    rows: list[tuple[int, str | None]] = []
    for i in range(120):
        n = rng.choice([0, 1, 2, 5, 8, 12, 20])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((i, text))
    # exact duplicates
    for i in range(120, 135):
        rows.append((i, rows[rng.randrange(120)][1]))
    # near-duplicates: mutate 1-2 words of a long doc
    for i in range(135, 150):
        src = rows[rng.randrange(120)][1].split(" ")
        for _ in range(rng.choice([1, 2])):
            if src:
                src[rng.randrange(len(src))] = rng.choice(vocab)
        rows.append((i, " ".join(src)))
    # hostile shapes
    rows += [
        (150, None),
        (151, None),
        (152, ""),
        (153, " "),
        (154, "  "),
        (155, "w0  w1"),  # double space -> empty token
        (156, "w0"),
    ]
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_differential(spark, corpus):
    from parquet_go_spark.ops.dedup import exact_dedup

    got = {
        (r["fp"], r["keep_id"], r["n_dups"]) for r in exact_dedup(_df(spark, corpus)).collect()
    }
    groups: dict[str, list[int]] = {}
    nulls = []
    for i, t in corpus:
        if t is None:
            nulls.append(i)
        else:
            groups.setdefault(_md5(t), []).append(i)
    want = {(fp, min(ids), len(ids)) for fp, ids in groups.items()}
    want |= {(None, i, 1) for i in nulls}
    assert got == want


def test_minhash_signatures_differential(spark, corpus):
    from parquet_go_spark.ops.dedup import minhash_signatures

    bands, k = 4, 3
    got = {
        r["doc_id"]: [r[f"mh_{b}"] for b in range(bands)]
        for r in minhash_signatures(_df(spark, corpus), bands=bands, k=k).collect()
    }
    for i, t in corpus:
        assert got[i] == _minhash(t, bands, k), (i, t)


def test_lsh_pairs_differential(spark, corpus):
    from parquet_go_spark.ops.dedup import lsh_pairs

    bands, k, cap = 4, 3, 64
    buckets: dict[tuple[int, str], list[int]] = {}
    for i, t in corpus:
        for b, h in enumerate(_minhash(t, bands, k)):
            if h is not None:
                buckets.setdefault((b, h), []).append(i)
    want = set()
    for ids in buckets.values():
        if 2 <= len(ids) <= cap:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    want.add((ids[x], ids[y]))
    for two_pass in (False, True):
        got = {
            (r["id_a"], r["id_b"])
            for r in lsh_pairs(_df(spark, corpus), max_bucket=cap, two_pass=two_pass).collect()
        }
        assert got == want, f"two_pass={two_pass}"
    assert want, "fixture must generate candidate pairs"


def test_simhash_and_near_dups_differential(spark, corpus):
    from parquet_go_spark.ops.dedup import simhash64, simhash_near_dups

    got = {r["doc_id"]: r["simhash"] for r in simhash64(_df(spark, corpus)).collect()}
    sigs = {i: _simhash(t) for i, t in corpus}
    assert got == sigs
    want = set()
    ids = [i for i, s in sigs.items() if s is not None]
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sorted((ids[x], ids[y]))
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
    got_pairs = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dups(_df(spark, corpus), max_bucket=1_000_000).collect()
    }
    assert got_pairs == want
    assert want, "fixture must generate hamming near-dups"


def test_ngram_jaccard_differential(spark, corpus):
    from parquet_go_spark.ops.dedup import ngram_jaccard_pairs

    bands, k = 4, 3
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_df(spark, corpus), bands=bands, k=k).collect()
    }
    texts = dict(corpus)
    for (a, b), j in got.items():
        sa = set(_shingles(texts[a], k))
        sb = set(_shingles(texts[b], k))
        want = len(sa & sb) / len(sa | sb)
        assert abs(j - want) < 1e-12, (a, b, j, want)
