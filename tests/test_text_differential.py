"""Randomized differential check of the text-analysis family against an
independent pure-Python reimplementation — companion to
``test_dedup_differential.py``: the oracle replica pins these ops
against DuckDB on the driver corpus, this suite pins them against a
THIRD implementation on hostile shapes the fixture corpus may lack
(NULLs, empty strings, bare/double spaces, unicode, punctuation soup,
keyword stuffing, template repetition).
"""

from __future__ import annotations

import hashlib
import math
import random
import re

import pytest

from parquet_go_spark.ops.dedup import hash_split
from parquet_go_spark.ops.text import STOPWORDS, fingerprint, repetition_signals, text_quality, token_stats


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260822)
    vocab = [f"w{i}" for i in range(30)] + ["the", "a", "of", "naïve", "東京", "x.y,z!", "HELLO", "123", "?!?"]
    rows: list[tuple[int, str | None]] = []
    for i in range(100):
        n = rng.choice([0, 1, 2, 3, 7, 15, 40])
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    rows += [
        (100, None),
        (101, ""),
        (102, " "),
        (103, "  "),
        (104, "w0  w1"),
        (105, "....!!??;;;"),
        (106, "stuff " * 50),  # trailing space + heavy repetition
        (107, "one two three one two three one two three"),
    ]
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _close(a, b, tol=1e-6):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and (math.isnan(a) or math.isnan(b)):
        return math.isnan(a) and math.isnan(b)
    return abs(a - b) <= tol


def test_token_stats_differential(spark, corpus):
    got = {r["doc_id"]: r for r in token_stats(_df(spark, corpus)).collect()}
    for i, t in corpus:
        r = got[i]
        if t is None:
            assert r["n_chars"] is None and r["n_tokens"] is None
            assert r["avg_token_len"] is None and r["n_word_tokens"] is None
            continue
        n_chars = len(t)
        n_tokens = n_chars - len(t.replace(" ", "")) + 1
        assert r["n_chars"] == n_chars and r["n_tokens"] == n_tokens, (i, t)
        assert _close(r["avg_token_len"], (n_chars - n_tokens + 1) / n_tokens)
        assert r["n_word_tokens"] == len(re.findall("[a-zA-Z0-9]+", t)), (i, t)


def test_text_quality_differential(spark, corpus):
    got = {r["doc_id"]: r for r in text_quality(_df(spark, corpus)).collect()}
    for i, t in corpus:
        r = got[i]
        if t is None:
            assert r["n_tokens"] is None and r["low_quality"] is None
            continue
        words = t.split(" ")
        n_tokens = len(words)
        n_types = len(set(words))
        ttr = n_types / n_tokens
        punct = len(re.findall("[.,;:!?]", t)) / max(len(t), 1)
        stop = sum(1 for w in words if w in STOPWORDS) / n_tokens
        assert r["n_tokens"] == n_tokens and r["n_types"] == n_types, (i, t)
        assert _close(r["ttr"], ttr) and _close(r["punct_ratio"], punct), (i, t)
        assert _close(r["stop_ratio"], stop), (i, t)
        assert r["low_quality"] == (ttr < 0.3 or punct > 0.1 or stop == 0.0), (i, t)


def test_fingerprint_differential(spark, corpus):
    got = {r["doc_id"]: r for r in fingerprint(_df(spark, corpus)).collect()}
    for i, t in corpus:
        r = got[i]
        if t is None:
            assert r["fp"] is None and r["fp60"] is None
            continue
        fp = _md5(t)
        assert r["fp"] == fp and r["fp60"] == int(fp[:15], 16), (i, t)


def test_hash_split_differential(spark, corpus):
    fr = {"train": 0.9, "val": 0.07, "test": 0.03}
    got = {r["doc_id"]: r["split"] for r in hash_split(_df(spark, corpus), fractions=fr).collect()}
    space = float(1 << 60)
    for i, _t in corpus:
        h = int(_md5(f"pgs-split-v1:{i}")[:15], 16)
        if h < int(0.9 * space):
            want = "train"
        elif h < int(0.97 * space):
            want = "val"
        else:
            want = "test"
        assert got[i] == want, (i, h)


def test_repetition_signals_differential(spark, corpus):
    got = {r["doc_id"]: r for r in repetition_signals(_df(spark, corpus)).collect()}
    for i, t in corpus:
        if t is None:
            assert i not in got  # null text filtered by contract
            continue
        r = got[i]
        words = [w for w in t.split(" ") if w != ""]
        n = len(words)
        grams = [" ".join(words[j : j + 3]) for j in range(n - 2)] if n >= 3 else []
        dup = (len(grams) - len(set(grams))) / len(grams) if grams else 0.0
        cov = max((words.count(w) for w in set(words)), default=0) / n if n else 0.0
        mwl = sum(len(w) for w in words) / n if n else 0.0
        assert r["n_words"] == n, (i, t)
        assert _close(r["dup_3gram_frac"], dup) and _close(r["top_word_cov"], cov), (i, t)
        assert _close(r["mean_word_len"], mwl), (i, t)
        assert r["repetitive"] == (dup > 0.2 or cov > 0.3), (i, t)
