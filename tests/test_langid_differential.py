"""Differential check of langid_ngram against a pure-Python
reimplementation of the same Cavnar-Trenkle profile scheme — bigram
extraction (code-point pairs, matching Spark's split('') semantics:
no trailing empty, '' -> ['']), per-language top-N profiles ranked by
(-count, bigram asc), rank-weighted overlap scores over DISTINCT doc
bigrams, ties to the smallest language, and the one-row-per-document
contract including unclassifiable docs (NULL prediction).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from parquet_go_spark.ops.text import langid_ngram

TOP = 40
PROFILE_DOCS = 2000


def _bigrams(text: str) -> list[str]:
    lt = text.lower()
    return [lt[i : i + 2] for i in range(len(lt) - 1)]


def _langid_py(rows, top_ngrams=TOP, profile_docs=PROFILE_DOCS):
    counts: dict[str, Counter] = {}
    for i, text, lang in rows:
        if i < profile_docs and text is not None and lang is not None:
            counts.setdefault(lang, Counter()).update(_bigrams(text))
    langs = sorted(
        {lang for i, _t, lang in rows if i < profile_docs and lang is not None}
    )
    profiles: dict[str, dict[str, int]] = {}
    for lang in langs:
        ranked = sorted(counts.get(lang, Counter()).items(), key=lambda kv: (-kv[1], kv[0]))
        profiles[lang] = {bg: r + 1 for r, (bg, _c) in enumerate(ranked[:top_ngrams])}
    out = {}
    for i, text, lang in rows:
        scores = {l: 0 for l in langs}
        if text is not None:
            for bg in set(_bigrams(text)):
                for l in langs:
                    r = profiles[l].get(bg)
                    if r is not None:
                        scores[l] += top_ngrams + 1 - r
        best_lang, best_score = None, 0
        for l in langs:  # sorted: ties to smallest language
            if scores[l] > best_score:
                best_lang, best_score = l, scores[l]
        pred = best_lang if best_score > 0 else None
        correct = None if pred is None or lang is None else pred == lang
        out[i] = (lang, pred, correct)
    return out


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260824)
    aa_words = ["aardvark", "banana", "cascade", "adamant", "alabama"]
    bb_words = ["zyzzyva", "quizzed", "puzzle", "buzzing", "jazzy"]
    rows: list[tuple[int, str | None, str | None]] = []
    for i in range(60):
        if i % 2 == 0:
            text = " ".join(rng.choice(aa_words) for _ in range(rng.randrange(3, 10)))
            rows.append((i, text, "aa"))
        else:
            text = " ".join(rng.choice(bb_words) for _ in range(rng.randrange(3, 10)))
            rows.append((i, text, "bb"))
    rows += [
        (60, None, "aa"),        # null text -> NULL prediction, never dropped
        (61, "", "bb"),          # empty text -> no bigrams -> NULL prediction
        (62, "x", "aa"),         # single char -> no bigrams
        (64, "banana cascade", None),   # null label: predicted, correct NULL
        # ids above PROFILE_DOCS: classified but never profiled — incl.
        # a foreign-script doc that must NOT self-profile (a sample-range
        # id would add its own bigrams to its label's profile and
        # "classify" itself; both engines agree that is how the
        # algorithm behaves, so the unclassifiable case needs an id
        # outside the profile window)
        (3000, "banana adamant alabama", "aa"),
        (3001, "puzzle buzzing jazzy", "bb"),
        (3002, "東京 大阪 名古屋", "aa"),
    ]
    return rows


def test_langid_differential(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["lang"], r["lang_pred"], r["correct"])
        for r in langid_ngram(df).collect()
    }
    want = _langid_py(corpus)
    assert set(got) == set(want)  # one row per input document
    mismatches = {i: (got[i], want[i]) for i in want if got[i] != want[i]}
    assert not mismatches, dict(list(mismatches.items())[:5])
    # the fixture exercises every contract branch
    assert got[60][1] is None and got[61][1] is None and got[3002][1] is None
    assert got[64][1] is not None and got[64][2] is None
    assert got[3000] == ("aa", "aa", True) and got[3001] == ("bb", "bb", True)
