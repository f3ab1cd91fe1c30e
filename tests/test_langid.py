"""Language-ID discrimination: on a corpus whose languages have distinct
character distributions, the bigram-profile classifier must actually
discriminate (round-1 verdict: the synthetic driver corpus is
language-independent by construction, so `correct` there measures only
determinism — this fixture measures accuracy)."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.ops.text import langid_ngram

pytestmark = pytest.mark.spark

# three fake languages with disjoint-ish letter inventories and their own
# function words — crude but matches how real languages differ in bigram
# statistics
_VOCAB = {
    "aa": ["the", "and", "that", "with", "have", "this", "there", "water", "little"],
    "bb": ["zum", "und", "sich", "nicht", "durch", "zwischen", "wurde", "uber", "konnen"],
    "cc": ["ilo", "pona", "toki", "mute", "sina", "kama", "tenpo", "lukin", "wile"],
}


def _corpus(n_per_lang: int = 120, seed: int = 4):
    rng = np.random.default_rng(seed)
    rows = []
    i = 0
    for lang, vocab in _VOCAB.items():
        for _ in range(n_per_lang):
            words = rng.choice(vocab, size=int(rng.integers(20, 60)))
            rows.append((i, " ".join(words.tolist()), lang))
            i += 1
    rng.shuffle(rows)
    # reassign ids so the profile sample (doc_id < N) spans all languages
    return [(j, t, l) for j, (_, t, l) in enumerate(rows)]


def test_langid_discriminates(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string, lang string")
    out = langid_ngram(df, profile_docs=180).toPandas()
    assert len(out) == 360
    acc = out["correct"].mean()
    assert acc > 0.95, f"accuracy {acc} — classifier is not discriminating"
    # every language is both predicted and represented
    assert set(out["lang_pred"].unique()) == set(_VOCAB)


def test_langid_deterministic(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string, lang string")
    a = langid_ngram(df, profile_docs=180).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = langid_ngram(df, profile_docs=180).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
