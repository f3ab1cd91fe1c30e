"""The synthetic pages corpus must carry real linguistic signal: per-language
character distributions (langid accuracy, not just determinism), English
function words (stop_ratio > 0), and punctuation — the round-1 corpus was
language-independent by construction (VERDICT r1, "What's wrong" #6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.text import STOPWORDS, langid_ngram, text_quality
from parquet_go_spark.spark.pages_table import _gen_block, pages_df, pages_pandas

pytestmark = pytest.mark.spark


def _with_id(df):
    # the generator row id rides in the url tail ("...-<id>")
    return df.withColumn("doc_id", F.regexp_extract("url", "-([0-9]+)$", 1).cast("long"))


def test_block_generation_is_parallelism_invariant():
    a = _gen_block(np.arange(100, 200)).reset_index(drop=True)
    b = pages_pandas(200).iloc[100:200].reset_index(drop=True)
    assert a.equals(b)


def test_pages_langid_accuracy(spark):
    df = _with_id(pages_df(spark, 4096))
    out = langid_ngram(df, profile_docs=2048).toPandas()
    acc = out["correct"].mean()
    assert acc > 0.9, f"langid accuracy {acc} on the pages corpus"
    # the corpus exposes (nearly) all 30 language slots to the classifier
    assert out["lang_pred"].nunique() >= 25


def test_pages_quality_signals_meaningful(spark):
    df = _with_id(pages_df(spark, 2000)).filter("text is not null")
    q = text_quality(df).toPandas()
    langs = pages_pandas(2000)
    en_ids = set(langs.index[(langs["lang"] == "en") & langs["text"].notna()])
    en = q[q["doc_id"].isin(en_ids)]
    assert en["stop_ratio"].mean() > 0.2  # ~1/3 function-word positions
    # short docs may draw no punctuation positions (idx % 9) — most do
    assert (q["punct_ratio"] > 0).mean() > 0.8


def test_en_stopwords_match_quality_list():
    # the generator's English function words ARE the scorer's stopword list
    from parquet_go_spark.spark.pages_table import _STOP_EN

    assert set(_STOP_EN.tolist()) == set(STOPWORDS)


def test_lang_vocab_pinned_against_numpy_bitstream_drift():
    """ADVICE r2: _lang_vocabs draws from np.random distribution methods
    (dirichlet/choice/integers) whose bit-streams are not guaranteed
    stable across NumPy versions, unlike _gen_block's pure integer
    arithmetic. Pin the generated vocabulary with a checksum so an
    upgrade that silently changes the corpus fails HERE, loudly,
    instead of invalidating recorded baselines/fixture hashes.
    Recorded under numpy 1.26.4 (see FIXTURES.md §F1)."""
    import zlib

    from parquet_go_spark.spark.pages_table import _lang_vocabs

    v = _lang_vocabs()
    acc = 0
    for lang in sorted(v):
        stops, words = v[lang]
        acc = zlib.crc32(("|".join(stops.tolist()) + "#" + "|".join(words.tolist())).encode(), acc)
    assert acc == 1460732147, (
        "per-language vocabulary changed — NumPy bit-stream drift; "
        "re-baseline BENCH/size numbers and update this pin"
    )
