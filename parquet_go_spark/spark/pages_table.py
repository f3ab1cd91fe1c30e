"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md
§F1, the BASELINE.json ``input_hint`` shape): columns
(url string, warc_ts timestamp, html binary, text string, lang string).

Generated distributed: a range DataFrame is mapped through a seeded
``mapInPandas`` generator, so any scale is produced without driver-side
materialization and every row is a pure function of its row id (seed=42) —
the same rows at any parallelism.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_LANGS = np.array(
    "en en en en en de fr es zh ru pt ja it nl pl tr ar ko sv cs da fi el he hi id no ro th uk vi".split()
)
_VOCAB = None

# English function words — kept identical to ops.text.STOPWORDS so the
# quality-scoring stop_ratio measures something real on this corpus.
_STOP_EN = np.array(
    ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"], dtype=object
)
_LANG_VOCABS: dict[str, tuple[np.ndarray, np.ndarray]] | None = None


def _vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(1234)
        sizes = rng.integers(2, 12, size=10000)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        _VOCAB = np.array(["".join(rng.choice(letters, s)) for s in sizes], dtype=object)
    return _VOCAB


def _lang_vocabs() -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Per-language (stopwords, content words), each language drawing its
    letters from its own sharply-skewed distribution — so character-bigram
    statistics discriminate languages (like real web text; the round-1
    corpus was language-independent, making langid accuracy chance and
    stop_ratio identically 0). Seeded by crc32(lang): process- and
    parallelism-invariant (never Python ``hash``, which is salted)."""
    global _LANG_VOCABS
    if _LANG_VOCABS is None:
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        vocabs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for lang in sorted(set(_LANGS.tolist())):
            rng = np.random.default_rng(zlib.crc32(lang.encode()))
            p = rng.dirichlet(np.full(26, 0.25))  # sharp per-lang letter skew
            sizes = rng.integers(2, 12, size=244)
            words = np.array(
                ["".join(rng.choice(letters, s, p=p)) for s in sizes], dtype=object
            )
            if lang == "en":
                stops = _STOP_EN
            else:
                stops = np.array(
                    ["".join(rng.choice(letters, rng.integers(2, 5), p=p)) for _ in range(10)],
                    dtype=object,
                )
            vocabs[lang] = (stops, words)
        _LANG_VOCABS = vocabs
    return _LANG_VOCABS


def _gen_block(ids: np.ndarray) -> pd.DataFrame:
    """Rows for the given global row ids (pure function of id, seed 42)."""
    n = len(ids)
    out = {}
    # rows are PURE integer arithmetic on ids -> parallelism-invariant
    # domain: Zipf-ish over ~1000 domains; top domain ~20% (skew for salting)
    z = (ids * 2654435761 % 2**32) / 2**32  # deterministic uniform per id
    dom = np.minimum((1.0 / np.maximum(z, 1e-9)) ** 0.6, 1000).astype(np.int64) % 1000
    path_a = ids * 48271 % 997
    path_b = ids * 16807 % 9973
    out["url"] = pd.Series(
        np.char.add(
            np.char.add(
                np.char.add("https://site", dom.astype(str)),
                np.char.add(".example.com/sec/", path_a.astype(str)),
            ),
            np.char.add(np.char.add("/p", path_b.astype(str)), np.char.add("-", ids.astype(str))),
        )
    )
    # warc_ts: base + mostly-monotonic in id with occasional backward jumps
    base = 1_650_000_000_000_000
    jitter = ((ids * 1103515245 + 12345) % 3_600_000_000).astype(np.int64)
    back = np.where(ids % 97 == 0, -7_200_000_000, 0)
    ts = base + ids * 1_000_000 + jitter + back
    out["warc_ts"] = pd.Series(pd.to_datetime(ts, unit="us"))
    # text: per-language words (lang-specific letter skew), every 3rd
    # token a function word (~33%, web-text-like), light punctuation;
    # 5% null; same length/null pattern as round 1
    lang_arr = _LANGS[(ids // 64) % len(_LANGS)]
    vocabs = _lang_vocabs()
    tlen = 8 + (ids * 69069 % 192)
    texts = []
    word_idx = (ids[:, None] * 2246822519 + np.arange(200)[None, :] * 2654435761) % (1 << 31)
    for i in range(n):
        stops, words = vocabs[lang_arr[i]]
        idx = word_idx[i, : tlen[i]]
        toks = words[idx % len(words)].astype("U16")
        spos = np.arange(len(idx)) % 3 == 2
        toks[spos] = stops[idx[spos] % len(stops)]
        pm = idx % 9 == 0
        if pm.any():
            toks[pm] = np.char.add(toks[pm], np.where(idx[pm] % 2 == 0, ".", ","))
        texts.append(" ".join(toks.tolist()))
    text = pd.Series(texts, dtype=object)
    text[ids % 20 == 7] = None
    out["text"] = text
    # html: pseudo-markup bytes, 2% null, 0.5-8KiB
    vocab = _vocab()
    hlen = 512 + (ids * 40503 % 7680)
    htmls = []
    tag = b"<div class='c%d'>"
    for i in range(n):
        rid = int(ids[i])
        body = (tag % (rid % 89)) + (vocab[rid % len(vocab)].encode() + b" ") * (int(hlen[i]) // 12)
        htmls.append(body[: int(hlen[i])])
    html = pd.Series(htmls, dtype=object)
    html[ids % 50 == 3] = None
    out["html"] = html
    # lang: clustered runs of ~64 rows (sorted-ish within partitions)
    out["lang"] = pd.Series(lang_arr)
    return pd.DataFrame(out)[["url", "warc_ts", "html", "text", "lang"]]


def pages_df(spark: SparkSession, num_rows: int, partitions: int | None = None) -> DataFrame:
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)
    rng_df = spark.range(0, num_rows, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield _gen_block(ids)

    return rng_df.mapInPandas(gen, schema=SCHEMA)


def pages_pandas(num_rows: int) -> pd.DataFrame:
    """Driver-side tiny fixture for unit tests."""
    return _gen_block(np.arange(num_rows, dtype=np.int64))


def pages_arrow(num_rows: int) -> pa.Table:
    df = pages_pandas(num_rows)
    return pa.Table.from_pandas(df, preserve_index=False)
