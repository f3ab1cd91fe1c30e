"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md
§F1, the BASELINE.json ``input_hint`` shape): columns
(url string, warc_ts timestamp, html binary, text string, lang string).

Generated distributed: a range DataFrame is mapped through a seeded
``mapInPandas`` generator, so any scale is produced without driver-side
materialization and every row is a pure function of its row id (seed=42) —
the same rows at any parallelism.
"""

from __future__ import annotations

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


def _vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(1234)
        sizes = rng.integers(2, 12, size=10000)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        _VOCAB = np.array(["".join(rng.choice(letters, s)) for s in sizes], dtype=object)
    return _VOCAB


def _gen_block(ids: np.ndarray) -> pd.DataFrame:
    """Rows for the given global row ids (pure function of id, seed 42)."""
    n = len(ids)
    out = {}
    # one independent stream per row id -> parallelism-invariant rows
    rng = np.random.default_rng(42)
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
    # text: words from the vocab; 5% null; length varies 50-2000 chars
    vocab = _vocab()
    tlen = 8 + (ids * 69069 % 192)
    texts = []
    word_idx = (ids[:, None] * 2246822519 + np.arange(200)[None, :] * 2654435761) % len(vocab)
    for i in range(n):
        texts.append(" ".join(vocab[word_idx[i, : tlen[i]]]))
    text = pd.Series(texts, dtype=object)
    text[ids % 20 == 7] = None
    out["text"] = text
    # html: pseudo-markup bytes, 2% null, 0.5-8KiB
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
    out["lang"] = pd.Series(_LANGS[(ids // 64) % len(_LANGS)])
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
