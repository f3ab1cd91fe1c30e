"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
polynomial rolling hashes of character k-grams, then the minimum hash of
every w-window is selected — guaranteeing any shared substring of length
>= k + w - 1 produces a shared fingerprint. The standard local-similarity
/ plagiarism-detection fingerprint for web-scale corpora.

Vectorized: sliding_window_view @ power-vector for the rolling hashes
(one matmul), sliding-window minima the same way; per-row boundaries via
the flat (lengths, data) layout. Spark wrapper is an Arrow-batched
mapInPandas yielding (doc_id, pos, fp) rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["winnow_bytes", "winnowing_fingerprints", "duplicate_spans", "contamination"]

_B = np.uint64(1000003)
_MASK = np.uint64((1 << 61) - 1)


def winnow_bytes(data: np.ndarray, k: int = 8, w: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """-> (positions, fingerprints) for one document (uint8 array).

    Winnowing rule: rightmost minimal hash per window, consecutive
    duplicates collapsed."""
    n = len(data)
    if n < k:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    powers = np.array([int(_B) ** (k - 1 - j) % (1 << 61) for j in range(k)], dtype=np.uint64)
    grams = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    hashes = (grams * powers[None, :]).sum(axis=1) & _MASK
    m = len(hashes)
    if m <= w:
        i = int(np.flatnonzero(hashes == hashes.min())[-1])
        return np.array([i], np.int64), hashes[[i]]
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost position of the min in each window
    rev_arg = w - 1 - np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(win)) + rev_arg
    sel = np.ones(len(pos), dtype=bool)
    sel[1:] = pos[1:] != pos[:-1]
    pos = pos[sel]
    return pos.astype(np.int64), hashes[pos]


def winnowing_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8, w: int = 16
) -> DataFrame:
    """(id, pos, fp): selected fingerprints per document (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, poss, fps = [], [], []
            for i, t in zip(b[id_col], b[text_col]):
                # a fingerprint without a document id is unusable, and a
                # null id (nullable long, e.g. from an outer join
                # upstream) would crash np.full(..., None, dtype=int64)
                # inside the executor — skip the row like null text
                if t is None or i is None or (isinstance(i, float) and np.isnan(i)):
                    continue
                data = np.frombuffer(t.encode() if isinstance(t, str) else bytes(t), np.uint8)
                p, h = winnow_bytes(data, k, w)
                ids.append(np.full(len(p), i, dtype=np.int64))
                poss.append(p)
                fps.append(h.astype(np.int64) & np.int64((1 << 62) - 1))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(ids),
                        "pos": np.concatenate(poss),
                        "fp": np.concatenate(fps),
                    }
                )

    return df.select(id_col, text_col).mapInPandas(run, schema=f"`{id_col}` long, pos long, fp long")


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
    gap: int = 64,
    min_len: int = 32,
) -> DataFrame:
    """Cross-document duplicated SPANS (the span-granular complement to
    doc-level dedup — "Deduplicating Training Data Makes Language
    Models Better", Lee et al., ACL'22, approximated with winnowing
    instead of a suffix array): any substring of length >= k + w - 1
    shared by two documents shares a winnowing fingerprint REGARDLESS
    OF ALIGNMENT (the SIGMOD'03 guarantee), so fingerprints seen in
    >= 2 distinct documents mark duplicated regions, and per document
    the marked positions within ``gap`` bytes of each other merge into
    one span. Returns (id, span_start, span_end, span_len, n_fps) for
    spans with span_len >= ``min_len``; span_end is exclusive and
    extends k-1 bytes past the last fingerprinted gram.

    Plan shape: the fingerprint projection (the dominant CPU cost —
    rolling hashes + window minima over every document) runs ONCE and
    never shuffles the corpus; "seen in >= 2 distinct documents" is
    min(doc) != max(doc) over a fp-keyed window — O(1) state per key,
    ONE exchange over fingerprint rows, and no second execution of the
    fingerprint UDF (the previous distinct+count+semi-join shape
    re-ran it on the probe side and cost three exchanges). A pathological
    fingerprint shared by a large fraction of the corpus concentrates its
    rows in one window partition, but the semi-join shape hashed equal
    keys to one task all the same; span merging is one doc-keyed window
    (lag + running flag sum) plus the final per-span aggregate. Every
    exchange is over fingerprint rows (~bytes / (w/2) of the corpus),
    never documents.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    fps = winnowing_fingerprints(df, text_col=text_col, id_col=id_col, k=k, w=w)
    wfp = Window.partitionBy("fp")
    marked = (
        fps.withColumn(
            "__dup", F.min(id_col).over(wfp) != F.max(id_col).over(wfp)
        )
        .filter(F.col("__dup"))
        .drop("__dup")
    )
    wo = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        marked.withColumn("prev", F.lag("pos").over(wo))
        .withColumn(
            "new_span",
            (F.col("prev").isNull() | (F.col("pos") - F.col("prev") > gap)).cast("long"),
        )
        .withColumn("span_id", F.sum("new_span").over(wo))
        .groupBy(id_col, "span_id")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).alias("span_end"),
            F.count(F.lit(1)).alias("n_fps"),
        )
        .withColumn("span_len", F.col("span_end") - F.col("span_start"))
        .filter(F.col("span_len") >= min_len)
        .select(id_col, "span_start", "span_end", "span_len", "n_fps")
    )
    return spans


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/FLAN-style n-gram overlap
    check, winnowing-based): flag corpus documents sharing fingerprinted
    substrings with a benchmark/eval set, so training data can be
    scrubbed of test material. Any shared substring of length >=
    k + w - 1 is guaranteed a shared fingerprint (SIGMOD'03), so recall
    is structural, not sampled.

    Returns (id, bench_id, n_shared_fps) for corpus docs sharing >=
    ``min_hits`` fingerprints with a benchmark doc.

    Scale shape: the benchmark side (eval sets are KBs-MBs) fingerprints
    into a tiny frame that BROADCASTS; the corpus fingerprint projection
    never shuffles; matches aggregate per (corpus doc, bench doc) with
    map-side combine. A corpus row's cost is its own fingerprints; the
    benchmark never re-scans the corpus."""
    from pyspark.sql import functions as F

    cfps = winnowing_fingerprints(corpus, text_col=text_col, id_col=id_col, k=k, w=w)
    bfps = (
        winnowing_fingerprints(benchmark, text_col=text_col, id_col=bench_id_col, k=k, w=w)
        .select(F.col(bench_id_col).alias("bench_id"), "fp")
        .distinct()
    )
    return (
        cfps.join(F.broadcast(bfps), "fp")
        .groupBy(id_col, "bench_id")
        .agg(F.countDistinct("fp").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_hits)
    )
