"""Similarity search over an embedding column (array<float>).

``cosine_topk`` is the exact brute-force baseline: the query set is
broadcast, scoring + per-partition top-k pruning run vectorized in numpy
(BLAS matmul) inside ``mapInPandas``, and only partitions × |Q| × k
candidate rows reach the final global top-k — the shuffle is tiny at any
scale. ``lsh_bucket_topk`` is the approximate scale path: random
hyperplane signatures bucket the vectors and only same-bucket candidates
are scored.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = ["cosine_topk", "lsh_bucket_topk", "embedding_near_dups"]


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b,
    cosine >= threshold), entirely JVM-side: zip_with/aggregate dot
    products inside whole-stage codegen, norms precomputed once.

    This is the exact verifier; at corpus scale candidate generation goes
    through the random-hyperplane buckets of ``lsh_bucket_topk`` so only
    same-bucket pairs reach this scorer."""
    v = df.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> cast(x AS double))").alias("e"),
    ).withColumn(
        "nrm",
        F.expr("sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"),
    )
    a, b = v.alias("a"), v.alias("b")
    dot = "aggregate(zip_with(a.e, b.e, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    sim = F.expr(dot) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(sim, 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _collect_queries(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    rows = df.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qv = np.array([r[1] for r in rows], dtype=np.float64)
    order = np.argsort(qids)
    return qids[order], qv[order]


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against ``df``.

    Returns (q_id, n_id, rank) with rank 1..k by descending cosine,
    ties broken by ascending n_id; self-matches excluded.
    """
    qids, qv = _collect_queries(queries, id_col, vec_col)
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-30)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            nids = b[id_col].to_numpy(dtype=np.int64)
            m = np.array(list(b[vec_col]), dtype=np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = mn @ qn.T  # (batch, Q)
            kk = min(k + 1, len(nids))  # +1: self may be in the batch
            # per-query partial top-k within this partition
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                idx = top[:, j]
                out_q.append(np.full(len(idx), qids[j], dtype=np.int64))
                out_n.append(nids[idx])
                out_s.append(sims[idx, j])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "n_id": np.concatenate(out_n),
                    "sim": np.concatenate(out_s),
                }
            )

    cand = df.mapInPandas(score, schema="q_id long, n_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        cand.filter(F.col("q_id") != F.col("n_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def lsh_bucket_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH buckets, then the
    exact scorer over same-bucket candidates only. At 10^12 rows the
    bucket key becomes the shuffle/partition key and each query touches
    ~1/2^n_planes of the data."""
    qids, qv = _collect_queries(queries, id_col, vec_col)
    dim = qv.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsig = (qv @ planes > 0) @ (1 << np.arange(n_planes))
    sig_of_q = dict(zip(qids.tolist(), qsig.tolist()))
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-30)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            nids = b[id_col].to_numpy(dtype=np.int64)
            m = np.array(list(b[vec_col]), dtype=np.float64)
            sig = (m @ planes > 0) @ (1 << np.arange(n_planes))
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            frames = []
            for j, q in enumerate(qids):
                mask = sig == sig_of_q[int(q)]
                if not mask.any():
                    continue
                sims = mn[mask] @ qn[j]
                sub_n = nids[mask]
                kk = min(k + 1, len(sub_n))
                idx = np.argpartition(-sims, kk - 1)[:kk]
                frames.append(
                    pd.DataFrame({"q_id": np.full(kk, q, np.int64), "n_id": sub_n[idx], "sim": sims[idx]})
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    cand = df.mapInPandas(score, schema="q_id long, n_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        cand.filter(F.col("q_id") != F.col("n_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )
