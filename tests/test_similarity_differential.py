"""Differential check of the exact similarity paths against numpy brute
force on a seeded random corpus — cosine_topk (exact by contract),
lsh_bucket_topk (exact within hyperplane buckets, reimplemented with
the same deterministic planes), and embedding_near_dups (lsh mode).

The approximate IVF/ADC paths are pinned cross-engine by the DuckDB
oracle (their spec IS the oracle SQL); these are the paths whose spec
is plain cosine.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.similarity import (
    cosine_topk,
    embedding_near_dups,
    hyperplanes,
    lsh_bucket_topk,
)

DIM, N = 12, 64


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(20260825)
    v = rng.standard_normal((N, DIM))
    v[7] = 0.0  # zero vector: norm guard
    v[9] = v[3] * 2.5  # exactly parallel pair: cosine 1.0
    return v


@pytest.fixture(scope="module")
def corpus(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    rows.append((N, None))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _cos_matrix(v):
    n = np.linalg.norm(v, axis=1, keepdims=True)
    vn = v / np.maximum(n, 1e-30)
    return vn @ vn.T


def test_cosine_topk_matches_brute_force(spark, corpus, vectors):
    k = 5
    qids = [0, 3, 7, 55]
    q = corpus.where(F.col("vec_id").isin(qids))
    got = {}
    for r in cosine_topk(corpus, q, k=k).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["n_id"]))
    sims = _cos_matrix(vectors)
    for qid in qids:
        s = sims[qid].copy()
        order = sorted((i for i in range(N) if i != qid), key=lambda i: (-s[i], i))
        want = [(r + 1, i) for r, i in enumerate(order[:k])]
        assert sorted(got[qid]) == want, (qid, got[qid], want)


def test_lsh_bucket_topk_matches_bucketed_brute_force(spark, corpus, vectors):
    k, n_planes, seed = 5, 8, 7
    planes = hyperplanes(DIM, n_planes, seed)
    sig = np.array(
        [sum(1 << p for p in range(n_planes) if vectors[i] @ planes[:, p] > 0) for i in range(N)]
    )
    qids = [0, 3, 55]
    q = corpus.where(F.col("vec_id").isin(qids))
    got = {}
    for r in lsh_bucket_topk(corpus, q, k=k, n_planes=n_planes, seed=seed).collect():
        got.setdefault(r["q_id"], []).append((r["rank"], r["n_id"]))
    sims = np.round(_cos_matrix(vectors), 6)
    norms = np.linalg.norm(vectors, axis=1)
    for qid in qids:
        # zero-norm corpus rows have no direction: the op filters them
        # (ANSI divide-by-zero guard), the brute force must too
        cands = [i for i in range(N) if i != qid and sig[i] == sig[qid] and norms[i] > 0]
        order = sorted(cands, key=lambda i: (-sims[qid, i], i))
        want = [(r + 1, i) for r, i in enumerate(order[:k])]
        assert sorted(got.get(qid, [])) == want, (qid, got.get(qid), want)


def test_embedding_near_dups_matches_bucketed_brute_force(spark, corpus, vectors):
    n_planes, seed, thr = 8, 7, 0.5
    planes = hyperplanes(DIM, n_planes, seed)
    sig = np.array(
        [sum(1 << p for p in range(n_planes) if vectors[i] @ planes[:, p] > 0) for i in range(N)]
    )
    sims = _cos_matrix(vectors)
    want = set()
    for a in range(N):
        for b in range(a + 1, N):
            if sig[a] == sig[b] and np.linalg.norm(vectors[a]) > 0 and np.linalg.norm(vectors[b]) > 0:
                s = round(float(sims[a, b]), 4)
                if s >= thr:
                    want.add((a, b, s))
    got = {
        (r["id_a"], r["id_b"], r["sim"])
        for r in embedding_near_dups(
            corpus, threshold=thr, n_planes=n_planes, seed=seed
        ).collect()
    }
    assert got == want
    assert (3, 9, 1.0) in want or sig[3] != sig[9]  # the parallel pair collides or not, consistently
    assert want, "fixture must produce near-dup pairs"
