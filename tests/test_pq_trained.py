"""The deterministic PQ trainer behind the embedding_pq_trained driver
row: the Spark-side and pyarrow-side sample loaders must produce the
same float64 matrix, the trainer must be bit-reproducible (that is the
whole cross-engine-oracle contract), and trained codebooks must lift
ADC recall over the seeded random codebook on the real fixture."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.ops.similarity import (
    pq_codebooks,
    pq_sample_parquet,
    pq_topk,
    train_ivf_sample,
    train_pq_sample,
)

pytestmark = pytest.mark.spark

SF = "/root/testdata/sf0.001"


def test_sample_loaders_identical(spark):
    from parquet_go_spark.ops.similarity import pq_sample_spark

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    s_spark = pq_sample_spark(emb)
    s_pa = pq_sample_parquet(f"{SF}/embeddings.parquet")
    assert s_spark.dtype == s_pa.dtype == np.float64
    assert np.array_equal(s_spark, s_pa)  # bit-identical, not just close


def test_trainer_deterministic_and_shaped():
    s = pq_sample_parquet(f"{SF}/embeddings.parquet")
    a = train_pq_sample(s)
    b = train_pq_sample(s.copy())
    assert a.shape == (8, 8, 16)
    assert np.array_equal(a, b)
    # 6-decimal parity rounding (the cross-engine literal contract)
    assert np.array_equal(a, np.round(a, 6))
    # trained centers actually moved off the seeded codebook
    assert not np.array_equal(a, pq_codebooks(64, 8, 16, 17))


def test_trainer_pads_small_sample():
    rng = np.random.default_rng(3)
    s = rng.standard_normal((5, 64))  # fewer rows than n_codes=16
    cb = train_pq_sample(s)
    assert cb.shape == (8, 8, 16)
    # tail codes fall back to the seeded codebook
    assert np.array_equal(cb[:, :, 5:], pq_codebooks(64, 8, 16, 17)[:, :, 5:])


def test_trained_recall_lifts_over_seeded(spark):
    from parquet_go_spark.ops.similarity import cosine_topk, pq_sample_spark

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter("vec_id < 8")
    want = {(r["q_id"], r["n_id"]) for r in cosine_topk(emb, queries, k=10).collect()}

    def recall(res):
        got = {(r["q_id"], r["n_id"]) for r in res.collect()}
        return len(got & want) / len(want)

    sample = pq_sample_spark(emb)
    cb = train_pq_sample(sample)
    cents = train_ivf_sample(sample)
    r_trained = recall(
        pq_topk(emb, queries, k=10, codebooks=cb, centroids=cents, constants="broadcast")
    )
    r_seeded = recall(pq_topk(emb, queries, k=10, constants="broadcast"))
    # the driver row trains BOTH quantizers (coarse cells set the
    # recall ceiling, codebooks the ranking under it); the lift must be
    # material, not a tie (measured: 0.325 -> 0.5125 on this fixture)
    assert r_trained >= r_seeded + 0.05, (r_trained, r_seeded)
    assert r_trained >= 0.4


def test_ivf_sample_trainer_deterministic_and_unit_norm():
    s = pq_sample_parquet(f"{SF}/embeddings.parquet")
    a = train_ivf_sample(s)
    b = train_ivf_sample(s.copy())
    assert a.shape == (64, 16)
    assert np.array_equal(a, b)
    # spherical k-means contract: unit-norm centers (to 6-decimal
    # rounding), so argmax-dot assignment == nearest-by-cosine
    norms = np.linalg.norm(a, axis=0)
    assert np.all(np.abs(norms - 1.0) < 1e-4)
