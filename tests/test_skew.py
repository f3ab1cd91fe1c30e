"""Planted-skew stress tests: the dedup/LSH caps must ENGAGE under a
hot key, not merely not-fire at friendly defaults (round-3 verdict #8).

The skew shapes are the two classic web-corpus bombs:
- a mega-bucket in MinHash-LSH (boilerplate pages whose band hash
  collides for thousands of docs -> O(bucket^2) pairs in ONE key), and
- a degenerate embedding spike (near-identical vectors melting one
  signature bucket of the hyperplane self-join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _hot_corpus(spark, n_hot=60):
    """n_hot docs with IDENTICAL text (same shingles -> same band hash in
    every band -> one mega-bucket) + two planted near-dup pairs with
    unique long texts + unrelated filler."""
    hot = [(f"hot{i:03d}", "the same boilerplate page text repeated verbatim everywhere")
           for i in range(n_hot)]
    near = [
        ("pairA1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ("pairA2", "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        ("pairB1", "one two three four five six seven eight nine ten eleven"),
        ("pairB2", "one two three four five six seven eight nine ten twelve"),
    ]
    filler = [(f"f{i:03d}", f"totally unrelated document number {i} with words w{i} x{i} y{i} z{i}")
              for i in range(20)]
    return spark.createDataFrame(hot + near + filler, "doc_id string, text string")


def test_lsh_hot_bucket_cap_engages(spark):
    """max_bucket must actually drop the mega-bucket: uncapped, the 60
    identical docs emit C(60,2)=1770 pairs; capped, ZERO of them survive
    while the planted near-dup pairs (tiny buckets) still do."""
    from parquet_go_spark.ops.dedup import lsh_pairs

    df = _hot_corpus(spark)
    uncapped = lsh_pairs(df, max_bucket=100_000).collect()
    hot_pairs = [r for r in uncapped if r.id_a.startswith("hot")]
    assert len(hot_pairs) == 60 * 59 // 2  # the bomb is real uncapped

    capped = lsh_pairs(df, max_bucket=16).collect()
    assert not any(r.id_a.startswith("hot") for r in capped), capped[:5]
    got = {(r.id_a, r.id_b) for r in capped}
    assert ("pairA1", "pairA2") in got and ("pairB1", "pairB2") in got


def test_lsh_two_pass_matches_single_pass_under_skew(spark):
    """two_pass (counted semi-join BEFORE collect_list: the mega-bucket
    id list is never materialized) must return the identical pair set,
    and its plan must carry the pre-filter count aggregate."""
    from parquet_go_spark.ops.dedup import lsh_pairs

    df = _hot_corpus(spark)
    one = lsh_pairs(df, max_bucket=16)
    two = lsh_pairs(df, max_bucket=16, two_pass=True)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, two.collect()))
    plan = two._jdf.queryExecution().optimizedPlan().toString()
    # the two_pass shape: a count-filtered aggregate joined back before
    # any collect_list materializes a bucket
    assert "count(1)" in plan and "collect_list" in plan, plan
    assert plan.index("collect_list") < plan.index("count(1)"), (
        "collect_list must consume the pre-filtered join (appear above "
        "the count aggregate in the tree)")


def test_embedding_lsh_hot_bucket_cap_engages(spark):
    """A spike of near-identical embeddings melts one hyperplane bucket:
    the max_bucket pre-filter must drop it via a BROADCAST join (the
    counts frame is <= 2^n_planes rows — no reshuffle of the vectors),
    while normal-bucket near-dups keep matching."""
    import numpy as np

    from parquet_go_spark.ops.similarity import embedding_near_dups

    rng = np.random.default_rng(7)
    spike_base = rng.standard_normal(16)
    spike = [spike_base + 1e-4 * rng.standard_normal(16) for _ in range(50)]
    pair_base = rng.standard_normal(16)
    # flip signs so the pair can't share the spike's bucket by accident
    pair = [pair_base, pair_base + 1e-3 * rng.standard_normal(16)]
    others = [rng.standard_normal(16) for _ in range(30)]
    vecs = spike + pair + others
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    uncapped = embedding_near_dups(df, threshold=0.99).collect()
    spike_pairs = [r for r in uncapped if r.id_a < 50 and r.id_b < 50]
    assert len(spike_pairs) == 50 * 49 // 2  # the bomb is real uncapped

    res = embedding_near_dups(df, threshold=0.99, max_bucket=16)
    capped = res.collect()
    assert not any(r.id_a < 50 and r.id_b < 50 for r in capped)
    assert any({r.id_a, r.id_b} == {50, 51} for r in capped), capped
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def test_exact_dedup_hot_key_stays_bounded(spark):
    """Exact dedup under a mega-duplicate-group: the aggregation key is
    the 16-byte fingerprint and the state per group is ONE min_by struct
    + a count — a million-way duplicate group costs the same state as a
    2-way one. Assert the representative + count contract holds on a
    planted 500-way group and the plan carries a partial (map-side)
    aggregate, the shape that keeps the hot key from concentrating raw
    rows on one reducer."""
    from parquet_go_spark.ops.dedup import exact_dedup

    rows = [(f"d{i:04d}", "dup " * 50) for i in range(500)]
    rows += [(f"u{i:04d}", f"unique text {i} " * 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id string, text string").repartition(8)
    out = exact_dedup(df)
    got = {r.keep_id: r.n_dups for r in out.collect()}
    assert got["d0000"] == 500  # min-id representative carries the count
    assert sum(1 for k in got if k.startswith("d")) == 1
    assert all(v == 1 for k, v in got.items() if k.startswith("u"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two-phase aggregation with a map-side partial: the hot group is
    # pre-combined per input partition before the fingerprint shuffle
    assert "partial_min" in plan, plan
    assert len([1 for line in plan.splitlines() if "Aggregate(" in line]) >= 2, plan
