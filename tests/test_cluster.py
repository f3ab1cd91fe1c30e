"""Near-dup clustering (ops/cluster.py): pointer-jumping connected
components over candidate pairs + canonical-doc selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.cluster import canonical_docs, dup_clusters


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_and_singletons(spark):
    docs = _docs(spark, [(i, f"t{i}") for i in range(8)])
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}


def test_long_chain_converges_logarithmically(spark):
    """A 300-vertex path needs pointer jumping — one-hop propagation
    would take 300 rounds; the cap of 25 must suffice (2^25 >> 300)."""
    n = 300
    docs = _docs(spark, [(i, "x") for i in range(n)])
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    got = dup_clusters(docs, pairs)
    assert got.select("cluster_id").distinct().collect()[0][0] == 0
    assert got.count() == n


def test_canonical_longest_text_ties_to_min_id(spark):
    docs = _docs(
        spark,
        [(1, "aaaa"), (2, "bbbbbb"), (3, "cccccc"), (9, "zz")],
    )
    pairs = _pairs(spark, [(1, 2), (2, 3)])
    clusters = dup_clusters(docs, pairs)
    kept = {r["doc_id"]: r["n_kept_chars"] for r in canonical_docs(docs, clusters).collect()}
    # cluster {1,2,3}: 2 and 3 tie on length 6 -> min id 2 wins; 9 is its own
    assert kept == {2: 6, 9: 2}


def test_nonconvergence_raises(spark):
    docs = _docs(spark, [(i, "x") for i in range(6)])
    pairs = _pairs(spark, [(i, i + 1) for i in range(5)])
    with pytest.raises(RuntimeError, match="converge"):
        dup_clusters(docs, pairs, max_iter=0)
