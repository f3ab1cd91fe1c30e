"""Winnowing fingerprint tests: vectorized kernel vs a naive python
reference, the shared-substring guarantee, and the Spark wrapper."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.ops.winnow import winnow_bytes, winnowing_fingerprints

_B = 1000003
_MASK = (1 << 61) - 1


def _naive(data: bytes, k: int, w: int):
    n = len(data)
    if n < k:
        return [], []
    hashes = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h = (h + data[i + j] * pow(_B, k - 1 - j, 1 << 61)) & _MASK
        hashes.append(h)
    if len(hashes) <= w:
        m = min(hashes)
        i = max(j for j, h in enumerate(hashes) if h == m)
        return [i], [hashes[i]]
    pos_out = []
    for s in range(len(hashes) - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        i = s + max(j for j, h in enumerate(window) if h == m)
        if not pos_out or pos_out[-1] != i:
            pos_out.append(i)
    return pos_out, [hashes[i] for i in pos_out]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [5, 60, 400])
def test_matches_naive(seed, n):
    rng = np.random.default_rng(seed)
    data = rng.integers(97, 110, n, dtype=np.uint8)  # narrow alphabet -> hash ties
    pos, fps = winnow_bytes(data, k=8, w=16)
    npos, nfps = _naive(bytes(data), 8, 16)
    assert pos.tolist() == npos
    assert [int(f) for f in fps] == nfps


def test_shared_substring_guarantee():
    rng = np.random.default_rng(9)
    shared = bytes(rng.integers(32, 127, 64, dtype=np.uint8))  # 64 >= k + w - 1 = 23
    a = bytes(rng.integers(32, 127, 100, dtype=np.uint8)) + shared + b"tail-a"
    b = b"prefix-bbb" + shared + bytes(rng.integers(32, 127, 80, dtype=np.uint8))
    _, fa = winnow_bytes(np.frombuffer(a, np.uint8))
    _, fb = winnow_bytes(np.frombuffer(b, np.uint8))
    assert set(fa.tolist()) & set(fb.tolist()), "shared substring must share a fingerprint"


@pytest.mark.spark
def test_spark_wrapper(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = winnowing_fingerprints(df)
    rows = out.count()
    assert rows > df.count()  # several fingerprints per doc
    assert out.columns == ["doc_id", "pos", "fp"]


def test_duplicate_spans_finds_planted_copy(spark):
    from parquet_go_spark.ops.winnow import duplicate_spans

    shared = "this exact paragraph is copied verbatim between documents and is quite long"
    rows = [
        (1, "unique prefix one " + shared + " unique suffix alpha"),
        (2, "totally different beginning " + shared + " different ending"),
        (3, "no copied content here at all, fully original text, its own words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 3 not in by_doc
    for doc in (1, 2):
        spans = by_doc[doc]
        assert len(spans) == 1
        s = spans[0]
        text = rows[doc - 1][1]
        # the reported span sits inside the copied region (winnowing
        # guarantees coverage of shared substrings >= k + w - 1)
        frag = text[s["span_start"] : s["span_end"]]
        assert frag in shared or shared in frag or frag.strip(" ") in shared
        assert s["span_len"] >= 32 and s["n_fps"] >= 2


def test_duplicate_spans_merges_with_gap(spark):
    from parquet_go_spark.ops.winnow import duplicate_spans

    a = "first copied sentence block that appears twice in the corpus yes"
    b = "second copied block also repeated across both documents here too"
    rows = [
        (1, a + " xx " + b),          # close together -> one merged span
        (2, "intro " + a + (" filler" * 40) + " " + b + " outro"),  # far apart -> two spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, gap=16).collect()
    n = {}
    for r in out:
        n[r["doc_id"]] = n.get(r["doc_id"], 0) + 1
    assert n[2] >= 2  # separated duplicates stay separate spans


def test_contamination_flags_only_overlapping_docs(spark):
    from parquet_go_spark.ops.winnow import contamination

    corpus = spark.createDataFrame(
        [
            (1, "training text containing the exact benchmark question what is the airspeed velocity of an unladen swallow plus more"),
            (2, "completely clean document with no overlap at all in any way whatsoever"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the airspeed velocity of an unladen swallow")],
        "doc_id long, text string",
    )
    out = contamination(corpus, bench).collect()
    assert len(out) == 1
    assert out[0]["doc_id"] == 1 and out[0]["bench_id"] == 100 and out[0]["n_shared_fps"] >= 2


def test_hash_split_stable_and_proportional(spark):
    from pyspark.sql import functions as F

    from parquet_go_spark.ops.dedup import hash_split

    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    counts = {r["split"]: r["count"] for r in hash_split(df).groupBy("split").count().collect()}
    assert abs(counts["train"] / 20000 - 0.98) < 0.01
    # repartition-invariant assignment
    a = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(11)).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df.repartition(2)).collect()}
    assert a == b
    # fractions must sum to 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, fractions={"train": 0.5, "val": 0.1})


def test_cli_decontaminate(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    leak = "the secret benchmark question about unladen swallows and their airspeed velocity"
    rows = [
        (1, "clean document with entirely original content and nothing shared at all"),
        (2, "prefix text " + leak + " suffix text"),
        (3, "another perfectly clean page with its own unique words and phrasing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    encode_table(df, src, partitions=2).collect()
    bench_dir = str(tmp_path / "bench")
    spark.createDataFrame([(100, leak)], "doc_id long, text string").write.parquet(bench_dir)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable, "-m", "parquet_go_spark", "--cpus", "4",
            "decontaminate", "--enc", src, "--bench", bench_dir, "--out", out,
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows_in"] == 3 and info["rows_dropped"] == 1
    kept = {x["doc_id"] for x in decode_table(spark, out).select("doc_id").collect()}
    assert kept == {1, 3}
