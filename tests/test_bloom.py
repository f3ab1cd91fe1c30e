"""Split-block bloom filters: kernel invariants + manifest-level equality
pruning on decode (the point-lookup path min/max stats can't serve on
high-cardinality keys — parquet-format BloomFilter.md semantics, which
the reference repo itself never implemented)."""

from __future__ import annotations

import numpy as np
import pytest

from parquet_go_spark.core.columns import ColumnData
from parquet_go_spark.kernels.bloom import (
    BLOOM_BLOCK_BYTES,
    bloom_build,
    bloom_might_contain,
    hash_column,
    hash_scalar,
)

# ------------------------------------------------------------- kernel


def _bytes_column(values: list[bytes]) -> ColumnData:
    lengths = np.array([len(v) for v in values], dtype=np.int64)
    data = np.frombuffer(b"".join(values), dtype=np.uint8)
    return ColumnData(
        "bytes", np.ones(len(values), bool), lengths=lengths, data=data
    )


def test_no_false_negatives_bytes():
    values = [f"https://site{i}.example/p/{i * 7}".encode() for i in range(5000)]
    hashes = hash_column(_bytes_column(values))
    f = bloom_build(hashes, 5000)
    for v in values[::97]:
        assert bloom_might_contain(f, hash_scalar(v, "bytes"))
    # str probe hashes identically to the bytes build side
    assert bloom_might_contain(f, hash_scalar("https://site0.example/p/0", "bytes"))


def test_false_positive_rate_sane():
    values = [f"k{i}".encode() for i in range(4000)]
    f = bloom_build(hash_column(_bytes_column(values)), 4000)
    fp = sum(
        bloom_might_contain(f, hash_scalar(f"absent{i}", "bytes")) for i in range(4000)
    )
    assert fp < 40  # 16 bits/value ⇒ ~0.1% expected; 1% bound with margin


def test_int_paths_and_width_agnostic_hash():
    v32 = ColumnData("int32", np.ones(100, bool), values=np.arange(100, dtype=np.int32))
    v64 = ColumnData("int64", np.ones(100, bool), values=np.arange(100, dtype=np.int64))
    h32, h64 = hash_column(v32), hash_column(v64)
    assert np.array_equal(h32, h64), "int32/int64 probes must agree"
    f = bloom_build(h64, 100)
    assert bloom_might_contain(f, hash_scalar(42, "int64"))
    assert not bloom_might_contain(f, hash_scalar(123456789, "int64"))


def test_flba_path():
    data = np.frombuffer(b"".join(i.to_bytes(4, "big") for i in range(256)), np.uint8)
    cd = ColumnData("flba", np.ones(256, bool), data=data, type_length=4)
    f = bloom_build(hash_column(cd), 256)
    assert bloom_might_contain(f, hash_scalar((7).to_bytes(4, "big"), "flba"))
    assert not bloom_might_contain(f, hash_scalar(b"\xff\xff\xff\xff", "flba"))


def test_unsupported_types_return_none():
    cd = ColumnData("double", np.ones(4, bool), values=np.zeros(4))
    assert hash_column(cd) is None
    assert hash_scalar(1.5, "double") is None
    assert hash_scalar(object(), "bytes") is None


def test_empty_and_cap():
    f = bloom_build(np.array([], dtype=np.uint64), 0)
    assert len(f) == BLOOM_BLOCK_BYTES
    assert not bloom_might_contain(f, hash_scalar("x", "bytes"))
    # cap bites: filter shrinks but stays false-negative-free
    values = [f"v{i}".encode() for i in range(20000)]
    hashes = hash_column(_bytes_column(values))
    f = bloom_build(hashes, 20000, cap_bytes=1024)
    assert len(f) == 1024
    for v in values[::500]:
        assert bloom_might_contain(f, hash_scalar(v, "bytes"))


def test_deterministic_across_builds():
    values = [f"u{i}".encode() for i in range(1000)]
    h = hash_column(_bytes_column(values))
    assert bloom_build(h, 1000) == bloom_build(h.copy(), 1000)


# ------------------------------------------------------- pipeline prune

pytestmark_spark = pytest.mark.spark


@pytest.mark.spark
def test_bloom_prune_point_lookup(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    out = str(tmp_path / "enc_bloom")
    df = pages_df(spark, 2000, partitions=2)
    encode_table(df, out, key_col="url", partitions=8, bloom_columns=["url"]).collect()
    target = df.select("url").first()["url"]
    # url-hash-salted layout: every partition spans the whole lex range,
    # so min/max alone can prune nothing — the bloom must do the work
    unpruned = decode_table(spark, out, prune=[("url", "<=", "￿")])
    pruned = decode_table(spark, out, prune=[("url", "==", target)])
    assert pruned.filter(pruned.url == target).count() == 1
    # deterministic data + deterministic hashes ⇒ stable partition skips
    assert pruned.count() < unpruned.count()
    # absent key: every partition provably excluded (FPP ~0.1% over 8
    # partitions; deterministic for this fixed input)
    missing = decode_table(
        spark, out, prune=[("url", "==", "https://never.example/xyz")]
    )
    assert missing.count() == 0


@pytest.mark.spark
def test_bloom_columns_validation_and_nested_skip(spark, tmp_path):
    import pyspark.sql.functions as F

    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    out = str(tmp_path / "enc_bloom_nested")
    df = pages_df(spark, 200, partitions=1).select(
        "url", F.array("lang").alias("langs"), "warc_ts"
    )
    rows = encode_table(
        df, out, key_col="url", partitions=2, bloom_columns=["url", "langs", "warc_ts"]
    ).collect()
    by_col = {}
    for r in rows:
        by_col.setdefault(r["column"], []).append(r["bloom"])
    assert all(b is not None for b in by_col["url"])
    assert all(b is not None for b in by_col["warc_ts"])  # int64 micros
    assert all(b is None for b in by_col["langs"])  # nested: no bloom
