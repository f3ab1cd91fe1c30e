"""Parquet BloomFilter interop (compat/bloom_filter.py +
kernels/xxhash64.py): spec XXH64 over plain-encoded values feeding a
split-block filter stored behind a BloomFilterHeader at
ColumnMetaData.bloom_filter_offset (parquet-format BloomFilter.md).
The reference stops at min/max stats; this is the equality-prune tier
hash-scattered keys need. Spark's builtin ``xxhash64`` (same algorithm,
seed 42) is the independent hash oracle."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.bloom_filter import (
    bits_per_value_for_fpp,
    bloom_probe_file,
    hash_probe_value,
    read_bloom_bitset,
)
from parquet_go_spark.compat.parquet_reader import file_meta
from parquet_go_spark.compat.parquet_writer import write_parquet
from parquet_go_spark.kernels.bloom import bloom_might_contain
from parquet_go_spark.kernels.xxhash64 import xxh64, xxh64_column

N = 40_000


class TestXXH64:
    def test_public_vectors_seed0(self):
        # xxHash reference test vectors (public, Yann Collet)
        assert xxh64(b"") == 0xEF46DB3751D8E999
        assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
        assert xxh64(b"abc") == 0x44BC2CF5AD770999

    def test_vectorized_matches_scalar_all_paths(self):
        rng = np.random.default_rng(0)
        vals = [
            bytes(rng.integers(0, 256, size=ln, dtype=np.uint8))
            for ln in list(range(0, 40)) + [31, 32, 33, 63, 64, 100, 1000]
        ]
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        data = np.frombuffer(b"".join(vals), dtype=np.uint8)
        for seed in (0, 42):
            hv = xxh64_column(lens, data, seed=seed)
            assert [int(h) for h in hv] == [xxh64(v, seed) for v in vals]

    def test_spark_xxhash64_is_the_same_algorithm(self, spark):
        """Spark's builtin hashes a string's UTF-8 bytes with XXH64 at
        seed 42 — an implementation-independent oracle."""
        from pyspark.sql import functions as F

        strs = ["", "a", "abc", "x" * 31, "y" * 32, "boiler " * 40, "日本語テキスト"]
        rows = (
            spark.createDataFrame([(s,) for s in strs], "s string")
            .select(F.xxhash64("s").alias("h"))
            .collect()
        )
        got = [r["h"] % (1 << 64) for r in rows]
        assert got == [xxh64(s.encode(), seed=42) for s in strs]


@pytest.fixture(scope="module")
def bloom_file(tmp_path_factory):
    rng = np.random.default_rng(5)
    keys = rng.permutation(N).astype(np.int64)  # scattered: min/max useless
    t = pa.table(
        {
            "k": pa.array(keys),
            "url": pa.array([f"https://site-{k % 97}.example/p/{k}" for k in keys]),
            "v": pa.array(rng.standard_normal(N)),
        }
    )
    b = write_parquet(
        t, compression="snappy", max_row_group=10_000, bloom_columns=["k", "url"]
    )
    d = tmp_path_factory.mktemp("bloom")
    p = d / "f0.parquet"
    p.write_bytes(b)
    return str(p), t, keys


class TestWriteProbe:
    def test_foreign_readers_unaffected(self, bloom_file):
        p, t, _ = bloom_file
        assert pq.read_table(p).equals(t)
        duckdb = pytest.importorskip("duckdb")
        assert duckdb.sql(f"select count(*) from read_parquet('{p}')").fetchall() == [
            (N,)
        ]

    def test_no_false_negatives_and_fpp_holds(self, bloom_file):
        p, _, keys = bloom_file
        b = open(p, "rb").read()
        md = file_meta(b)[4][0][1][0][3]  # rg0, column k
        bits = read_bloom_bitset(b, md)
        rg0 = set(int(k) for k in keys[:10_000])
        assert all(
            bloom_might_contain(bits, hash_probe_value(k, 2))
            for k in list(rg0)[:500]
        )
        fp = sum(
            bloom_might_contain(bits, hash_probe_value(N + i, 2))
            for i in range(2000)
        )
        assert fp < 2000 * 0.05  # sized for fpp=0.01

    def test_plan_prunes_row_groups_stats_cannot(self, bloom_file):
        from parquet_go_spark.spark.parquet_source import plan_scan_tasks

        p, _, keys = bloom_file
        assert len(plan_scan_tasks([p], None)) == 4
        # a present key lives in exactly one row group
        hit = plan_scan_tasks([p], [("k", "==", int(keys[3]))])
        assert len(hit) == 1
        # string key probes too
        k = int(keys[7])
        url = f"https://site-{k % 97}.example/p/{k}"
        assert len(plan_scan_tasks([p], [("url", "==", url)])) >= 1
        # an absent key plans nothing
        assert plan_scan_tasks([p], [("k", "==", N + 5)]) == []

    def test_in_list_probes_every_member(self, bloom_file):
        from parquet_go_spark.spark.parquet_source import plan_scan_tasks

        p, _, keys = bloom_file
        # members from two different row groups -> both planned
        hit = plan_scan_tasks(
            [p], [("k", "in", (int(keys[0]), int(keys[10_001])))]
        )
        assert 1 <= len(hit) <= 2
        # all members absent -> nothing planned
        assert plan_scan_tasks([p], [("k", "in", (N + 1, N + 2))]) == []

    def test_notnull_drops_all_null_row_group(self, tmp_path):
        from parquet_go_spark.spark.parquet_source import plan_scan_tasks

        t = pa.table(
            {
                "k": pa.array(
                    [None] * 5000 + list(range(5000)), type=pa.int64()
                )
            }
        )
        p = tmp_path / "nn.parquet"
        import io

        buf = io.BytesIO()
        pq.write_table(t, buf, row_group_size=5000)
        p.write_bytes(buf.getvalue())
        tasks = plan_scan_tasks([str(p)], [("k", "notnull", None)])
        assert [rg for _, rg in tasks] == [1]

    def test_pgsq_pushes_in_and_notnull(self, spark, bloom_file):
        from parquet_go_spark.spark.datasource import PGSParquetDataSource

        p, _, keys = bloom_file
        spark.dataSource.register(PGSParquetDataSource)
        df = spark.read.format("pgsq").load(p)
        a, b = int(keys[1]), int(keys[10_002])
        got = sorted(
            r["k"] for r in df.where(f"k in ({a}, {b})").select("k").collect()
        )
        assert got == sorted([a, b])
        assert df.where("k is not null").count() == N

    def test_scan_exact_after_bloom_prune(self, spark, bloom_file):
        from parquet_go_spark.spark.parquet_source import read_parquet_table

        p, _, keys = bloom_file
        k = int(keys[11])
        df = read_parquet_table(spark, p, prune=[("k", "==", k)])
        rows = df.where(f"k = {k}").collect()
        assert len(rows) == 1 and rows[0]["url"].endswith(f"/p/{k}")

    def test_forged_header_raises_not_allocates(self, bloom_file):
        p, _, _ = bloom_file
        b = bytearray(open(p, "rb").read())
        meta = file_meta(bytes(b))
        md = meta[4][0][1][0][3]
        off = md[14]
        # rewrite numBytes to an absurd value: reader must raise
        from parquet_go_spark.compat.bloom_filter import bloom_header_bytes

        forged = bloom_header_bytes(1 << 30)
        b[off : off + len(forged)] = forged
        with pytest.raises(ValueError, match="implausible"):
            read_bloom_bitset(bytes(b), md)
        # the planning probe degrades to keep, never crashes
        assert bloom_probe_file(p, md, 1) in (True, False)

    def test_bits_per_value_monotone(self):
        assert bits_per_value_for_fpp(0.01) > bits_per_value_for_fpp(0.1)
        assert bits_per_value_for_fpp(0.001) > bits_per_value_for_fpp(0.01)

    def test_nested_bloom_rejected(self):
        t = pa.table({"xs": pa.array([[1, 2], [3]])})
        with pytest.raises(ValueError, match="flat"):
            write_parquet(t, bloom_columns=["xs"])

    def test_missing_filter_keeps_group(self, tmp_path):
        t = pa.table({"k": pa.array(range(100), type=pa.int64())})
        p = tmp_path / "plain.parquet"
        p.write_bytes(write_parquet(t))
        md = file_meta(p.read_bytes())[4][0][1][0][3]
        assert bloom_probe_file(str(p), md, 5) is True
