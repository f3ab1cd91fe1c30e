"""Compaction (Iceberg rewrite analogue): small encoded sources merge
into right-sized partitions with snapshot lineage; content is invariant."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def test_compact_merges_batch_dirs(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import compact_table
    from parquet_go_spark.spark.pages_table import pages_df

    import pyspark.sql.functions as F

    df = pages_df(spark, 1200, partitions=1)
    # three small "micro-batch" tables, 4 partitions each -> 12 tiny files
    # (deterministic disjoint thirds by url hash)
    srcs = []
    for i in range(3):
        d = str(tmp_path / f"batch{i}")
        sliced = df.filter(F.abs(F.xxhash64("url")) % 3 == i)
        encode_table(sliced, d, key_col="url", partitions=4).collect()
        srcs.append(d)
    dst = str(tmp_path / "compacted")
    man = compact_table(spark, srcs, dst, key_col="url", partitions=2, compression="snappy")
    assert man.select("partition").distinct().count() == 2
    got = decode_table(spark, dst)
    assert got.count() == 1200
    a = sorted(r["url"] for r in df.select("url").collect())
    b = sorted(r["url"] for r in got.select("url").collect())
    assert a == b
    snap = mf.read_snapshots(dst)[-1]
    assert snap["operation"] == "compact"
    assert len(snap["config"]["sources"]) == 3
    assert all(s["partitions"] == 4 for s in snap["config"]["sources"])


def test_compact_autosizes_partitions(spark, tmp_path):
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import compact_table, table_bytes
    from parquet_go_spark.spark.pages_table import pages_df

    df = pages_df(spark, 800, partitions=1)
    src = str(tmp_path / "over_partitioned")
    encode_table(df, src, key_col="url", partitions=16).collect()
    raw, enc, nparts = table_bytes(src)
    assert nparts == 16 and raw > 0
    dst = str(tmp_path / "right_sized")
    # target = half the raw bytes -> exactly 2 partitions
    man = compact_table(
        spark, src, dst, key_col="url", target_partition_bytes=(raw + 1) // 2
    )
    assert man.select("partition").distinct().count() == 2


def test_compact_can_recluster_to_range(spark, tmp_path):
    import pyspark.sql.functions as F

    from parquet_go_spark.spark.decode_job import surviving_partitions
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import compact_table
    from parquet_go_spark.spark.pages_table import pages_df

    df = pages_df(spark, 2000, partitions=1).withColumn(
        "seq", F.abs(F.xxhash64("url")) % 100000
    )
    src = str(tmp_path / "hash_layout")
    encode_table(df, src, key_col="seq", partitions=8).collect()
    assert len(surviving_partitions(src, [("seq", "<=", 10000)])) == 8
    dst = str(tmp_path / "range_layout")
    compact_table(spark, src, dst, key_col="seq", partitions=8, layout="range")
    # compaction re-clustered: range predicate now skips most partitions
    assert len(surviving_partitions(dst, [("seq", "<=", 10000)])) <= 2
