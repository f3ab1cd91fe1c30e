"""Merge-on-read positional deletes (Iceberg v2 delete-file analogue):
a delete writes a tiny sidecar of row ordinals instead of rewriting the
partition — data files untouched, history stays time-travelable, and
compaction / a COW delete materializes the sidecars away."""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _seq_pages(spark, n=2000):
    from parquet_go_spark.spark.pages_table import pages_df

    return pages_df(spark, n, partitions=1).withColumn(
        "seq", (F.abs(F.xxhash64("url")) % 100000).cast("bigint")
    )


def _encode(spark, df, d, **kw):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    encode_table(df, d, **kw).collect()
    return mf.commit_snapshot(d, "encode")


def test_mor_delete_leaves_data_files_untouched(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_where

    df = _seq_pages(spark)
    d = str(tmp_path / "enc")
    _encode(spark, df, d, key_col="seq", layout="range", partitions=8, compression="snappy")
    before = {
        pid: os.path.getmtime(os.path.join(d, f"part-{pid:05d}.bin")) for pid in range(8)
    }
    expect = df.filter(F.col("seq") <= 5000).count()
    res = delete_where(spark, d, [("seq", "<=", 5000)], mode="mor")
    assert res["rows_deleted"] == expect
    assert res["candidates"] <= 2  # range layout: stats cleared the rest
    # NO data file was rewritten — that is the point of merge-on-read
    after = {
        pid: os.path.getmtime(os.path.join(d, f"part-{pid:05d}.bin")) for pid in range(8)
    }
    assert after == before
    # sidecars exist only for partitions that actually matched
    assert 1 <= len(mf.list_delete_files(d)) <= res["candidates"]
    got = decode_table(spark, d)
    assert got.count() == 2000 - expect
    assert got.filter(F.col("seq") <= 5000).count() == 0
    # the snapshot records live rows (manifest rows minus positions)
    snaps = mf.read_snapshots(d)
    assert snaps[-1]["operation"] == "delete"
    assert snaps[-1]["config"]["mode"] == "mor"
    assert snaps[-1]["num_rows"] == 2000 - expect
    assert snaps[-1]["delete_files"] == mf.list_delete_files(d)
    # idempotent: positions already marked, no new sidecar
    files_before = mf.list_delete_files(d)
    res2 = delete_where(spark, d, [("seq", "<=", 5000)], mode="mor")
    assert res2["rows_deleted"] == 0
    assert mf.list_delete_files(d) == files_before


def test_mor_delete_preserves_time_travel(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_where

    df = _seq_pages(spark, n=800)
    d = str(tmp_path / "enc")
    snap0 = _encode(spark, df, d, key_col="url", partitions=4)
    res = delete_where(spark, d, [("seq", "<=", 50000)], mode="mor")
    assert res["rows_deleted"] > 0
    # the pre-delete snapshot still reads EVERY row (a COW delete would
    # have tombstoned it); the post-delete snapshot reads the survivors
    assert decode_table(spark, d, as_of=snap0["seq"]).count() == 800
    assert decode_table(spark, d, as_of=res["snapshot"]).count() == 800 - res["rows_deleted"]
    # the datasource front door honors the same pinning
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    assert spark.read.format("pgs").option("as_of", snap0["seq"]).load(d).count() == 800
    assert (
        spark.read.format("pgs").load(d).count() == 800 - res["rows_deleted"]
    )
    # accumulating a second MOR delete unions the positions
    res2 = delete_where(spark, d, [("seq", ">=", 50001)], mode="mor")
    assert res2["rows_deleted"] == 800 - res["rows_deleted"]
    assert decode_table(spark, d).count() == 0
    assert decode_table(spark, d, as_of=res["snapshot"]).count() == 800 - res["rows_deleted"]


def test_cow_delete_materializes_mor_sidecars(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_where

    df = _seq_pages(spark, n=1000)
    d = str(tmp_path / "enc")
    _encode(spark, df, d, key_col="url", partitions=4)
    n_low = df.filter(F.col("seq") <= 30000).count()
    n_high = df.filter(F.col("seq") >= 90000).count()
    delete_where(spark, d, [("seq", "<=", 30000)], mode="mor")
    assert mf.list_delete_files(d)
    res = delete_where(spark, d, [("seq", ">=", 90000)], mode="cow")
    assert res["rows_deleted"] == n_high
    # the rewrite folded the MOR positions into the data files and
    # dropped the now-stale sidecars
    assert mf.list_delete_files(d) == []
    got = decode_table(spark, d)
    assert got.count() == 1000 - n_low - n_high
    assert got.filter((F.col("seq") <= 30000) | (F.col("seq") >= 90000)).count() == 0


def test_compaction_materializes_mor_deletes(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import compact_table, delete_where

    df = _seq_pages(spark, n=600)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _encode(spark, df, src, key_col="url", partitions=6)
    res = delete_where(spark, src, [("seq", "<=", 40000)], mode="mor")
    compact_table(spark, src, dst, partitions=2)
    assert decode_table(spark, dst).count() == 600 - res["rows_deleted"]
    assert mf.list_delete_files(dst) == []


def test_stale_sidecar_raises_and_repairs(spark, tmp_path):
    import numpy as np

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_where

    df = _seq_pages(spark, n=400)
    d = str(tmp_path / "enc")
    _encode(spark, df, d, key_col="url", partitions=2)
    rows0 = mf.read_partition_manifest(d, 0)[0]["num_rows"]
    # forge the crash window: a sidecar written against a row count the
    # partition no longer has (as if a rewrite completed but cleanup
    # didn't) — write with a consistent base, then tamper the stamp
    name = mf.write_delete_file(d, 0, np.array([0, 1]), base_rows=rows0)
    path = os.path.join(mf.deletes_dir(d), name)
    import pyarrow.parquet as pq

    t = pq.read_table(path).replace_schema_metadata({"base_rows": str(rows0 + 7)})
    pq.write_table(t, path)
    with pytest.raises(Exception, match="stale delete sidecar"):
        decode_table(spark, d).count()
    assert mf.remove_stale_delete_files(d, 0) == [name]
    assert decode_table(spark, d).count() == 400
    # and the COW path repairs it inline instead of failing
    pq.write_table(t, path)
    delete_where(spark, d, [("seq", "<=", -1)], mode="cow")
    assert mf.list_delete_files(d, 0) == []


def test_rollback_undoes_mor_deletes(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_where, rollback_table

    df = _seq_pages(spark, n=500)
    d = str(tmp_path / "enc")
    snap0 = _encode(spark, df, d, key_col="url", partitions=3)
    res = delete_where(spark, d, [("seq", "<=", 50000)], mode="mor")
    assert res["rows_deleted"] > 0
    rollback_table(d, snap0["seq"])
    assert mf.list_delete_files(d) == []
    assert decode_table(spark, d).count() == 500


def test_merge_into_mor_keeps_history(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import merge_into

    df = _seq_pages(spark, n=400)
    d = str(tmp_path / "enc")
    snap0 = _encode(spark, df, d, key_col="url", partitions=4, bloom_columns=["url"])
    src = df.limit(50).withColumn("text", F.lit("updated"))
    res = merge_into(spark, d, src, key="url", mode="mor")
    assert res["rows_replaced"] == 50
    got = decode_table(spark, d)
    assert got.count() == 400
    assert got.filter(F.col("text") == "updated").count() == 50
    # MOR merge never rewrites in place -> the pre-merge snapshot is
    # still valid (COW merge tombstones it)
    assert decode_table(spark, d, as_of=snap0["seq"]).count() == 400
    assert (
        decode_table(spark, d, as_of=snap0["seq"]).filter(F.col("text") == "updated").count()
        == 0
    )
    snaps = mf.read_snapshots(d)
    assert snaps[-1]["operation"] == "merge"
    assert snaps[-1]["config"]["mode"] == "mor"
