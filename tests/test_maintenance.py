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


def test_compact_parquet_dir_merges_foreign_files(spark, tmp_path):
    """Six tiny pyarrow files -> right-sized kernel-written parquet with
    prune structures added at compaction time; content invariant."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.maintenance import compact_parquet_dir

    src = tmp_path / "small"
    src.mkdir()
    n = 1200
    t = pa.table(
        {
            "k": pa.array(range(n), type=pa.int64()),
            "s": pa.array([f"v{i % 37}" for i in range(n)]),
        }
    )
    for i in range(6):
        pq.write_table(t.slice(i * 200, 200), src / f"small-{i}.parquet")
    dst = str(tmp_path / "compacted")
    man = compact_parquet_dir(
        spark, str(src), dst, key_col="k", partitions=2,
        page_index=True, bloom_columns=["k"],
    )
    assert man.count() == 2 * 2  # partitions x columns
    import glob

    out_files = sorted(glob.glob(f"{dst}/part-*.parquet"))
    assert len(out_files) == 2
    back = pq.ParquetDataset(out_files).read()
    assert back.num_rows == n
    assert sorted(back.column("k").to_pylist()) == list(range(n))
    # compaction added the prune structures the source lacked
    md = pq.ParquetFile(out_files[0]).metadata
    assert md.row_group(0).column(0).has_column_index
    snaps = mf.read_snapshots(dst)
    assert snaps[-1]["operation"] == "compact"
    assert snaps[-1]["config"]["source_row_groups"] == 6


def test_remove_orphan_files(spark, tmp_path):
    """Iceberg remove_orphan_files: uncommitted data files (crash between
    data write and manifest commit) and leftover staging files go;
    committed data, manifests, snapshots, and young files stay."""
    import os

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import remove_orphan_files
    from parquet_go_spark.spark.pages_table import pages_df

    d = str(tmp_path / "enc")
    df = pages_df(spark, 400, partitions=1)
    encode_table(df, d, key_col="url", partitions=2).collect()
    mf.commit_snapshot(d, "encode")

    orphan_bin = os.path.join(d, "part-00099.bin")
    with open(orphan_bin, "wb") as f:
        f.write(b"PGSPcrashed-append-no-manifest")
    stale_tmp = os.path.join(d, "manifest", "part-00001.parquet.tmp.12345")
    with open(stale_tmp, "wb") as f:
        f.write(b"half-written")

    # age guard: young files survive (a concurrent append may own them)
    assert remove_orphan_files(d, older_than_s=3600) == []
    assert os.path.exists(orphan_bin)

    listed = remove_orphan_files(d, older_than_s=0, dry_run=True)
    assert set(listed) == {orphan_bin, stale_tmp}
    assert os.path.exists(orphan_bin)  # dry run deletes nothing

    removed = remove_orphan_files(d, older_than_s=0)
    assert set(removed) == {orphan_bin, stale_tmp}
    assert not os.path.exists(orphan_bin) and not os.path.exists(stale_tmp)
    # the table is intact
    assert decode_table(spark, d).count() == 400
