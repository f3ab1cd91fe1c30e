"""Rewrite-epoch crash safety for positional-delete sidecars.

An in-place rewrite (materialize_deletes / COW delete_where) renumbers
row ordinals, so any sidecar written against the OLD file must never be
applied to the NEW bytes. The epoch rides INSIDE the partition file
(same atomic rename as the data), sidecars are stamped with the epoch
they were computed against, and readers skip provably-stale sidecars —
so a crash between the rewrite and the driver's sidecar cleanup, or a
concurrent reader inside that window, still reads exactly the live rows
(Iceberg's sequence-number rule for delete-file applicability)."""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _table(spark, tmp_path, n=1200, parts=4):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.pages_table import pages_df
    from parquet_go_spark.spark.encode_job import encode_table

    df = pages_df(spark, n, partitions=1).withColumn(
        "seq", (F.abs(F.xxhash64("url")) % 100000).cast("bigint")
    )
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col="seq", layout="range", partitions=parts).collect()
    mf.commit_snapshot(d, "encode")
    return df, d


def test_fresh_files_are_epoch_zero_and_byte_stable(spark, tmp_path):
    from parquet_go_spark.spark.encode_job import (
        partition_file_epoch,
        partition_file_epoch_path,
        parse_partition_file,
        write_partition_file,
    )

    _, d = _table(spark, tmp_path)
    p = os.path.join(d, "part-00000.bin")
    assert partition_file_epoch_path(p) == 0
    # epoch=0 writes NO reserved entry: fresh layouts are unchanged
    write_partition_file(str(tmp_path / "a.bin"), [("c", b"xyz")], epoch=0)
    write_partition_file(str(tmp_path / "b.bin"), [("c", b"xyz")], epoch=3)
    a = open(tmp_path / "a.bin", "rb").read()
    b = open(tmp_path / "b.bin", "rb").read()
    assert partition_file_epoch(a) == 0 and partition_file_epoch(b) == 3
    assert len(b) > len(a)
    # the reserved entry never surfaces as a column, selected or not
    assert set(parse_partition_file(b)) == {"c"}
    assert set(parse_partition_file(b, {"c", "__pgs_epoch__"})) == {"c"}


def test_crash_between_rewrite_and_sidecar_cleanup_reads_exact(spark, tmp_path, monkeypatch):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark import maintenance
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import partition_file_epoch_path

    df, d = _table(spark, tmp_path)
    expect_gone = df.filter(F.col("seq") <= 30000).count()
    assert expect_gone > 0
    maintenance.delete_where(spark, d, [("seq", "<=", 30000)], mode="mor")
    touched = sorted({int(n[4:9]) for n in mf.list_delete_files(d)})
    assert touched

    # crash simulation: the rewrite completes on every executor, but the
    # driver dies before remove_delete_files / invalidate_snapshots run
    monkeypatch.setattr(mf, "remove_delete_files", lambda *a, **k: [])
    maintenance.materialize_deletes(spark, d)
    monkeypatch.undo()

    # stale sidecars still on disk, data files already epoch-bumped
    assert mf.list_delete_files(d)
    for pid in touched:
        assert partition_file_epoch_path(os.path.join(d, f"part-{pid:05d}.bin")) == 1

    # a reader in this state must see EXACTLY the live rows: the stale
    # ordinals are skipped (epoch proof), not applied to compacted rows
    got = decode_table(spark, d)
    assert got.count() == 1200 - expect_gone
    assert got.filter(F.col("seq") <= 30000).count() == 0

    # repair sweeps them; results unchanged
    for pid in touched:
        removed = mf.remove_stale_delete_files(d, pid)
        assert removed
    assert not mf.list_delete_files(d)
    assert decode_table(spark, d).count() == 1200 - expect_gone


def test_newer_sidecar_than_file_bytes_raises(spark, tmp_path):
    """A sidecar stamped with a HIGHER epoch than the data bytes means
    the reader holds pre-rewrite data — applying would corrupt, so it
    raises instead."""
    import numpy as np

    from parquet_go_spark.spark import manifest as mf

    _, d = _table(spark, tmp_path)
    mf.write_delete_file(d, 0, np.array([0, 1]), base_rows=10**9, epoch=2)
    with pytest.raises(ValueError, match="epoch 2"):
        mf.delete_positions(d, 0, file_epoch=0)


def test_second_rewrite_round_applies_only_matching_epoch(spark, tmp_path):
    """MOR delete -> materialize -> MOR delete again: the second round's
    sidecars are stamped epoch 1 and apply; a leftover epoch-0 sidecar
    (planted) is ignored."""
    import numpy as np

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark import maintenance
    from parquet_go_spark.spark.decode_job import decode_table

    df, d = _table(spark, tmp_path)
    n0 = df.count()
    gone1 = df.filter(F.col("seq") <= 20000).count()
    maintenance.delete_where(spark, d, [("seq", "<=", 20000)], mode="mor")
    maintenance.materialize_deletes(spark, d)
    assert not mf.list_delete_files(d)

    gone2 = df.filter(F.col("seq") >= 80000).count()
    res2 = maintenance.delete_where(spark, d, [("seq", ">=", 80000)], mode="mor")
    assert res2["rows_deleted"] == gone2
    # plant a forged stale epoch-0 sidecar on a round-1-REWRITTEN
    # (epoch-1) partition — it must be ignored, not applied
    from parquet_go_spark.spark.encode_job import partition_file_epoch_path

    import glob

    rewritten = [
        int(os.path.basename(p)[5:10])
        for p in glob.glob(os.path.join(d, "part-*.bin"))
        if partition_file_epoch_path(p) >= 1
    ]
    assert rewritten, "round 1 must have rewritten at least one partition"
    victim = rewritten[0]
    man = mf.read_partition_manifest(d, victim)
    rows_v = man[0]["num_rows"] if man else 0
    if rows_v:
        mf.write_delete_file(d, victim, np.array([0]), base_rows=rows_v, epoch=0)
    got = decode_table(spark, d)
    assert got.count() == n0 - gone1 - gone2
    assert got.filter((F.col("seq") <= 20000) | (F.col("seq") >= 80000)).count() == 0


def test_pinned_as_of_in_crash_window_raises_invalidated(spark, tmp_path, monkeypatch):
    """Time travel into the rewrite-crash window must RAISE, never serve
    post-rewrite bytes as the old version: a snapshot pinning sidecar A
    is read after a rewrite materialized A *and B* into the data files
    (cleanup crashed) — the compacted bytes are rows-minus-A-minus-B,
    which is NOT what the pinned version promises."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark import maintenance
    from parquet_go_spark.spark.decode_job import decode_table

    df, d = _table(spark, tmp_path)
    maintenance.delete_where(spark, d, [("seq", "<=", 20000)], mode="mor")
    s1 = mf.commit_snapshot(d, "delete")["seq"]  # pins sidecar set A
    n_s1 = decode_table(spark, d, as_of=s1).count()
    maintenance.delete_where(spark, d, [("seq", ">=", 80000)], mode="mor")

    # crash simulation: rewrite lands, cleanup + tombstoning never run
    monkeypatch.setattr(mf, "remove_delete_files", lambda *a, **k: [])
    monkeypatch.setattr(mf, "invalidate_snapshots", lambda *a, **k: 0)
    maintenance.materialize_deletes(spark, d)
    monkeypatch.undo()

    # current read stays exact (epoch skip-with-proof)...
    live = decode_table(spark, d)
    assert live.filter(F.col("seq") <= 20000).count() == 0
    assert live.filter(F.col("seq") >= 80000).count() == 0
    # ...but the pinned version is gone and must say so
    with pytest.raises(Exception, match="invalidated"):
        decode_table(spark, d, as_of=s1).count()
    assert n_s1 > live.count()  # the versions genuinely differed


def test_missing_pinned_sidecar_raises(spark, tmp_path):
    """A pinned apply set whose sidecar file vanished (external prune,
    partial table copy) cannot be reconstructed — raise, do not quietly
    resurrect the deleted rows. Current (unpinned) reads keep the
    skip-with-proof behavior."""
    from parquet_go_spark.spark import manifest as mf

    _, d = _table(spark, tmp_path)
    ghost = ["del-00000-0099.parquet"]
    with pytest.raises(ValueError, match="missing"):
        mf.delete_positions(d, 0, files=ghost, file_epoch=0, pinned=True)
    # unpinned: treated as cleaned-up-after-materialization, skipped
    assert mf.delete_positions(d, 0, files=ghost, file_epoch=0).size == 0


def test_mark_matching_keys_guards_mid_scan_rewrite(spark, tmp_path, monkeypatch):
    """Sidecars are stamped with the epoch of the bytes the ordinals
    were SCANNED from; if the partition is rewritten mid-job the write
    stage must refuse (ordinals index bytes that no longer exist)
    rather than delete wrong rows or silently drop the request."""
    import pyspark.sql.functions as F2

    from parquet_go_spark.spark import maintenance

    df, d = _table(spark, tmp_path)
    real_scan = maintenance._scan_key_positions

    def stale_scan(*a, **k):
        # simulate: the scan saw epoch-7 bytes, the file on disk is 0
        return real_scan(*a, **k).withColumn("ep", F2.lit(7).cast("bigint"))

    monkeypatch.setattr(maintenance, "_scan_key_positions", stale_scan)
    src = df.select("seq").limit(50)
    with pytest.raises(Exception, match="was rewritten"):
        maintenance.mark_matching_keys(spark, d, "seq", src)


def test_reserved_pgs_column_names_rejected_at_encode(spark, tmp_path):
    """__pgs_* is the in-file metadata namespace (readers skip it; a
    first entry named __pgs_epoch__ would even be parsed as the rewrite
    epoch) — encoding such a column must fail loudly, not write bytes
    no reader will serve."""
    import pyarrow as pa

    from parquet_go_spark.spark.encode_job import encode_columns_to_partition

    t = pa.table({"__pgs_meta": [1, 2], "ok": ["a", "b"]})
    with pytest.raises(ValueError, match="__pgs_"):
        encode_columns_to_partition(t, ["__pgs_meta", "ok"], str(tmp_path), 0)
