"""Catalyst-native streaming encode sink: ``df.writeStream.format("pgs")``
(DataSourceStreamArrowWriter) — staged two-phase commit, exactly-once
batch replay, and the end-to-end multi-batch drive."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.spark import manifest as mf
from parquet_go_spark.spark.datasource import _PGSStreamWriter


def _batch(lo: int, hi: int) -> pa.RecordBatch:
    return pa.record_batch(
        {
            "url": pa.array([f"u{i}" for i in range(lo, hi)]),
            "n": pa.array(np.arange(lo, hi, dtype=np.int64)),
        }
    )


def _mk_writer(tmp_path) -> tuple[_PGSStreamWriter, str]:
    d = str(tmp_path / "enc")
    os.makedirs(d, exist_ok=True)
    mf.write_table_schema(
        d, [{"name": "url", "ddl": "string"}, {"name": "n", "ddl": "bigint"}]
    )
    return _PGSStreamWriter(d, ["url", "n"], {"compression": "snappy"}, txn="q1"), d


def test_stream_sink_two_phase_commit_and_replay(tmp_path):
    w, d = _mk_writer(tmp_path)
    # phase 1: staged files are invisible (no part-*.bin, no manifest)
    m0 = w.write(iter([_batch(0, 100)]))
    m1 = w.write(iter([_batch(100, 250)]))
    assert not glob.glob(os.path.join(d, "part-*.bin"))
    assert not mf.committed_partitions(d)
    assert os.path.exists(os.path.join(d, m0.stage_name))
    # phase 2: commit renames + manifests + snapshot marker
    w.commit([m0, m1], batchId=0)
    assert len(mf.committed_partitions(d)) == 2
    assert not glob.glob(os.path.join(d, "stage-*.tmp"))
    rows = sum(
        max(r["num_rows"] for r in mf.read_partition_manifest(d, pid))
        for pid in mf.committed_partitions(d)
    )
    assert rows == 250
    snaps = mf.read_snapshots(d)
    assert snaps[-1]["config"]["stream_batch_id"] == 0
    # REPLAY of batch 0 (crash between commit and checkpoint advance):
    # fresh staged files, same batch id -> cleaned up, no second
    # snapshot, row count unchanged
    r0 = w.write(iter([_batch(0, 100)]))
    r1 = w.write(iter([_batch(100, 250)]))
    w.commit([r0, r1], batchId=0)
    assert len(mf.committed_partitions(d)) == 2
    assert not glob.glob(os.path.join(d, "stage-*.tmp"))
    markers = [
        s["config"]["stream_batch_id"]
        for s in mf.read_snapshots(d)
        if "stream_batch_id" in s.get("config", {})
    ]
    assert markers == [0]
    # next batch appends new partition ids past the claim
    m2 = w.write(iter([_batch(250, 300)]))
    w.commit([m2], batchId=1)
    assert len(mf.committed_partitions(d)) == 3
    assert sorted(
        s["config"]["stream_batch_id"]
        for s in mf.read_snapshots(d)
        if "stream_batch_id" in s.get("config", {})
    ) == [0, 1]


def test_stream_sink_abort_leaves_nothing_visible(tmp_path):
    w, d = _mk_writer(tmp_path)
    m = w.write(iter([_batch(0, 50)]))
    w.abort([m, None], batchId=0)
    assert not glob.glob(os.path.join(d, "stage-*.tmp"))
    assert not mf.committed_partitions(d)
    assert not mf.read_snapshots(d)


def test_stream_sink_txn_scopes_batch_ids(tmp_path):
    """Two queries (distinct stream_txn) both at batch 0 must not read
    each other's markers as replays."""
    _, d = _mk_writer(tmp_path)
    wa = _PGSStreamWriter(d, ["url", "n"], {}, txn="qa")
    wb = _PGSStreamWriter(d, ["url", "n"], {}, txn="qb")
    wa.commit([wa.write(iter([_batch(0, 10)]))], batchId=0)
    wb.commit([wb.write(iter([_batch(10, 30)]))], batchId=0)
    rows = sum(
        max(r["num_rows"] for r in mf.read_partition_manifest(d, pid))
        for pid in mf.committed_partitions(d)
    )
    assert rows == 30  # qb's batch 0 was NOT discarded as qa's replay


@pytest.mark.spark
def test_stream_sink_end_to_end(spark, tmp_path):
    """readStream(parquet) -> writeStream.format('pgs') with
    availableNow: multi-batch ingest, table decodes to the full input,
    snapshot log carries one marker per batch, streamWriter bootstraps
    the table schema."""
    from parquet_go_spark.spark.datasource import PGSDataSource
    from parquet_go_spark.spark.decode_job import decode_table

    spark.dataSource.register(PGSDataSource)
    src = str(tmp_path / "src")
    for i in range(3):  # three files -> three micro-batches
        spark.range(i * 100, (i + 1) * 100).selectExpr(
            "concat('u', id) as url", "id as n"
        ).coalesce(1).write.mode("append").parquet(src)
    out = str(tmp_path / "enc")
    q = (
        spark.readStream.schema("url string, n bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.format("pgs")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("compression", "zstd")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = decode_table(spark, out)
    assert got.count() == 300
    assert got.agg({"n": "sum"}).first()[0] == sum(range(300))
    bids = sorted(
        s["config"]["stream_batch_id"]
        for s in mf.read_snapshots(out)
        if "stream_batch_id" in s.get("config", {})
    )
    assert bids == list(range(len(bids))) and len(bids) >= 2
    assert not glob.glob(os.path.join(out, "stage-*.tmp"))


def test_stream_sink_mid_commit_crash_replay_with_fewer_tasks(tmp_path):
    """Crash window: attempt 1 renamed+manifested 2 partitions then died
    before its snapshot; the replay delivers the batch in ONE task. The
    replay's commit must sweep the claimed-but-unfilled tail ids, or the
    crashed attempt's second partition would double-count its rows."""
    w, d = _mk_writer(tmp_path)
    m0 = w.write(iter([_batch(0, 100)]))
    m1 = w.write(iter([_batch(100, 250)]))
    # simulate attempt 1 crashing AFTER the renames/manifests but BEFORE
    # the snapshot: run the rename/manifest phase by hand
    base = mf.claim_append_base(d, "stream-q1-batch-0", 2)
    for i, m in enumerate(sorted([m0, m1], key=lambda m: m.stage_name)):
        pid = base + i
        os.replace(
            os.path.join(d, m.stage_name), os.path.join(d, f"part-{pid:05d}.bin")
        )
        rows = [
            {**r, "partition": pid, "file": os.path.join(d, f"part-{pid:05d}.bin")}
            for r in m.rows
        ]
        mf.commit_partition(d, pid, rows)
    assert len(mf.committed_partitions(d)) == 2
    # replay arrives as ONE task carrying the whole batch
    r = w.write(iter([_batch(0, 250)]))
    w.commit([r], batchId=0)
    pids = mf.committed_partitions(d)
    assert len(pids) == 1  # the stale tail pid was swept
    rows = sum(
        max(x["num_rows"] for x in mf.read_partition_manifest(d, pid)) for pid in pids
    )
    assert rows == 250
