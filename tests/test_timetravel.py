"""Appends, snapshot time travel, rollback, and snapshot expiry —
the functional side of the snapshot lineage log (Iceberg semantics:
every append + snapshot is a readable table version).
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _thirds(spark, rows=900):
    from parquet_go_spark.spark.pages_table import pages_df

    df = pages_df(spark, rows, partitions=1)
    return df, [df.filter(F.abs(F.xxhash64("url")) % 3 == i) for i in range(3)]


@pytest.fixture(scope="module")
def versioned_table(spark, tmp_path_factory):
    """One table built as three appends, snapshot after each."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path_factory.mktemp("tt") / "enc")
    df, thirds = _thirds(spark)
    counts = []
    encode_table(thirds[0], d, key_col="url", partitions=4).collect()
    mf.commit_snapshot(d, "encode")
    counts.append(thirds[0].count())
    for part in thirds[1:]:
        encode_table(part, d, key_col="url", partitions=4, append=True).collect()
        mf.commit_snapshot(d, "append")
        counts.append(part.count())
    return d, df, counts


def test_decode_as_of_timestamp(spark, tmp_path):
    """Iceberg TIMESTAMP AS OF: a wall-clock instant resolves to the
    snapshot current then; instants before the first snapshot raise, and
    an instant whose then-current snapshot was tombstoned by an in-place
    rewrite raises 'invalidated' instead of silently reading an older
    version."""
    import datetime as dt
    import glob
    import json
    import os

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path / "enc")
    df, thirds = _thirds(spark, rows=300)
    encode_table(thirds[0], d, key_col="url", partitions=2).collect()
    mf.commit_snapshot(d, "encode")
    encode_table(thirds[1], d, key_col="url", partitions=2, append=True).collect()
    mf.commit_snapshot(d, "append")
    # spread the (second-resolution) commit timestamps a day apart so
    # resolution is deterministic
    stamps = {0: "2026-01-01T00:00:00Z", 1: "2026-01-03T00:00:00Z"}
    for p in glob.glob(os.path.join(mf.snapshot_dir(d), "snap-*.json")):
        with open(p) as f:
            snap = json.load(f)
        snap["ts"] = stamps[snap["seq"]]
        with open(p, "w") as f:
            json.dump(snap, f)

    assert mf.seq_as_of_timestamp(d, "2026-01-02T00:00:00Z") == 0
    assert mf.seq_as_of_timestamp(d, "2026-01-03T00:00:00Z") == 1
    assert mf.seq_as_of_timestamp(d, dt.datetime(2026, 1, 2, tzinfo=dt.timezone.utc)) == 0
    epoch = dt.datetime(2026, 1, 4, tzinfo=dt.timezone.utc).timestamp()
    assert mf.seq_as_of_timestamp(d, epoch) == 1
    with pytest.raises(ValueError, match="no snapshot at or before"):
        mf.seq_as_of_timestamp(d, "2025-12-31T00:00:00Z")

    assert decode_table(spark, d, as_of="2026-01-02T00:00:00Z").count() == thirds[0].count()
    assert decode_table(spark, d, as_of="2026-01-04").count() == (
        thirds[0].count() + thirds[1].count()
    )

    # a COW delete rewrites partitions in place and tombstones the
    # snapshots that pinned them — the instant now resolves to a burned
    # version and must raise, not lie
    from parquet_go_spark.spark.maintenance import delete_where

    victim = thirds[0].select("url").limit(1).collect()[0].url
    delete_where(spark, d, [("url", "==", victim)])
    with pytest.raises(ValueError, match="invalidated"):
        decode_table(spark, d, as_of="2026-01-02T00:00:00Z").count()


def test_append_assigns_disjoint_partition_ids(versioned_table):
    from parquet_go_spark.spark import manifest as mf

    d, _, _ = versioned_table
    snaps = mf.read_snapshots(d)
    assert [s["seq"] for s in snaps] == [0, 1, 2]
    sets = [set(s["partition_ids"]) for s in snaps]
    assert sets[0] == set(range(4))
    assert sets[1] == set(range(8))
    assert sets[2] == set(range(12))
    assert mf.committed_partitions(d) == sets[2]


def test_decode_as_of_reads_each_version(spark, versioned_table):
    from parquet_go_spark.spark.decode_job import decode_table

    d, df, counts = versioned_table
    assert decode_table(spark, d, as_of=0).count() == counts[0]
    assert decode_table(spark, d, as_of=1).count() == counts[0] + counts[1]
    assert decode_table(spark, d).count() == sum(counts)
    # content, not just counts: as_of=0 is exactly the first batch
    got = sorted(r["url"] for r in decode_table(spark, d, as_of=0).select("url").collect())
    want = sorted(
        r["url"]
        for r in df.filter(F.abs(F.xxhash64("url")) % 3 == 0).select("url").collect()
    )
    assert got == want


def test_as_of_combines_with_pruning(spark, versioned_table):
    from parquet_go_spark.spark.decode_job import decode_table

    d, df, _ = versioned_table
    first = df.filter(F.abs(F.xxhash64("url")) % 3 == 0)
    lo = first.agg(F.min("url")).collect()[0][0]
    got = decode_table(spark, d, as_of=0, prune=[("url", "==", lo)])
    assert got.filter(F.col("url") == lo).count() == first.filter(F.col("url") == lo).count()


def test_append_requires_matching_schema(spark, tmp_path):
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    d = str(tmp_path / "enc")
    df = pages_df(spark, 60, partitions=1)
    encode_table(df, d, partitions=2).collect()
    with pytest.raises(ValueError, match="schema mismatch"):
        encode_table(df.withColumn("extra", F.lit(1)), d, partitions=2, append=True).collect()
    with pytest.raises(ValueError, match="no table schema"):
        encode_table(df, str(tmp_path / "nope"), partitions=2, append=True).collect()


def test_crashed_append_resumes_at_same_base(spark, tmp_path):
    """A half-committed append (partitions above the base, no snapshot)
    must not shift the base of the retry: its manifests replay."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    d = str(tmp_path / "enc")
    df = pages_df(spark, 120, partitions=1)
    encode_table(df, d, partitions=3).collect()
    mf.commit_snapshot(d, "encode")
    assert mf.next_partition_base(d) == 3
    # simulate a crashed append attempt that committed partition 3 only
    mf.commit_partition(d, 3, [])
    assert mf.next_partition_base(d) == 3


def test_rollback_deletes_appended_partitions(spark, tmp_path):
    import os

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import rollback_table

    d = str(tmp_path / "enc")
    _, thirds = _thirds(spark, 300)
    encode_table(thirds[0], d, key_col="url", partitions=3).collect()
    mf.commit_snapshot(d, "encode")
    encode_table(thirds[1], d, key_col="url", partitions=3, append=True).collect()
    mf.commit_snapshot(d, "append")
    n_first = thirds[0].count()
    snap = rollback_table(d, 0)
    assert snap["operation"] == "rollback"
    assert set(snap["partition_ids"]) == set(range(3))
    assert mf.committed_partitions(d) == set(range(3))
    assert not os.path.exists(os.path.join(d, "part-00003.bin"))
    assert decode_table(spark, d).count() == n_first
    # history after the rollback point is tombstoned; the rollback
    # snapshot takes a FRESH seq (burned seqs are never reused)
    assert [s["seq"] for s in mf.read_snapshots(d)] == [0, 2]
    assert mf.read_snapshots(d)[-1]["config"]["to_seq"] == 0
    with pytest.raises(ValueError, match="invalidated"):
        mf.snapshot_partitions(d, 1)


def test_expire_snapshots_is_metadata_only(spark, versioned_table, tmp_path):
    import shutil

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table

    src, _, counts = versioned_table
    d = str(tmp_path / "copy")
    shutil.copytree(src, d)
    removed = mf.expire_snapshots(d, keep_last=1)
    assert removed == [0, 1]
    # current read unaffected; expired seqs no longer time-travelable
    assert decode_table(spark, d).count() == sum(counts)
    assert decode_table(spark, d, as_of=2).count() == sum(counts)
    with pytest.raises(ValueError, match="expired"):
        decode_table(spark, d, as_of=0)
    with pytest.raises(ValueError):
        mf.expire_snapshots(d, keep_last=0)


def test_datasource_append_and_as_of(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    d = str(tmp_path / "enc")
    df, thirds = _thirds(spark, 300)
    # (the Python DataSource API only allows Append/Overwrite modes; on a
    # fresh dir "append" is the initial write)
    thirds[0].repartition(3, F.xxhash64("url")).write.format("pgs").mode("append").save(d)
    thirds[1].repartition(3, F.xxhash64("url")).write.format("pgs").mode("append").save(d)
    snaps = mf.read_snapshots(d)
    assert [s["seq"] for s in snaps] == [0, 1]
    assert set(snaps[1]["partition_ids"]) == set(range(6))
    t_old = spark.read.format("pgs").option("as_of", "0").load(d)
    t_all = spark.read.format("pgs").load(d)
    assert t_old.count() == thirds[0].count()
    assert t_all.count() == thirds[0].count() + thirds[1].count()
    # pushed filters prune within the pinned set
    one = thirds[0].select("url").first()["url"]
    assert t_old.where(t_old.url == one).count() == 1

    with pytest.raises(Exception, match="schema mismatch"):
        thirds[2].withColumn("extra", F.lit(1)).repartition(1).write.format("pgs").mode(
            "append"
        ).save(d)


def test_datasource_overwrite_truncates_history(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    d = str(tmp_path / "enc")
    _, thirds = _thirds(spark, 300)
    thirds[0].repartition(2).write.format("pgs").mode("append").save(d)
    thirds[1].repartition(2).write.format("pgs").mode("overwrite").save(d)
    snaps = mf.read_snapshots(d)
    assert [s["seq"] for s in snaps] == [0]  # pre-overwrite history gone
    assert spark.read.format("pgs").load(d).count() == thirds[1].count()
