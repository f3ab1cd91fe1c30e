"""Large-source merge path: above ``key_guard`` the source key set
must NEVER be collected to the driver — the delete phase is a
distributed key-column scan + LEFT SEMI join + per-partition sidecar
writes (``mark_matching_keys``), with COW materializing the touched
partitions afterwards (VERDICT r2 #5)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _pages(spark, n=600):
    from parquet_go_spark.spark.pages_table import pages_df

    return pages_df(spark, n, partitions=2)


def _bootstrap(spark, tmp_path, n=600, **kw):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    df = _pages(spark, n)
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col="url", partitions=4, **kw).collect()
    mf.commit_snapshot(d, "encode")
    return df, d


@pytest.fixture()
def no_key_collect(monkeypatch):
    """Any driver-side key collect above the guard is a test failure."""
    from parquet_go_spark.spark import maintenance

    def boom(src_keys):
        raise AssertionError("key set collected to the driver on the large-source path")

    monkeypatch.setattr(maintenance, "_collect_keys", boom)


def test_merge_mor_above_guard_never_collects_keys(spark, tmp_path, no_key_collect):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import merge_into

    df, d = _bootstrap(spark, tmp_path)
    snap0 = mf.read_snapshots(d)[-1]
    src = df.limit(80).withColumn("text", F.lit("updated"))
    res = merge_into(spark, d, src, key="url", mode="mor", key_guard=10)
    assert res["src_keys"] == 80 and res["rows_replaced"] == 80
    got = decode_table(spark, d)
    assert got.count() == 600
    assert got.filter(F.col("text") == "updated").count() == 80
    assert got.select("url").distinct().count() == 600
    # MOR: history survives
    assert decode_table(spark, d, as_of=snap0["seq"]).count() == 600


def test_merge_cow_above_guard_materializes_sidecars(spark, tmp_path, no_key_collect):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import merge_into

    df, d = _bootstrap(spark, tmp_path, compression="snappy")
    src = df.limit(50).withColumn("lang", F.lit("xx"))
    res = merge_into(spark, d, src, key="url", mode="cow", key_guard=10)
    assert res["rows_replaced"] == 50
    # COW materialized the positional sidecars away
    assert mf.list_delete_files(d) == []
    got = decode_table(spark, d)
    assert got.count() == 600
    assert got.filter(F.col("lang") == "xx").count() == 50
    assert got.select("url").distinct().count() == 600


def test_merge_eq_above_guard_refuses(spark, tmp_path):
    from parquet_go_spark.spark.maintenance import merge_into

    df, d = _bootstrap(spark, tmp_path)
    src = df.limit(50)
    with pytest.raises(ValueError, match="key_guard"):
        merge_into(spark, d, src, key="url", mode="eq", key_guard=10)


def test_mark_matching_keys_is_replay_idempotent(spark, tmp_path):
    from parquet_go_spark.spark.maintenance import mark_matching_keys

    df, d = _bootstrap(spark, tmp_path)
    keys = df.limit(30).select("url")
    first = mark_matching_keys(spark, d, "url", keys)
    assert first["rows_deleted"] == 30
    again = mark_matching_keys(spark, d, "url", keys)
    assert again["rows_deleted"] == 0  # dedup vs on-disk sidecars


def test_materialize_deletes_roundtrip(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import mark_matching_keys, materialize_deletes

    df, d = _bootstrap(spark, tmp_path)
    keys = df.limit(40).select("url")
    mark_matching_keys(spark, d, "url", keys)
    assert len(mf.list_delete_files(d)) > 0
    res = materialize_deletes(spark, d)
    assert mf.list_delete_files(d) == []
    got = decode_table(spark, d)
    assert got.count() == 560
    # the marked urls are gone for real, not just masked
    marked = {r["url"] for r in keys.collect()}
    assert got.filter(F.col("url").isin(list(marked))).count() == 0
    assert res["rewritten"]


def test_materialize_deletes_fully_deleted_partition_stays_empty(spark, tmp_path):
    """All rows of a partition deleted -> rewrite must produce an EMPTY
    typed partition, not resurrect the rows by dropping sidecars."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import mark_matching_keys, materialize_deletes

    df, d = _bootstrap(spark, tmp_path, n=200)
    mark_matching_keys(spark, d, "url", df.select("url"))  # delete everything
    materialize_deletes(spark, d)
    assert mf.list_delete_files(d) == []
    assert decode_table(spark, d).count() == 0


def test_mark_within_scope_spares_appended_rows(spark, tmp_path):
    """The streaming-upsert composition above the guard: append the
    batch, then mark ONLY pre-batch partitions — the batch's own rows
    must survive their own delete (sequence-number semantics)."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import mark_matching_keys

    df, d = _bootstrap(spark, tmp_path, n=300)
    updates = df.limit(60).withColumn("text", F.lit("v2"))
    snaps = mf.read_snapshots(d)
    base_pids = set(snaps[-1]["partition_ids"])
    encode_table(updates, d, key_col="url", partitions=2, append=True, resume=True).collect()
    marked = mark_matching_keys(spark, d, "url", updates.select("url"), within=base_pids)
    assert marked["rows_deleted"] == 60
    got = decode_table(spark, d)
    assert got.count() == 300
    assert got.filter(F.col("text") == "v2").count() == 60
