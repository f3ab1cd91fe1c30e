"""Incremental snapshot-diff reads (Iceberg incremental append scan):
``read_changes(from_seq, to_seq)`` returns exactly the rows appended in
the window, as visible at ``to_seq`` (its delete sidecars apply), and
refuses windows that in-place rewrites have invalidated.
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
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path_factory.mktemp("inc") / "enc")
    df, thirds = _thirds(spark)
    encode_table(thirds[0], d, key_col="url", partitions=4).collect()
    mf.commit_snapshot(d, "encode")
    for part in thirds[1:]:
        encode_table(part, d, key_col="url", partitions=4, append=True).collect()
        mf.commit_snapshot(d, "append")
    return d, df, thirds


def _urls(df):
    return set(r.url for r in df.select("url").collect())


def test_changes_between_consecutive_snapshots(spark, versioned_table):
    from parquet_go_spark.spark.decode_job import read_changes

    d, _, thirds = versioned_table
    got = read_changes(spark, d, from_seq=0, to_seq=1)
    assert _urls(got) == _urls(thirds[1])
    # to_seq defaults to the latest snapshot
    got = read_changes(spark, d, from_seq=1)
    assert _urls(got) == _urls(thirds[2])


def test_changes_span_multiple_appends(spark, versioned_table):
    from parquet_go_spark.spark.decode_job import read_changes

    d, _, thirds = versioned_table
    got = read_changes(spark, d, from_seq=0, to_seq=2)
    assert _urls(got) == _urls(thirds[1]) | _urls(thirds[2])


def test_empty_window_and_bad_order(spark, versioned_table):
    from parquet_go_spark.spark.decode_job import read_changes

    d, df, _ = versioned_table
    empty = read_changes(spark, d, from_seq=2, to_seq=2)
    assert empty.count() == 0
    assert empty.schema == df.schema
    with pytest.raises(ValueError, match="after"):
        read_changes(spark, d, from_seq=2, to_seq=1)


def test_changes_apply_to_seq_deletes(spark, tmp_path):
    """A row appended then MOR-deleted inside the window is not reported;
    reading up to the pre-delete version still reports it."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import read_changes
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import delete_where
    from parquet_go_spark.spark.pages_table import pages_df

    d = str(tmp_path / "enc")
    df = pages_df(spark, 300, partitions=1)
    a = df.filter(F.abs(F.xxhash64("url")) % 2 == 0)
    b = df.filter(F.abs(F.xxhash64("url")) % 2 == 1)
    encode_table(a, d, key_col="url", partitions=2).collect()
    mf.commit_snapshot(d, "encode")  # seq 0
    encode_table(b, d, key_col="url", partitions=2, append=True).collect()
    mf.commit_snapshot(d, "append")  # seq 1
    victim = b.select("url").limit(1).collect()[0].url
    delete_where(spark, d, [("url", "==", victim)], mode="mor")  # seq 2
    pre = read_changes(spark, d, from_seq=0, to_seq=1)
    assert victim in _urls(pre)
    post = read_changes(spark, d, from_seq=0, to_seq=2)
    assert victim not in _urls(post)
    assert post.count() == b.count() - 1


def test_changes_window_invalidated_by_rewrite(spark, tmp_path):
    """A COW delete rewrites partitions in place and tombstones the
    snapshots that pinned them — the diff raises instead of lying."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import read_changes
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import delete_where
    from parquet_go_spark.spark.pages_table import pages_df

    d = str(tmp_path / "enc")
    df = pages_df(spark, 300, partitions=1)
    encode_table(df, d, key_col="url", partitions=2).collect()
    mf.commit_snapshot(d, "encode")  # seq 0
    victim = df.select("url").limit(1).collect()[0].url
    delete_where(spark, d, [("url", "==", victim)])  # COW: seq 0 tombstoned
    with pytest.raises(ValueError, match="invalidated"):
        read_changes(spark, d, from_seq=0)


def test_changes_projection_and_prune(spark, versioned_table):
    from parquet_go_spark.spark.decode_job import read_changes

    d, _, thirds = versioned_table
    got = read_changes(spark, d, from_seq=0, to_seq=1, columns=["url", "lang"])
    assert got.columns == ["url", "lang"]
    assert got.count() == thirds[1].count()
    some = thirds[1].select("url").limit(1).collect()[0].url
    one = read_changes(spark, d, from_seq=0, to_seq=1, prune=[("url", "==", some)])
    assert some in _urls(one)
