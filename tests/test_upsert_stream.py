"""Streaming CDC upsert sink (streaming/upsert_stream.py): each
micro-batch appends its rows and equality-deletes prior versions of its
keys — the table is never read or rewritten on the hot path, and batch
replays are no-ops via the snapshot-logged stream_batch_id marker."""

from __future__ import annotations

import tempfile

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _table(spark, tmp_path, n=300):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    df = pages_df(spark, n, partitions=1)
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col="url", partitions=3, bloom_columns=["url"]).collect()
    mf.commit_snapshot(d, "encode")
    return df, d


def _drive(spark, d, changes_df):
    from parquet_go_spark.streaming.upsert_stream import upsert_stream

    src_dir = tempfile.mkdtemp()
    changes_df.write.mode("overwrite").parquet(f"{src_dir}/in")
    stream = spark.readStream.schema(changes_df.schema).parquet(f"{src_dir}/in")
    q = upsert_stream(stream, d, key="url", partitions=1, checkpoint=f"{src_dir}/ckpt")
    # availableNow is set by the file source default trigger? drive once:
    q.processAllAvailable()
    q.stop()


def test_upsert_stream_merges_changes(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.streaming.upsert_stream import last_upsert_batch

    df, d = _table(spark, tmp_path)
    updates = df.limit(25).withColumn("lang", F.lit("up"))
    _drive(spark, d, updates)
    got = decode_table(spark, d)
    assert got.count() == 300
    assert got.filter(F.col("lang") == "up").count() == 25
    assert last_upsert_batch(d) == 0


def test_upsert_stream_replay_is_noop(spark, tmp_path):
    """Re-delivering the same batch id must not duplicate rows."""
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.streaming.upsert_stream import last_upsert_batch, upsert_stream

    df, d = _table(spark, tmp_path, n=200)
    updates = df.limit(10).withColumn("lang", F.lit("v2"))
    src_dir = tempfile.mkdtemp()
    updates.write.mode("overwrite").parquet(f"{src_dir}/in")
    stream = spark.readStream.schema(updates.schema).parquet(f"{src_dir}/in")
    q = upsert_stream(stream, d, key="url", partitions=1, checkpoint=f"{src_dir}/ckpt")
    q.processAllAvailable()
    q.stop()
    # simulate the replay Structured Streaming performs after a crash:
    # a fresh checkpoint re-delivers batch 0 with the same content
    stream2 = spark.readStream.schema(updates.schema).parquet(f"{src_dir}/in")
    q2 = upsert_stream(stream2, d, key="url", partitions=1, checkpoint=f"{src_dir}/ckpt2")
    q2.processAllAvailable()
    q2.stop()
    got = decode_table(spark, d)
    assert got.count() == 200  # no duplicates
    assert got.filter(F.col("lang") == "v2").count() == 10
    assert last_upsert_batch(d) == 0


def test_upsert_stream_inserts_new_keys(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.pages_table import pages_df

    df, d = _table(spark, tmp_path, n=150)
    # 400..449 of a larger corpus: urls the table has never seen
    fresh = (
        pages_df(spark, 450, partitions=1)
        .withColumn("rn", F.monotonically_increasing_id())
        .filter(F.col("rn") >= 400)
        .drop("rn")
        .withColumn("lang", F.lit("new"))
    )
    _drive(spark, d, fresh)
    got = decode_table(spark, d)
    assert got.filter(F.col("lang") == "new").count() == 50
    assert got.count() == 200
