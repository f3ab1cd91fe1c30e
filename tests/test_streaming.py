"""Streaming encode sink test: rate source -> pages-like rows ->
encode_stream micro-batches -> decode_batches equals the input."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.streaming.encode_stream import batch_dirs, decode_batches, encode_stream

pytestmark = pytest.mark.spark


def test_stream_encode_roundtrip(spark, tmp_path):
    out = str(tmp_path / "stream_enc")
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .load()
        .select(
            F.concat(F.lit("https://s/"), F.col("value")).alias("url"),
            F.col("timestamp").alias("warc_ts"),
            F.encode(F.concat(F.lit("<html>"), F.col("value")), "utf-8").alias("html"),
            F.concat(F.lit("text body "), F.col("value")).alias("text"),
            (F.col("value") % 5).cast("string").alias("lang"),
        )
    )
    q = encode_stream(stream, out, key_col="url", partitions=2, trigger_seconds=1)
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            done = [d for d in batch_dirs(out)]
            if len(done) >= 2:
                try:
                    if decode_batches(spark, out).count() > 0:
                        break
                except Exception:
                    pass
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination(30)
    dec = decode_batches(spark, out)
    n = dec.count()
    assert n > 0
    assert dec.columns == ["url", "warc_ts", "html", "text", "lang"]
    # url uniqueness preserved across batches
    assert dec.select("url").distinct().count() == n
