"""Streaming exact dedup (streaming/dedup_stream.py): duplicates inside
the watermark horizon collapse; distinct content passes; state keys on
the 16-byte fingerprint, never the text."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.streaming.dedup_stream import dedup_stream

pytestmark = pytest.mark.spark


def _run_batches(spark, rows, within="10 minutes"):
    """Drive dedup_stream over a MemoryStream-fed micro-batch query and
    return the collected output rows."""
    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    src = spark.createDataFrame(rows, schema)
    # availableNow over a file source: write the batch, stream it back
    import tempfile

    d = tempfile.mkdtemp()
    src.write.mode("overwrite").parquet(f"{d}/in")
    stream = spark.readStream.schema(schema).parquet(f"{d}/in")
    out = dedup_stream(stream, within=within)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", f"{d}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("select * from dedup_out").collect()


def test_duplicates_within_horizon_collapse(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("https://a/1", t0, "same body"),
        ("https://a/2", t0 + dt.timedelta(minutes=1), "same body"),  # dup
        ("https://b/1", t0 + dt.timedelta(minutes=2), "other body"),
        ("https://b/2", t0 + dt.timedelta(minutes=3), "other body"),  # dup
        ("https://c/1", t0 + dt.timedelta(minutes=4), "third body"),
    ]
    got = _run_batches(spark, rows)
    texts = sorted(r["text"] for r in got)
    assert texts == ["other body", "same body", "third body"]
    # output schema is the input schema: the fingerprint never leaks
    assert sorted(got[0].asDict()) == ["text", "url", "warc_ts"]


def test_null_text_passes_through_never_dedups(spark):
    """NULL text must NOT form a dedup key: the earlier sentinel
    fingerprint collapsed every failed-fetch row inside the horizon
    into one 'duplicate' group and silently dropped the rest from the
    ingest stream — the very bug the batch exact_dedup was fixed for
    (two failed fetches of DIFFERENT urls are not duplicates of each
    other). Null-text rows pass through a stateless branch."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        ("https://a/1", t0, None),
        ("https://a/2", t0, None),  # distinct failed fetch: must survive
        ("https://a/3", t0, "real"),
        ("https://a/4", t0, "real"),  # true duplicate: collapses
    ]
    got = _run_batches(spark, rows)
    assert sorted((r["text"] or "~null") for r in got) == ["real", "~null", "~null"]
    assert {r["url"] for r in got if r["text"] is None} == {"https://a/1", "https://a/2"}
