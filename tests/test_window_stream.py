"""Watermarked windowed streaming aggregation equals the batch answer
once the bounded stream drains."""

from __future__ import annotations

import pytest

from parquet_go_spark.streaming.window_stats import (
    run_to_completion,
    stream_events,
    windowed_event_stats,
)

pytestmark = pytest.mark.spark

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def test_windowed_stream_matches_batch(spark, tmp_path):
    import shutil

    path = str(tmp_path / "events_dir")
    # file-source streams read directories; stage the table as one
    import os

    os.makedirs(path)
    shutil.copy("/root/testdata/sf0.001/events.parquet", path + "/part-0.parquet")
    stream = stream_events(spark, path, EVENTS_DDL, max_files=1)
    stats = windowed_event_stats(stream, window="1 hour", watermark="2 hours")
    name = run_to_completion(stats, "wstats_test")
    got = spark.sql(f"SELECT * FROM {name}").orderBy("window_start", "event_type").collect()

    batch = (
        spark.read.parquet(path + "/part-0.parquet")
        .selectExpr(
            "window(ts, '1 hour').start AS window_start",
            "event_type",
            "value",
        )
        .groupBy("window_start", "event_type")
        .agg({"value": "sum", "*": "count"})
        .withColumnRenamed("sum(value)", "sum_value")
        .withColumnRenamed("count(1)", "n")
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert len(got) == len(batch)
    for g, b in zip(got, batch):
        assert (g["window_start"], g["event_type"], g["n"]) == (
            b["window_start"],
            b["event_type"],
            b["n"],
        )
        assert abs(g["sum_value"] - b["sum_value"]) < 1e-9
