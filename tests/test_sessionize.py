"""Custom stateful streaming operator test: sessionization over a
bounded event stream matches batch-computed closed sessions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.streaming.sessionize import sessionize

pytestmark = pytest.mark.spark

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
)


def test_sessionize_stream(spark, tmp_path):
    import os
    import shutil

    src = str(tmp_path / "events_dir")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/part-0.parquet")

    stream = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("user_id", "ts", "value")
    )
    GAP = 600  # 10 min
    sessions = sessionize(stream, gap_seconds=GAP)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_test")
        .start()
    )
    # NOTE: processAllAvailable() never settles with ProcessingTimeTimeout
    # (registered timeouts keep scheduling micro-batches) — poll the sink
    # until the closed-session count is stable instead
    import time

    deadline = time.time() + 120
    last, stable = -1, 0
    try:
        while time.time() < deadline and stable < 3:
            time.sleep(3)
            n = spark.sql("SELECT count(*) c FROM sess_test").collect()[0]["c"]
            stable = stable + 1 if (n == last and n > 0) else 0
            last = n
    finally:
        try:
            q.stop()  # may interrupt a timeout micro-batch mid-commit
        except Exception:
            pass
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }

    # batch reference: sessions via lag-gap cumulative ids; only CLOSED
    # sessions (a later event exists for that user) are emitted by the
    # stream before its timeout fires
    batch = spark.read.parquet(src).select("user_id", "ts", "value")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    secs = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731 (NTZ-safe)
    with_gap = batch.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "new_sess",
        (F.col("prev").isNull() | (secs("ts") - secs("prev") >= GAP)).cast("int"),
    )
    sess = (
        with_gap.withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )
    last_sess = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    closed = sess.join(last_sess, "user_id").filter(F.col("sid") < F.col("max_sid"))
    want = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in closed.collect()
    }
    # every batch-closed session must be emitted by the stream with
    # identical aggregates
    for k, v in want.items():
        assert k in got, f"missing closed session {k}"
        assert got[k][0] == v[0]
        assert abs(got[k][1] - v[1]) < 1e-9
