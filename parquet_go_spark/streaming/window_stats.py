"""Watermarked windowed aggregation over an event stream — the standard
Structured Streaming pattern (watermark bounds state for late data) used
here to produce per-window ingestion statistics alongside the encode
sink. The reference has no streaming concepts; this is pure Spark-native
capability the engine's users need for continuous pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["stream_events", "windowed_event_stats", "run_to_completion"]


def stream_events(spark: SparkSession, path: str, schema_ddl: str, max_files: int = 1) -> DataFrame:
    """File-source stream over a parquet directory (replayable)."""
    return (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
) -> DataFrame:
    """Streaming aggregation: per (window, group) counts + value stats,
    tolerating late rows up to the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(group_col),
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def run_to_completion(stats: DataFrame, query_name: str = "window_stats", timeout_s: int = 120):
    """Drain the (bounded file-source) stream into an in-memory table and
    return the SparkSession-queryable result name."""
    q = (
        stats.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(timeout_s)
    return query_name
