"""Streaming encode sink: continuous ingestion of a streaming DataFrame
into encoded chunk directories, one per micro-batch.

The reference has no streaming concepts (SURVEY.md §2.3); its nearest
mechanism is incremental row-group flushing (``file_writer.go:280-290``).
The Spark-native analogue is ``foreachBatch``: every micro-batch runs the
same salted-repartition encode job into ``out_dir/batch-<id>``, with the
same atomic per-partition manifest commits — so a crashed batch resumes
(partitions already committed are skipped) and replays are idempotent
(Structured Streaming re-runs a batch id; resume makes the rerun a no-op).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from ..spark.decode_job import decode_table
from ..spark.encode_job import encode_table

__all__ = ["encode_stream", "decode_batches", "batch_dirs"]


def encode_stream(
    stream_df: DataFrame,
    out_dir: str,
    key_col: str | None = None,
    partitions: int | None = None,
    profile: str = "auto",
    compression: str = "none",
    checkpoint: str | None = None,
    trigger_seconds: float | None = None,
):
    """Start the streaming encode; returns the StreamingQuery."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bdir = os.path.join(out_dir, f"batch-{batch_id:06d}")
        encode_table(
            batch_df,
            bdir,
            key_col=key_col,
            partitions=partitions,
            profile=profile,
            compression=compression,
            resume=True,  # idempotent under Structured Streaming replays
        ).collect()

    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    writer = writer.option("checkpointLocation", checkpoint or os.path.join(out_dir, "_checkpoint"))
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def batch_dirs(out_dir: str) -> list[str]:
    return sorted(
        d for d in glob.glob(os.path.join(out_dir, "batch-*")) if os.path.isdir(d)
    )


def decode_batches(
    spark: SparkSession, out_dir: str, columns: list[str] | None = None
) -> DataFrame:
    """Union of all committed micro-batches, decoded."""
    dirs = [d for d in batch_dirs(out_dir) if os.path.exists(os.path.join(d, "_schema.json"))]
    if not dirs:
        raise ValueError(f"no encoded batches under {out_dir}")
    out = None
    for d in dirs:
        df = decode_table(spark, d, columns=columns)
        out = df if out is None else out.unionByName(df)
    return out
