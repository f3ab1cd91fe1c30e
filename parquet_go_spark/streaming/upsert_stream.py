"""Streaming CDC upsert sink: continuously merge a keyed change stream
into ONE encoded table — the Iceberg "upsert mode" / Delta
merge-in-foreachBatch pattern, built on equality deletes so the hot
path never reads the table.

Per micro-batch (inside ``foreachBatch``):

1. replay guard — the last applied ``stream_batch_id`` lives in the
   snapshot log; a re-delivered batch id is a no-op (Structured
   Streaming re-runs batch N after a crash).
2. APPEND the batch (``encode_table(append=True, resume=True)``): the
   crash-safe step — no snapshot intervenes, so a replay resumes the
   same partition ids and already-committed partitions are skipped.
3. EQUALITY-DELETE the batch's keys, scoped (``within=``) to the
   partitions of the PRE-batch snapshot: old versions of the keys die,
   the rows appended in step 2 survive their own delete, and the
   sidecar write is O(metadata) — stats/bloom-scoped, no data scan.
4. the delete's snapshot carries ``stream_batch_id`` — committing the
   marker and the batch's table version atomically.

Scale shape: per batch, one salted append exchange + one driver-side
metadata op. The table never gets rewritten on the hot path; read
amplification from accumulated sidecars is bounded by compacting on a
schedule (``maintenance.compact_table`` materializes all deletes).

A reader between steps 2 and 3 can transiently see both row versions
(this engine's current-read sees committed partitions, not snapshots);
readers that pin ``as_of`` a snapshot seq never do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..spark import manifest as mf
from ..spark.encode_job import encode_table
from ..spark.maintenance import delete_keys, mark_matching_keys

__all__ = ["upsert_stream", "last_upsert_batch"]


def last_upsert_batch(enc_dir: str) -> int:
    """Highest stream_batch_id recorded in the snapshot log (-1 if
    none) — the replay guard."""
    last = -1
    for snap in mf.read_snapshots(enc_dir):
        bid = snap.get("config", {}).get("stream_batch_id")
        if bid is not None:
            last = max(last, int(bid))
    return last


def upsert_stream(
    stream_df: DataFrame,
    enc_dir: str,
    key: str,
    partitions: int = 2,
    checkpoint: str | None = None,
    trigger_seconds: float | None = None,
    key_guard: int = 200_000,
    **encode_kwargs,
):
    """Start the streaming upsert into ``enc_dir`` (must already be an
    encoded table — bootstrap with ``encode_table``); returns the
    StreamingQuery. Each micro-batch is deduplicated on ``key`` (last
    occurrence order is not defined within a batch; upstream should
    send one change per key per batch, the usual CDC contract).

    Batches with at most ``key_guard`` distinct keys take the
    equality-delete hot path (one driver-collected key list → one
    metadata-only sidecar, no table read). A larger batch never sends
    its keys through the driver: ``mark_matching_keys`` runs the
    distributed scan + semi-join + positional sidecars, scoped to the
    pre-batch partitions. Replays are safe in both regimes (the marker
    snapshot guard, and the mark's dedup against on-disk sidecars)."""
    if not os.path.exists(os.path.join(enc_dir, "_schema.json")):
        raise ValueError(f"{enc_dir} is not an encoded table (bootstrap with encode_table)")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_upsert_batch(enc_dir):
            return  # replayed batch: already fully applied
        src = batch_df.dropDuplicates([key])
        src_keys = src.select(key).where(src[key].isNotNull()).distinct()
        n_keys = src_keys.count()
        snaps = mf.read_snapshots(enc_dir)
        base_pids = set(snaps[-1]["partition_ids"]) if snaps else set()
        if n_keys:
            encode_table(
                src,
                enc_dir,
                key_col=key,
                partitions=partitions,
                append=True,
                resume=True,
                **encode_kwargs,
            ).collect()
            if n_keys <= key_guard:
                keys = [r[0] for r in src_keys.collect()]
                delete_keys(
                    enc_dir,
                    key,
                    keys,
                    within=base_pids,
                    extra_config={"stream_batch_id": int(batch_id)},
                )
            else:
                spark = src.sparkSession
                marked = mark_matching_keys(spark, enc_dir, key, src_keys, within=base_pids)
                mf.commit_snapshot(
                    enc_dir,
                    "merge",
                    {
                        "stream_batch_id": int(batch_id),
                        "mode": "mor",
                        "src_keys": n_keys,
                        "rows_replaced": marked["rows_deleted"],
                    },
                )
        else:  # empty batch: just advance the marker
            mf.commit_snapshot(enc_dir, "merge", {"stream_batch_id": int(batch_id)})

    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    writer = writer.option(
        "checkpointLocation", checkpoint or os.path.join(enc_dir, "_upsert_checkpoint")
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
