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


def last_upsert_batch(enc_dir: str, txn_id: str | None = None) -> int:
    """Highest stream_batch_id recorded in the snapshot log (-1 if
    none) — the replay guard. ``txn_id`` scopes the guard to ONE
    streaming query's batch-id numbering (Delta's txnAppId pattern):
    batch ids restart at 0 whenever the checkpoint is recreated, so an
    unscoped max would silently discard every batch of a restarted
    query until it outran the previous run's counter. Snapshots written
    before txn scoping (no stream_txn recorded) match any txn for
    backward compatibility."""
    last = -1
    for snap in mf.read_snapshots(enc_dir):
        cfg = snap.get("config", {})
        bid = cfg.get("stream_batch_id")
        if bid is None:
            continue
        snap_txn = cfg.get("stream_txn")
        if txn_id is not None and snap_txn is not None and snap_txn != txn_id:
            continue
        last = max(last, int(bid))
    return last


def _checkpoint_txn_id(checkpoint: str) -> str:
    """Stable identity of ONE streaming query run-series: the engine's
    own query id from ``<checkpoint>/metadata`` (written at query start,
    REGENERATED when the checkpoint is recreated — exactly the event
    that resets batch-id numbering). Falls back to the checkpoint path
    before the engine has written it."""
    import json

    try:
        with open(os.path.join(checkpoint, "metadata")) as f:
            qid = json.load(f).get("id")
        if qid:
            return str(qid)
    except (OSError, ValueError):
        pass
    return os.path.abspath(checkpoint)


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
    ckpt = checkpoint or os.path.join(enc_dir, "_upsert_checkpoint")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        txn = _checkpoint_txn_id(ckpt)
        if batch_id <= last_upsert_batch(enc_dir, txn):
            return  # replayed batch: already fully applied BY THIS QUERY
        # dedup KEYED rows only: dropDuplicates treats NULL keys as
        # equal, which would silently keep one unkeyed row per batch
        keyed = batch_df.where(batch_df[key].isNotNull()).dropDuplicates([key])
        unkeyed = batch_df.where(batch_df[key].isNull())
        src = keyed.unionByName(unkeyed)
        src_keys = keyed.select(key).distinct()
        n_keys = src_keys.count()
        n_rows = src.count()
        snaps = mf.read_snapshots(enc_dir)
        base_pids = set(snaps[-1]["partition_ids"]) if snaps else set()
        marker = {"stream_batch_id": int(batch_id), "stream_txn": txn}
        if n_rows:
            # unkeyed rows are pure inserts (nothing to match); a batch
            # of ONLY unkeyed rows previously vanished — appended, then
            # the marker advanced as if applied
            encode_table(
                src,
                enc_dir,
                key_col=key,
                partitions=partitions,
                append=True,
                resume=True,
                **encode_kwargs,
            ).collect()
        if n_keys and n_keys <= key_guard:
            keys = [r[0] for r in src_keys.collect()]
            delete_keys(
                enc_dir,
                key,
                keys,
                within=base_pids,
                extra_config=marker,
            )
        elif n_keys:
            spark = src.sparkSession
            marked = mark_matching_keys(spark, enc_dir, key, src_keys, within=base_pids)
            mf.commit_snapshot(
                enc_dir,
                "merge",
                {
                    **marker,
                    "mode": "mor",
                    "src_keys": n_keys,
                    "rows_replaced": marked["rows_deleted"],
                },
            )
        else:  # empty or unkeyed-only batch: advance the marker
            mf.commit_snapshot(enc_dir, "merge", marker)

    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    writer = writer.option("checkpointLocation", ckpt)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
