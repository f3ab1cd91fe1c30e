"""Streaming exact dedup for the ingest path: drop re-crawled /
re-queued duplicate documents INSIDE the stream, before they reach the
encode sink, with bounded state.

Two layers, both built on Spark's native streaming state machinery (no
custom state op needed — ``dropDuplicatesWithinWatermark`` keys the
state store and the watermark retires old keys, so state is bounded by
the dedup horizon rather than the stream's lifetime):

* key dedup — the md5 content fingerprint (the same 16-byte identity
  ``ops.dedup.exact_dedup`` shuffles on) computed inside the stream, so
  full document text never becomes a state-store key;
* horizon — ``within`` bounds how far apart two duplicates may arrive
  and still collapse; re-crawls outside the horizon re-ingest (that is
  the correct semantics for refresh crawls: content re-validation).

The reference has no streaming concepts (SURVEY.md §2.3); this is the
north star's continuous-ingestion complement to the batch dedup ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dedup_stream"]


def dedup_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "warc_ts",
    within: str = "10 minutes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Streaming DataFrame -> streaming DataFrame with exact duplicates
    (same content fingerprint, arriving within the watermark horizon)
    dropped.

    State shape at scale: the state store keys on (fingerprint + extra
    keys) — 16 bytes + keys per distinct document seen inside the
    horizon, partitioned by the shuffle on the dedup key; the watermark
    on ``ts_col`` retires entries past ``within``, so executor state is
    O(ingest_rate × horizon), independent of total stream length.

    NULL text never dedups: the old coalesce-to-sentinel fingerprint
    collapsed every failed-fetch document inside the horizon into ONE
    'duplicate' group and silently dropped all but the first from the
    ingest stream — the exact bug the batch ``exact_dedup`` was fixed
    for. Null-text rows ride a stateless passthrough branch instead."""
    base = stream_df.withWatermark(ts_col, within)
    keyed = (
        base.where(F.col(text_col).isNotNull())
        .withColumn("__fp", F.md5(F.col(text_col).cast("string")))
    )
    deduped = keyed.dropDuplicatesWithinWatermark(["__fp", *(extra_keys or [])]).drop("__fp")
    return deduped.unionByName(base.where(F.col(text_col).isNull()))
