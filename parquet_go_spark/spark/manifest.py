"""Parquet-backed manifest directory with atomic per-partition commits —
the Iceberg-metadata-table analogue for this sandbox (no Iceberg jars):
each task writes ``_manifest/part-<id>.parquet`` via tmp+rename, so a
partition is committed iff its manifest file exists; resume anti-joins
pending partitions against the committed set (the reference analogue is
row-group skipping, ``chunk_reader.go:271-297``).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("column", pa.string()),
        ("ptype", pa.string()),
        ("encoding", pa.string()),
        ("compression", pa.string()),
        ("num_rows", pa.int64()),
        ("null_count", pa.int64()),
        ("distinct", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("encoded_bytes", pa.int64()),
        ("num_pages", pa.int32()),
        ("crc32", pa.int64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("bloom", pa.binary()),
        ("file", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)

MANIFEST_DDL = (
    "partition int, column string, ptype string, encoding string, "
    "compression string, num_rows long, null_count long, distinct long, "
    "raw_bytes long, encoded_bytes long, num_pages int, crc32 long, "
    "min_str string, max_str string, bloom binary, file string, offset long, length long"
)


def manifest_dir(out_dir: str) -> str:
    # no leading underscore: Spark's file index treats _*/.*-prefixed paths
    # as hidden, and the manifest must be readable as a Spark table
    return os.path.join(out_dir, "manifest")


def part_manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{pid:05d}.parquet")


def commit_partition(out_dir: str, pid: int, rows: list[dict]):
    """Atomically write one partition's manifest rows (tmp + rename)."""
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = part_manifest_path(out_dir, pid)
    tmp = path + f".tmp.{os.getpid()}"
    cols = {f.name: [r.get(f.name) for r in rows] for f in MANIFEST_SCHEMA}
    table = pa.Table.from_pydict(cols, schema=MANIFEST_SCHEMA)
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def committed_partitions(out_dir: str) -> set[int]:
    out = set()
    for p in glob.glob(os.path.join(manifest_dir(out_dir), "part-*.parquet")):
        name = os.path.basename(p)
        try:
            out.add(int(name[len("part-") : -len(".parquet")]))
        except ValueError:
            continue
    return out


def read_partition_manifest(out_dir: str, pid: int) -> list[dict]:
    return pq.read_table(part_manifest_path(out_dir, pid)).to_pylist()


def read_manifest(spark, out_dir: str):
    return spark.read.schema(MANIFEST_DDL).parquet(os.path.join(manifest_dir(out_dir)))


# ------------------------------------------------------- snapshot lineage
def snapshot_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "snapshots")


def commit_snapshot(out_dir: str, operation: str, config: dict | None = None) -> dict:
    """Append one job-level snapshot (Iceberg-snapshot analogue): a
    sequenced, immutable JSON record of what is committed right now —
    partition count, byte totals, per-encoding mix, the job config, and
    the parent snapshot. Written tmp+rename, so readers only ever see
    complete snapshots; the latest sequence number is the table's current
    version. Call after the encode job's manifest DataFrame has been
    acted on (the partitions are committed by then)."""
    import time as _time

    os.makedirs(snapshot_dir(out_dir), exist_ok=True)
    existing = sorted(glob.glob(os.path.join(snapshot_dir(out_dir), "snap-*.json")))
    # seq counts invalidated tombstones too (snap-*.json.invalid):
    # a burned seq is never reused
    all_seqs = [
        int(os.path.basename(p)[len("snap-") :][:6])
        for p in glob.glob(os.path.join(snapshot_dir(out_dir), "snap-*.json*"))
    ]
    seq = (max(all_seqs) + 1) if all_seqs else 0
    parent = None
    if existing:
        with open(existing[-1]) as f:
            parent = json.load(f)["seq"]
    total_raw = total_enc = n_rows = 0
    encodings: dict[str, int] = {}
    pids = committed_partitions(out_dir)
    first_col = None
    for pid in sorted(pids):
        for r in read_partition_manifest(out_dir, pid):
            total_raw += r["raw_bytes"]
            total_enc += r["encoded_bytes"]
            encodings[r["encoding"]] = encodings.get(r["encoding"], 0) + 1
            if first_col is None:
                first_col = r["column"]
            if r["column"] == first_col:
                n_rows += r["num_rows"]
    snap = {
        "seq": seq,
        "parent": parent,
        "ts": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
        "operation": operation,
        "partitions": len(pids),
        # the committed-partition set IS the table version: pinning it
        # here is what makes snapshots functional (time travel, rollback)
        # rather than descriptive — the Iceberg manifest-list analogue
        "partition_ids": sorted(pids),
        "num_rows": n_rows,
        "raw_bytes": total_raw,
        "encoded_bytes": total_enc,
        "encodings": encodings,
        "config": config or {},
    }
    path = os.path.join(snapshot_dir(out_dir), f"snap-{seq:06d}.json")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.replace(tmp, path)
    return snap


def read_snapshots(out_dir: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(snapshot_dir(out_dir), "snap-*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


def snapshot_partitions(out_dir: str, seq: int) -> set[int]:
    """The partition-id set pinned by snapshot ``seq`` — the read set for
    time travel (``decode_table(as_of=seq)``) and the keep set for
    rollback. Raises if the snapshot is missing or predates partition
    pinning (an expired or legacy snapshot is not silently 'everything')."""
    path = os.path.join(snapshot_dir(out_dir), f"snap-{seq:06d}.json")
    if not os.path.exists(path):
        if os.path.exists(path + ".invalid"):
            raise ValueError(
                f"snapshot seq={seq} was invalidated by an in-place rewrite "
                "(delete/merge/rollback touched its partitions)"
            )
        raise ValueError(f"no snapshot seq={seq} at {snapshot_dir(out_dir)} (expired?)")
    with open(path) as f:
        snap = json.load(f)
    ids = snap.get("partition_ids")
    if ids is None:
        raise ValueError(f"snapshot seq={seq} has no pinned partition set (legacy snapshot)")
    return set(ids)


def next_partition_base(out_dir: str) -> int:
    """First free partition id for an append job: one past the highest id
    in the LATEST SNAPSHOT (not the committed set) so a crashed append
    attempt — which left committed partitions above the base but no
    snapshot — resumes at the same base and its per-partition manifest
    commits are replayed, not orphaned. Falls back to the committed set
    when the table has no snapshots yet."""
    snaps = read_snapshots(out_dir)
    if snaps and snaps[-1].get("partition_ids") is not None:
        ids = snaps[-1]["partition_ids"]
        return (max(ids) + 1) if ids else 0
    pids = committed_partitions(out_dir)
    return (max(pids) + 1) if pids else 0


def invalidate_snapshots(out_dir: str, rewritten_pids: set[int]) -> list[int]:
    """Remove snapshot records whose pinned partition set intersects
    ``rewritten_pids`` — after an in-place rewrite (delete/merge) those
    versions are physically unreproducible, and ``as_of`` must raise
    'expired' rather than silently read the rewritten bytes under the old
    ids. Snapshots pinning only untouched partitions stay valid."""
    removed = []
    for p in sorted(glob.glob(os.path.join(snapshot_dir(out_dir), "snap-*.json"))):
        with open(p) as f:
            snap = json.load(f)
        ids = set(snap.get("partition_ids") or [])
        if ids & set(rewritten_pids):
            removed.append(snap["seq"])
            # rename, don't delete: the tombstone keeps the seq burned so
            # no future snapshot reuses it (as_of an old seq must raise,
            # never resolve to different data)
            os.replace(p, p + ".invalid")
    return removed


def expire_snapshots(out_dir: str, keep_last: int = 1) -> list[int]:
    """Delete all but the newest ``keep_last`` snapshot records (metadata
    only — no data files are touched; partitions are removed by
    ``maintenance.rollback_table`` or overwrite). Returns removed seqs.
    Expired seqs are no longer time-travelable, same contract as
    Iceberg's expire_snapshots."""
    if keep_last < 1:
        raise ValueError("expire_snapshots keeps at least the current snapshot")
    paths = sorted(glob.glob(os.path.join(snapshot_dir(out_dir), "snap-*.json")))
    removed = []
    for p in paths[:-keep_last] if keep_last else paths:
        with open(p) as f:
            removed.append(json.load(f)["seq"])
        os.remove(p)
    return removed


def evolve_table_schema(existing: list[dict], incoming: list[dict]) -> list[dict]:
    """Merge an appended batch's schema into the table schema
    (Iceberg-style evolution): columns on both sides must keep their
    type; columns only in ``incoming`` are added at the end; columns only
    in ``existing`` stay (the appended partitions simply don't write
    them, and decode fills nulls either way). Returns the merged field
    list in table order."""
    by_name = {f["name"]: f for f in existing}
    for f in incoming:
        old = by_name.get(f["name"])
        if old is not None and old["ddl"] != f["ddl"]:
            raise ValueError(
                f"schema evolution cannot change column {f['name']!r} "
                f"from {old['ddl']} to {f['ddl']}"
            )
    return existing + [f for f in incoming if f["name"] not in by_name]


def write_table_schema(out_dir: str, fields: list[dict]):
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "_schema.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"fields": fields}, f)
    os.replace(tmp, os.path.join(out_dir, "_schema.json"))


def read_table_schema(out_dir: str) -> list[dict]:
    with open(os.path.join(out_dir, "_schema.json")) as f:
        return json.load(f)["fields"]
