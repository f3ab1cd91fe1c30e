"""Python DataSource (Spark 4.x `pyspark.sql.datasource`) for encoded
tables: ``spark.read.format("pgs").load(dir)``.

This is the Catalyst-native front door to the same read path
``decode_table`` drives by hand: the table schema comes from the
directory's ``_schema.json``, one Spark input partition per committed
encode partition, and **filter pushdown** (``pushFilters``, Spark 4.1)
feeds equality/range predicates into the engine's three pruning tiers —
manifest min/max, manifest bloom filters, and per-page stats
(``chunk_page_index`` page-seek decode).  All pruning is conservative,
so every pushed filter is also returned to Spark for exact
re-evaluation (the zone-map contract; same division of labor as
Spark's parquet source with ``spark.sql.parquet.filterPushdown``).

Usage::

    spark.dataSource.register(PGSDataSource)
    df = spark.read.format("pgs").load("/path/to/enc")
    df.where(df.url == "https://a.example/1").collect()   # pruned scan

The reference has no Spark integration (it is a Go library); this module
is the idiomatic-Spark analogue of its ``FileReader`` + column projection
(``file_reader.go:112-130``) surfaced through the DataFrame API.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import datetime as _dt

from ..core.columns import one_chunk
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)

__all__ = ["PGSDataSource"]

_EPOCH_DATE = _dt.date(1970, 1, 1)


@dataclass
class _PGSPartition(InputPartition):
    pid: int


def _pushdown_enabled() -> bool | None:
    """Is ``spark.sql.python.filterPushdown.enabled`` on for this read?

    Spark 4.x hard-fails any Python DataSource whose reader *defines*
    ``pushFilters`` while the conf is off, so the reader class must be
    chosen per-session.  Two probes, then "unknown":

    - documented surface first: the active session's runtime conf
      (available on the driver; planner workers have no session).
    - worker path (no session): with the conf ON, ``DataSource.reader()``
      is invoked by the dedicated pushdown planner worker
      (``pyspark/sql/worker/data_source_pushdown_filters.py``), whose
      very purpose is to call ``pushFilters``; with it OFF, it is
      invoked by ``plan_data_source_read.main``, which holds the conf as
      its ``enable_pushdown`` local (the same value it later uses for
      the hard check).  A short walk up the stack distinguishes the two
      — and the local is only trusted when its frame actually belongs to
      that pyspark worker module, so unrelated code defining an
      ``enable_pushdown`` variable can never misreport.  Probed against
      pyspark 4.1.x (pinned by ``test_datasource.py``'s vanilla-session
      matrix — a pyspark refactor that renames either surface degrades
      to the safe no-pushdown reader, and that test catches the lost
      pruning).

    Unknown ⇒ the caller must pick the no-pushdown reader: pruning is an
    optimization (Spark re-applies every filter), a crash is not.
    """
    import sys

    try:
        from pyspark.sql import SparkSession

        s = SparkSession.getActiveSession()
        if s is not None:
            v = s.conf.get("spark.sql.python.filterPushdown.enabled", "false")
            return str(v).lower() == "true"
    except Exception:
        pass
    try:
        f = sys._getframe(1)
        while f is not None:
            fname = f.f_code.co_filename
            if fname.endswith("data_source_pushdown_filters.py"):
                return True
            if (
                fname.endswith("plan_data_source_read.py")
                and "enable_pushdown" in f.f_locals
            ):
                return bool(f.f_locals["enable_pushdown"])
            f = f.f_back
    except Exception:
        pass
    return None


def _choose_reader(opt: str | None, with_pushdown: type, without: type) -> type:
    if opt is not None:
        return with_pushdown if str(opt).lower() in ("true", "1", "yes") else without
    enabled = _pushdown_enabled()
    return with_pushdown if enabled else without


def _prune_value(value):
    """Normalize a catalyst literal to the engine's stored representation;
    None when no safe mapping exists (pruning skipped for that filter).
    Timestamps are stored as int64 epoch micros, dates as int32 epoch
    days — exactly what the chunk stats compare against."""
    if isinstance(value, bool):
        return None  # bool chunks carry no comparable stats
    if isinstance(value, _dt.datetime):
        tz_off = value.utcoffset()
        if tz_off is not None:
            value = value.replace(tzinfo=None) - tz_off
        return (value - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
    if isinstance(value, _dt.date):
        return (value - _EPOCH_DATE).days
    if isinstance(value, (int, float, str, bytes)):
        return value
    return None  # decimal etc.: skip rather than risk a wrong exclusion


def _filter_to_prune(f: Filter) -> list[tuple]:
    """Translate a catalyst filter into (col, op, value) prune triples;
    [] when it isn't prunable (nested path, unsupported op/value).
    Strict < and > push as their inclusive forms, StartsWith as a prefix
    range — pruning is conservative and Spark re-applies the exact
    predicate anyway."""
    if len(f.attribute) != 1:  # nested column paths carry no chunk stats
        return []
    col = f.attribute[0]
    if isinstance(f, IsNotNull):
        return [(col, "notnull", None)]
    if isinstance(f, In):
        vals = tuple(_prune_value(v) for v in f.value)
        if not vals or any(v is None for v in vals):
            return []
        return [(col, "in", vals)]
    if isinstance(f, StringStartsWith):
        p = f.value
        if not isinstance(p, str) or not p:
            return []
        triples = [(col, ">=", p)]
        # conservative upper bound: increment the last non-maxed char
        # (Parquet's truncate-and-increment); all-maxed prefix -> no bound
        for i in range(len(p) - 1, -1, -1):
            if ord(p[i]) < 0x10FFFF:
                triples.append((col, "<=", p[:i] + chr(ord(p[i]) + 1)))
                break
        return triples
    if not isinstance(f, (EqualTo, LessThan, LessThanOrEqual, GreaterThan, GreaterThanOrEqual)):
        return []
    value = _prune_value(f.value)
    if value is None:
        return []
    if isinstance(f, EqualTo):
        return [(col, "==", value)]
    if isinstance(f, (LessThan, LessThanOrEqual)):
        return [(col, "<=", value)]
    return [(col, ">=", value)]


def _decode_partition_to_batches(
    enc_dir: str,
    fields: list[dict],
    pid: int,
    prune: list[tuple],
    delete_files: list[str] | None = None,
    eq_files: list[str] | None = None,
):
    """Decode one committed partition file -> Arrow batch iterator;
    shared by the batch reader and the stream reader. ``delete_files``/
    ``eq_files`` pin the merge-on-read sidecar apply sets (time travel);
    None applies every sidecar on disk (current read)."""
    import os

    from . import manifest as mf
    from .decode_job import decode_blobs_to_batch, logical_of_ddl
    from .encode_job import parse_partition_file

    if pid < 0:
        return
    path = os.path.join(enc_dir, f"part-{pid:05d}.bin")
    with open(path, "rb") as fh:
        payload = fh.read()
    from .encode_job import partition_file_epoch

    # sidecar staleness is judged against the epoch of the bytes we just
    # read, so a concurrent in-place rewrite can never make us apply old
    # ordinals to new data (or new ordinals to old data — that raises).
    # A non-None delete_files here IS a time-travel pin: older-epoch or
    # missing pinned sidecars raise 'invalidated' instead of silently
    # serving post-rewrite bytes as the old version.
    dpos = mf.delete_positions(
        enc_dir,
        pid,
        files=delete_files,
        file_epoch=partition_file_epoch(payload),
        pinned=delete_files is not None,
    )
    eq_specs = mf.eq_deletes_by_pid(enc_dir, eq_files).get(pid)
    cols = [f["name"] for f in fields]
    want = set(cols) | {p[0] for p in prune}
    blobs = parse_partition_file(payload, want)
    missing = set(cols) - set(blobs)
    fallback = None
    arrow_types = None
    if missing:
        from .decode_job import arrow_type_of_ddl, missing_column_rows

        fallback = missing_column_rows(enc_dir, pid, missing)
        arrow_types = {f["name"]: arrow_type_of_ddl(f["ddl"]) for f in fields}
    if not blobs and not missing:
        return
    nested = {
        f["name"] for f in fields if f["ddl"].strip().startswith(("array<", "map<", "struct<"))
    }
    logicals = {f["name"]: logical_of_ddl(f["ddl"]) for f in fields}
    batch = decode_blobs_to_batch(
        blobs, cols, nested, logicals, prune or None,
        arrow_types=arrow_types, fallback_rows=fallback,
        delete_pos=dpos if dpos.size else None,
        eq_deletes=eq_specs,
    )
    if batch is not None:
        yield batch


class _PGSReaderNoPushdown(DataSourceReader):
    """Reader without a ``pushFilters`` override: safe in sessions where
    ``spark.sql.python.filterPushdown.enabled`` is off (Spark refuses to
    plan a reader that defines the method there).  ``self.prune`` stays
    empty ⇒ full scan, Spark applies all filters after the scan."""

    def __init__(self, enc_dir: str, schema_fields: list[dict], as_of: int | None = None):
        from . import manifest as mf

        self.enc_dir = enc_dir
        self.fields = schema_fields
        self.prune: list[tuple] = []
        self.as_of = as_of
        # merge-on-read apply sets: pinned by the snapshot under time
        # travel, else every sidecar on disk (resolved per task)
        self.delete_files = (
            mf.snapshot_delete_files(enc_dir, as_of) if as_of is not None else None
        )
        self.eq_files = (
            mf.snapshot_eq_delete_files(enc_dir, as_of) if as_of is not None else None
        )

    def partitions(self) -> Sequence[InputPartition]:
        from .decode_job import surviving_partitions
        from . import manifest as mf

        pinned = (
            mf.snapshot_partitions(self.enc_dir, self.as_of)
            if self.as_of is not None
            else None
        )
        if self.prune:
            pids = surviving_partitions(self.enc_dir, self.prune, within=pinned)
        elif pinned is not None:
            pids = sorted(pinned & mf.committed_partitions(self.enc_dir))
        else:
            pids = mf.committed_partitions(self.enc_dir)
        # always at least one (possibly empty) split: Spark requires a
        # non-empty partition list only implicitly; an empty table reads
        # as zero rows through a single no-op split
        return [_PGSPartition(pid) for pid in pids] or [_PGSPartition(-1)]

    def read(self, partition: _PGSPartition):
        return _decode_partition_to_batches(
            self.enc_dir, self.fields, partition.pid, self.prune,
            delete_files=self.delete_files, eq_files=self.eq_files,
        )


class _PGSReader(_PGSReaderNoPushdown):
    """Pushdown-capable variant, planned only when the session conf
    allows it (``_choose_reader``)."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            self.prune.extend(_filter_to_prune(f))
            # conservative pruning ⇒ Spark must re-apply EVERY filter
            yield f


def _offset_pids(offset: dict) -> set[int]:
    s = (offset or {}).get("committed", "")
    return {int(x) for x in s.split(",") if x != ""}


class _PGSStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("pgs")``: tail an encode job's output
    directory. The offset is the set of committed partition ids (a
    partition is committed iff its manifest file exists — the same
    atomic tmp+rename contract the resume path relies on), so each
    micro-batch reads exactly the partitions that committed since the
    last batch, one Spark task per partition. Pairs with the streaming
    encode sink (``streaming/encode_stream.py``) for an end-to-end
    encode->tail pipeline. Overwriting the directory mid-stream is not
    supported (offsets only grow)."""

    def __init__(self, enc_dir: str, schema_fields: list[dict]):
        self.enc_dir = enc_dir
        self.fields = schema_fields

    def initialOffset(self) -> dict:
        return {"committed": ""}

    def latestOffset(self) -> dict:
        from . import manifest as mf

        pids = sorted(mf.committed_partitions(self.enc_dir))
        return {"committed": ",".join(map(str, pids))}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        fresh = sorted(_offset_pids(end) - _offset_pids(start))
        return [_PGSPartition(pid) for pid in fresh]

    def read(self, partition: _PGSPartition):
        return _decode_partition_to_batches(self.enc_dir, self.fields, partition.pid, [])


@dataclass
class _PGSCommit(WriterCommitMessage):
    pid: int
    n_rows: int
    encoded_bytes: int


class _PGSWriter(DataSourceArrowWriter):
    """``df.write.format("pgs")``: each task encodes its partition's
    Arrow batches through the same kernel path as ``encode_table`` (one
    ``part-NNNNN.bin`` + atomic manifest commit per task). Partitioning,
    salting and within-partition sort stay with the caller — idiomatic
    Spark: ``df.repartition(n, F.xxhash64("url")).sortWithinPartitions(
    "warc_ts").write.format("pgs").save(dir)``."""

    def __init__(self, enc_dir: str, cols: list[str], opts: dict, pid_base: int = 0):
        self.enc_dir = enc_dir
        self.cols = cols
        self.opts = opts
        self.pid_base = pid_base

    def write(self, iterator) -> _PGSCommit:
        import pyarrow as pa
        from pyspark import TaskContext

        from .encode_job import encode_columns_to_partition

        pid = self.pid_base + TaskContext.get().partitionId()
        batches = list(iterator)
        table = pa.Table.from_batches(batches) if batches else None
        rows = encode_columns_to_partition(table, self.cols, self.enc_dir, pid, **self.opts)
        return _PGSCommit(
            pid=pid,
            n_rows=rows[0]["num_rows"] if rows else 0,
            encoded_bytes=sum(r["encoded_bytes"] for r in rows),
        )

    def commit(self, messages) -> None:
        from . import manifest as mf

        mf.commit_snapshot(
            self.enc_dir,
            "write.format(pgs)",
            {"tasks": len(messages), **{k: str(v) for k, v in self.opts.items()}},
        )

    def abort(self, messages) -> None:
        # per-partition manifests are atomic (tmp+rename): uncommitted
        # tasks left no manifest, so the directory stays readable; the
        # next write with mode("overwrite") clears stragglers
        return None


@dataclass
class _PGSStreamCommit(WriterCommitMessage):
    stage_name: str
    rows: list  # manifest row dicts (file/partition patched at commit)


class _PGSStreamWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("pgs")``: the Catalyst-native streaming
    encode sink — every micro-batch appends encoded partitions to ONE
    table directory with exactly-once semantics, replacing the
    ``foreachBatch`` helper for the common append case.

    Two-phase commit (the Python DataSource stream-writer contract:
    ``write`` on executors has no batch id; ``commit(messages,
    batchId)`` runs on the driver):

    * ``write`` encodes its partition into a STAGED data file
      (``part-stage-<uuid>.bin``, no manifest — unreadable by
      construction) and ships the manifest rows back in the commit
      message.
    * ``commit`` claims the batch's partition-id range atomically
      (``manifest.claim_append_base`` keyed by batch id, so a replayed
      batch gets the SAME ids), renames each staged file onto its
      ``part-<pid>.bin``, commits the per-partition manifests, and
      seals a snapshot carrying ``stream_batch_id`` — the replay
      guard: a re-delivered batch id only re-executes idempotent
      renames/manifest writes (same ids, same bytes) and never
      double-commits a snapshot.
    * ``abort`` deletes the staged files; nothing was visible.

    Partitioning stays with the caller (repartition/sort before the
    sink), mirroring the batch writer's contract."""

    def __init__(self, enc_dir: str, cols: list[str], opts: dict, txn: str):
        self.enc_dir = enc_dir
        self.cols = cols
        self.opts = opts
        # scopes batch-id numbering to ONE streaming query (Delta's
        # txnAppId pattern): without it, two queries writing the same
        # table would both start at batch 0 and read each other's
        # batches as replays. The default keeps the single-query-per-
        # table contract; set .option("stream_txn", <query id>) to run
        # several.
        self.txn = txn

    def write(self, iterator) -> _PGSStreamCommit:
        import uuid

        import pyarrow as pa

        from .encode_job import encode_columns_to_partition

        batches = list(iterator)
        table = pa.Table.from_batches(batches) if batches else None
        # the .tmp suffix keeps staged files OUT of the reader's
        # part-*.bin glob (invisible mid-flight) and IN the orphan
        # sweep's *.tmp* pattern (crashed batches get cleaned up)
        stage = f"stage-{uuid.uuid4().hex}.bin.tmp"
        rows = encode_columns_to_partition(
            table, self.cols, self.enc_dir, -1, stage_name=stage, **self.opts
        )
        return _PGSStreamCommit(stage_name=stage, rows=rows)

    def commit(self, messages, batchId: int) -> None:
        import os

        from . import manifest as mf

        msgs = [m for m in messages if m is not None]
        job_id = f"stream-{self.txn}-batch-{int(batchId)}"
        marker = {"stream_batch_id": int(batchId), "stream_txn": self.txn}
        already = any(
            snap.get("config", {}).get("stream_batch_id") == int(batchId)
            and snap.get("config", {}).get("stream_txn") == self.txn
            for snap in mf.read_snapshots(self.enc_dir)
        )
        if msgs and not already:
            base = mf.claim_append_base(self.enc_dir, job_id, len(msgs))
            for i, m in enumerate(sorted(msgs, key=lambda m: m.stage_name)):
                pid = base + i
                src = os.path.join(self.enc_dir, m.stage_name)
                dst = os.path.join(self.enc_dir, f"part-{pid:05d}.bin")
                if os.path.exists(src):
                    os.replace(src, dst)  # atomic; replay lands same pid
                rows = []
                for r in m.rows:
                    r = dict(r)
                    r["partition"] = pid
                    r["file"] = dst
                    rows.append(r)
                mf.commit_partition(self.enc_dir, pid, rows)
            # defensive: a mid-commit crash followed by a replay with
            # FEWER tasks would leave the crashed attempt's tail pids
            # committed (duplicate rows); sweep every claimed id this
            # attempt did not fill
            claim_n = next(
                (c["n"] for c in mf.read_claims(self.enc_dir) if c["job_id"] == job_id),
                len(msgs),
            )
            for pid in range(base + len(msgs), base + claim_n):
                for path in (
                    os.path.join(self.enc_dir, f"part-{pid:05d}.bin"),
                    mf.part_manifest_path(self.enc_dir, pid),
                ):
                    try:
                        os.remove(path)
                    except OSError:
                        pass
        elif already:
            # replayed batch: this attempt's staged files are surplus
            for m in msgs:
                try:
                    os.remove(os.path.join(self.enc_dir, m.stage_name))
                except OSError:
                    pass
            return
        mf.commit_snapshot(
            self.enc_dir,
            "stream-append",
            {**marker, "tasks": len(msgs)},
        )

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.enc_dir, m.stage_name))
            except OSError:
                pass


def _parse_writer_options(options: dict) -> dict:
    """DataFrameWriter .option(...) strings -> encode_columns_to_partition
    kwargs (same knobs as ``encode_table``)."""
    opts: dict = {}
    if "profile" in options:
        opts["profile"] = options["profile"]
    if "compression" in options:
        opts["compression"] = options["compression"]
    for flag in ("page_stats", "page_crc"):
        if flag in options:
            opts[flag] = str(options[flag]).lower() in ("true", "1", "yes")
    if "max_page" in options:
        opts["max_page"] = int(options["max_page"])
    if "bloom_columns" in options:
        opts["bloom_columns"] = [c.strip() for c in options["bloom_columns"].split(",") if c.strip()]
    if "bloom_bits" in options:
        opts["bloom_bits"] = int(options["bloom_bits"])
    if "encodings" in options:
        # "col:codec,col2:codec2" — the per-column pinning the CLI exposes
        opts["encodings"] = dict(
            pair.split(":", 1) for pair in options["encodings"].split(",") if ":" in pair
        )
    return opts


class PGSDataSource(DataSource):
    """``format("pgs")``: read/write encoded table directories as
    DataFrames — reads get stats/bloom/page pruning pushed down from
    catalyst filters; writes encode through the kernel path with the
    same options as ``encode_table``."""

    @classmethod
    def name(cls) -> str:
        return "pgs"

    def _dir(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("pgs reader needs a load path: spark.read.format('pgs').load(dir)")
        return path

    def schema(self) -> str:
        from . import manifest as mf

        fields = mf.read_table_schema(self._dir())
        return ", ".join(f"`{f['name']}` {f['ddl']}" for f in fields)

    def reader(self, schema) -> _PGSReaderNoPushdown:
        from . import manifest as mf

        as_of = self.options.get("as_of")
        seq = int(as_of) if as_of is not None else None
        if seq is None and self.options.get("as_of_ts") is not None:
            # Iceberg TIMESTAMP AS OF: .option("as_of_ts", "<ISO-8601>")
            seq = mf.seq_as_of_timestamp(self._dir(), self.options["as_of_ts"])
        cls = _choose_reader(self.options.get("pushdown"), _PGSReader, _PGSReaderNoPushdown)
        return cls(
            self._dir(),
            mf.read_table_schema(self._dir()),
            as_of=seq,
        )

    def streamReader(self, schema) -> _PGSStreamReader:
        from . import manifest as mf

        return _PGSStreamReader(self._dir(), mf.read_table_schema(self._dir()))

    def streamWriter(self, schema, overwrite: bool) -> _PGSStreamWriter:
        import os

        from . import manifest as mf

        enc_dir = self._dir()
        new_fields = [
            {"name": f.name, "ddl": f.dataType.simpleString()} for f in schema.fields
        ]
        schema_path = os.path.join(enc_dir, "_schema.json")
        if os.path.exists(schema_path):
            old_fields = mf.read_table_schema(enc_dir)
            if old_fields != new_fields:
                raise ValueError(
                    f"pgs stream-append schema mismatch at {enc_dir}: "
                    f"table has {old_fields}, appending {new_fields}"
                )
        else:
            # bootstrap: first batch creates the table (atomic replace,
            # idempotent across the driver/worker instantiations)
            os.makedirs(enc_dir, exist_ok=True)
            mf.write_table_schema(enc_dir, new_fields)
        return _PGSStreamWriter(
            enc_dir,
            [f.name for f in schema.fields],
            _parse_writer_options(self.options),
            txn=str(self.options.get("stream_txn", "default")),
        )

    def writer(self, schema, overwrite: bool) -> _PGSWriter:
        import glob as _glob
        import os

        from . import manifest as mf

        enc_dir = self._dir()
        existing = _glob.glob(os.path.join(enc_dir, "part-*.bin"))
        new_fields = [{"name": f.name, "ddl": f.dataType.simpleString()} for f in schema.fields]
        pid_base = 0
        if existing and not overwrite:
            # append: ids start past the latest snapshot's range (the
            # same contract as encode_table(append=True)); schemas must
            # match exactly unless .option("evolve_schema", "true")
            old_fields = mf.read_table_schema(enc_dir)
            if str(self.options.get("evolve_schema", "")).lower() in ("true", "1", "yes"):
                merged = mf.evolve_table_schema(old_fields, new_fields)
                if merged != old_fields:
                    mf.write_table_schema(enc_dir, merged)
            elif old_fields != new_fields:
                raise ValueError(
                    f"pgs append schema mismatch at {enc_dir}: "
                    f"table has {old_fields}, appending {new_fields} "
                    '(set .option("evolve_schema", "true") to add columns)'
                )
            pid_base = mf.next_partition_base(enc_dir)
        else:
            # overwrite truncates history: snapshots pinning the deleted
            # partition ids must go too, or as_of would silently read
            # rewritten data under the old ids
            for p in (
                existing
                + _glob.glob(os.path.join(mf.manifest_dir(enc_dir), "part-*.parquet"))
                + _glob.glob(os.path.join(mf.snapshot_dir(enc_dir), "snap-*.json"))
                + _glob.glob(os.path.join(mf.deletes_dir(enc_dir), "*.parquet"))
                + _glob.glob(os.path.join(mf.claims_dir(enc_dir), "claim-*.json"))
            ):
                os.remove(p)
            os.makedirs(enc_dir, exist_ok=True)
            mf.write_table_schema(enc_dir, new_fields)
        return _PGSWriter(
            enc_dir,
            [f.name for f in schema.fields],
            _parse_writer_options(self.options),
            pid_base=pid_base,
        )


@dataclass
class _PGSQPartition(InputPartition):
    path: str
    rg: int


class _PGSQReaderNoPushdown(DataSourceReader):
    """``spark.read.format("pgsq")``: the distributed real-Parquet scan
    (spark/parquet_source.py) behind the Python DataSource API — one
    input partition per surviving row group, every page decoded by this
    engine's kernels.  This base variant defines no ``pushFilters`` so
    it plans in sessions with Python filter pushdown disabled."""

    def __init__(self, files: list[str], schema_triples: list[tuple]):
        self.files = files
        self.triples = schema_triples  # (name, arrow type, ddl)
        self.prune: list[tuple] = []

    def partitions(self) -> Sequence[InputPartition]:
        from .parquet_source import plan_scan_tasks

        tasks = plan_scan_tasks(self.files, self.prune or None)
        return [_PGSQPartition(f, rg) for f, rg in tasks] or [_PGSQPartition("", -1)]

    def read(self, partition: _PGSQPartition):
        if not partition.path:
            return
        import mmap

        import pyarrow as pa

        from ..compat.page_index import page_prune_ranges
        from ..compat.parquet_reader import file_meta, read_table_arrow
        from .decode_job import arrow_type_of_ddl

        cols = [n for n, _, _ in self.triples]
        with open(partition.path, "rb") as fh:
            with mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ) as mm:
                ranges = None
                if self.prune:
                    # page tier: pushed filters narrow the row group to
                    # surviving pages via the file's own PageIndex;
                    # Spark re-applies every filter exactly afterwards
                    ranges = page_prune_ranges(
                        mm, file_meta(mm), partition.rg, self.prune
                    )
                tbl = read_table_arrow(
                    mm, columns=cols, row_groups=[partition.rg], row_ranges=ranges
                )
                arrays = [
                    one_chunk(tbl.column(n)).cast(arrow_type_of_ddl(ddl))
                    for n, _, ddl in self.triples
                ]
        yield from pa.table(dict(zip(cols, arrays))).to_batches(max_chunksize=1 << 16)


class _PGSQReader(_PGSQReaderNoPushdown):
    """Pushdown-capable variant: pushed catalyst filters become
    footer-Statistics row-group pruning + PageIndex page pruning."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            for col, op, value in _filter_to_prune(f):
                # ==/<=/>= compare footer stats and page-index bounds;
                # ==/IN additionally probe bloom filters; notnull drops
                # all-null chunks/pages via null counts
                if op in ("==", "<=", ">=", "in", "notnull"):
                    self.prune.append((col, op, value))
            yield f  # conservative: Spark re-applies every filter


class PGSParquetDataSource(DataSource):
    """``format("pgsq")``: read directories of real ``.parquet`` files
    (written by any implementation) through this engine's decode
    kernels, planned from footers only, with filter-pushdown file
    pruning. The catalyst front door over
    ``parquet_source.read_parquet_table``."""

    @classmethod
    def name(cls) -> str:
        return "pgsq"

    def _files(self) -> list[str]:
        from .parquet_source import _list_files

        path = self.options.get("path")
        if not path:
            raise ValueError("pgsq reader needs a load path: spark.read.format('pgsq').load(dir)")
        return _list_files(path)

    def schema(self) -> str:
        from .parquet_source import parquet_scan_schema

        triples = parquet_scan_schema(self._files()[0])
        return ", ".join(f"`{n}` {ddl}" for n, _, ddl in triples)

    def reader(self, schema) -> _PGSQReaderNoPushdown:
        from .parquet_source import parquet_scan_schema

        files = self._files()
        cls = _choose_reader(self.options.get("pushdown"), _PGSQReader, _PGSQReaderNoPushdown)
        return cls(files, parquet_scan_schema(files[0]))
