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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

__all__ = ["PGSDataSource"]


@dataclass
class _PGSPartition(InputPartition):
    pid: int


def _filter_to_prune(f: Filter) -> tuple | None:
    """Translate a catalyst filter into a (col, op, value) prune triple;
    None when it isn't prunable (nested path, unsupported op/value).
    Strict < and > push as their inclusive forms — pruning is
    conservative and Spark re-applies the exact predicate anyway."""
    if not isinstance(f, (EqualTo, LessThan, LessThanOrEqual, GreaterThan, GreaterThanOrEqual)):
        return None
    if len(f.attribute) != 1:  # nested column paths carry no chunk stats
        return None
    col = f.attribute[0]
    value = f.value
    if isinstance(value, bool) or not isinstance(value, (int, float, str, bytes)):
        # datetime/decimal literals would need bound-string coordination;
        # skip (no pruning) rather than risk a wrong exclusion
        return None
    if isinstance(f, EqualTo):
        return (col, "==", value)
    if isinstance(f, (LessThan, LessThanOrEqual)):
        return (col, "<=", value)
    return (col, ">=", value)


class _PGSReader(DataSourceReader):
    def __init__(self, enc_dir: str, schema_fields: list[dict]):
        self.enc_dir = enc_dir
        self.fields = schema_fields
        self.prune: list[tuple] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            p = _filter_to_prune(f)
            if p is not None:
                self.prune.append(p)
            # conservative pruning ⇒ Spark must re-apply EVERY filter
            yield f

    def partitions(self) -> Sequence[InputPartition]:
        from .decode_job import surviving_partitions
        from . import manifest as mf

        if self.prune:
            pids = surviving_partitions(self.enc_dir, self.prune)
        else:
            pids = mf.committed_partitions(self.enc_dir)
        # always at least one (possibly empty) split: Spark requires a
        # non-empty partition list only implicitly; an empty table reads
        # as zero rows through a single no-op split
        return [_PGSPartition(pid) for pid in pids] or [_PGSPartition(-1)]

    def read(self, partition: _PGSPartition):
        import os

        from .decode_job import decode_blobs_to_batch, logical_of_ddl
        from .encode_job import parse_partition_file

        if partition.pid < 0:
            return
        path = os.path.join(self.enc_dir, f"part-{partition.pid:05d}.bin")
        with open(path, "rb") as fh:
            payload = fh.read()
        cols = [f["name"] for f in self.fields]
        want = set(cols) | {p[0] for p in self.prune}
        blobs = parse_partition_file(payload, want)
        if not blobs:
            return
        nested = {
            f["name"]
            for f in self.fields
            if f["ddl"].strip().startswith(("array<", "map<", "struct<"))
        }
        logicals = {f["name"]: logical_of_ddl(f["ddl"]) for f in self.fields}
        batch = decode_blobs_to_batch(blobs, cols, nested, logicals, self.prune or None)
        if batch is not None:
            yield batch


class PGSDataSource(DataSource):
    """``format("pgs")``: read encoded table directories as DataFrames
    with stats/bloom/page pruning pushed down from catalyst filters."""

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

    def reader(self, schema) -> _PGSReader:
        from . import manifest as mf

        return _PGSReader(self._dir(), mf.read_table_schema(self._dir()))
