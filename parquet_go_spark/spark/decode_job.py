"""Distributed decode job: read partition files -> Arrow batches.

Column projection mirrors the reference's read-side SELECT
(``file_reader.go:112-130`` / ``skipChunk``): unselected chunks are seeked
past in the partition file and never decoded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from ..core.chunk import decode_chunk
from ..core.columns import to_arrow
from . import manifest as mf
from .encode_job import parse_partition_file

_DDL_LOGICAL = {
    "string": "string",
    "binary": "binary",
    "timestamp": "timestamp[us]",
    "bigint": "int64",
    "int": "int32",
    "smallint": "int16",
    "tinyint": "int8",
    "double": "double",
    "float": "float",
    "boolean": "bool",
    "date": "date32[day]",
}


def decode_table(
    spark: SparkSession,
    enc_dir: str,
    columns: list[str] | None = None,
    validate_crc: bool = False,
    prune: list[tuple] | None = None,
) -> DataFrame:
    """Decode an encoded table directory back into a DataFrame.

    ``validate_crc=True`` checks each selected chunk's CRC32 against the
    partition manifest before decoding (reference ``WithCRC32Validation``,
    ``file_reader.go:134-139`` / ``chunk_reader.go:173-177``).

    ``prune`` = [(column, op, value), ...] with op in {"==", "<=", ">="}:
    partitions whose manifest min/max provably exclude the predicate are
    never read (the stats-pruning the reference writes stats for but
    never uses, ``README.md:47`` — here the manifest makes it real).
    Pruning is conservative (string-ordered min/max); the caller still
    applies the exact filter."""
    fields = mf.read_table_schema(enc_dir)
    by_name = {f["name"]: f for f in fields}
    cols = columns or [f["name"] for f in fields]
    out_ddl = ", ".join(f"`{c}` {by_name[c]['ddl']}" for c in cols)

    def _logical_of(ddl: str) -> str:
        ddl = ddl.strip()
        if ddl.startswith("array<") and ddl.endswith(">"):
            return f"list<{_logical_of(ddl[6:-1])}>"
        if ddl.startswith("map<") and ddl.endswith(">"):
            return ddl  # only the map< prefix matters; entries self-describe
        if ddl.startswith("struct<"):
            return "struct"  # PGSS container stores field names + logicals
        if ddl.startswith("decimal(") and ddl.endswith(")"):
            return "decimal128(" + ddl[len("decimal(") :]
        return _DDL_LOGICAL.get(ddl, "binary")
    import glob as _glob

    paths = sorted(_glob.glob(f"{enc_dir}/part-*.bin"))
    if prune:

        def _le(a, b) -> bool:
            try:
                return float(a) <= float(b)
            except (TypeError, ValueError):
                return str(a) <= str(b)

        keep = set()
        for pid in mf.committed_partitions(enc_dir):
            rows = {r["column"]: r for r in mf.read_partition_manifest(enc_dir, pid)}
            ok = True
            for col_name, op, value in prune:
                r = rows.get(col_name)
                if r is None:
                    continue  # no stats -> cannot prune
                mn, mx = r["min_str"], r["max_str"]  # each may be None (inexact)
                if op == "==":
                    if mn is not None and not _le(mn, value):
                        ok = False
                    if mx is not None and not _le(value, mx):
                        ok = False
                elif op == "<=" and mn is not None and not _le(mn, value):
                    ok = False
                elif op == ">=" and mx is not None and not _le(value, mx):
                    ok = False
            if ok:
                keep.add(f"part-{pid:05d}.bin")
        import os as _os

        paths = [p for p in paths if _os.path.basename(p) in keep]
    if not paths:
        # empty input (zero-task encode) or everything pruned
        return spark.createDataFrame([], schema=out_ddl)
    files = spark.read.format("binaryFile").load(paths).select("path", "content")

    def decode_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        want = set(cols)
        for b in batches:
            for path, content in zip(b.column("path"), b.column("content")):
                blobs = parse_partition_file(content.as_py(), want)
                if not blobs:
                    continue
                missing = want - set(blobs)
                if missing:
                    raise ValueError(
                        f"selected column(s) {sorted(missing)} absent from "
                        f"partition file {path.as_py()}"
                    )
                if validate_crc:
                    import os as _os
                    import zlib as _zlib

                    name = _os.path.basename(path.as_py())
                    pid = int(name[len("part-") : -len(".bin")])
                    crc_of = {
                        r["column"]: r["crc32"] for r in mf.read_partition_manifest(enc_dir, pid)
                    }
                    for c in want:
                        if c not in crc_of:
                            raise ValueError(
                                f"manifest for {name} has no CRC row for column {c}: "
                                "cannot validate (truncated or partial manifest)"
                            )
                        got = _zlib.crc32(blobs[c])
                        if got != crc_of[c]:
                            raise ValueError(
                                f"crc mismatch for column {c} in {name}: "
                                f"{got:#x} != manifest {crc_of[c]:#x}"
                            )
                arrays = []
                n_rows = None
                for c in cols:
                    cd = decode_chunk(blobs[c], logical=_logical_of(by_name[c]["ddl"]))
                    arrays.append(to_arrow(cd))
                    n_rows = cd.num_rows
                if not n_rows:
                    continue
                yield pa.RecordBatch.from_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays],
                    names=list(cols),
                )

    return files.mapInArrow(decode_partition, schema=out_ddl)
