"""Struct-column chunks: one definition-level stream for the struct's own
presence, then per-field child chunks encoded over the valid parent rows
only.

This is the recursive layering of the reference's group shredding
(``recursiveAddColumnData``/``recursiveAddColumnNil``, ``schema.go:
774-891``; level math ``recursiveFix`` ``schema.go:667-693``): a nil group
appends levels but no child values, so each child stream holds exactly the
entries where the parent is present. Children may themselves be lists,
maps, or structs — any depth nests through the same three containers
(PGSC leaf / PGSL list / PGSS struct), mirroring the Dremel fixtures the
reference tests (``data_store_test.go:104-390``, ``readwrite_test.go:
144-533``).

Container:
  magic "PGSS" | version u8
  | uvarint num_rows | uvarint null_count
  | uvarint def_len | def stream (validity, bw=1, size-prefixed hybrid)
  | uvarint n_fields
  | per field: uvarint name_len | name
               | uvarint logical_len | logical (arrow type string)
               | uvarint blob_len | child chunk blob
"""

from __future__ import annotations

import zlib

import numpy as np

from ..kernels import levels
from ..kernels.varint import read_uvarint, uvarint
from .chunk import ChunkMeta, decode_chunk, encode_chunk
from .columns import StructData

__all__ = ["encode_struct_chunk", "decode_struct_chunk", "STRUCT_MAGIC"]

STRUCT_MAGIC = b"PGSS"
STRUCT_VERSION = 1


def encode_struct_chunk(
    col: StructData,
    profile: str = "auto",
    compression: str = "none",
    **kw,
) -> tuple[bytes, ChunkMeta]:
    def_s = levels.encode_def_levels(col.validity, mode="auto")
    out = bytearray()
    out += STRUCT_MAGIC
    out += bytes([STRUCT_VERSION])
    out += uvarint(col.num_rows)
    out += uvarint(col.num_rows - col.num_values)
    out += uvarint(len(def_s))
    out += def_s
    out += uvarint(len(col.fields))
    total_raw = 0
    n_pages = 0
    for name, child in col.fields:
        blob, cmeta = encode_chunk(child, profile=profile, compression=compression, **kw)
        nb = name.encode()
        lb = getattr(child, "logical", "").encode()
        out += uvarint(len(nb))
        out += nb
        out += uvarint(len(lb))
        out += lb
        out += uvarint(len(blob))
        out += blob
        total_raw += cmeta.raw_bytes
        n_pages += cmeta.num_pages
    blob = bytes(out)
    meta = ChunkMeta(
        ptype="struct",
        encoding="struct",
        compression=compression,
        num_rows=col.num_rows,
        null_count=col.num_rows - col.num_values,
        distinct=-1,
        raw_bytes=col.raw_bytes,
        encoded_bytes=len(blob),
        num_pages=n_pages,
        crc32=zlib.crc32(blob),
    )
    return blob, meta


def decode_struct_chunk(blob, logical: str = "") -> StructData:
    mv = memoryview(blob).cast("B")  # normalize signed buffer views
    if bytes(mv[:4]) != STRUCT_MAGIC:
        raise ValueError("bad struct chunk magic")
    if mv[4] != STRUCT_VERSION:
        raise ValueError("bad struct chunk version")
    pos = 5
    num_rows, pos = read_uvarint(mv, pos)
    null_count, pos = read_uvarint(mv, pos)
    if null_count > num_rows:
        raise ValueError("implausible struct header")
    def_len, pos = read_uvarint(mv, pos)
    validity, _ = levels.decode_def_levels(mv[pos : pos + def_len], num_rows, 0)
    pos += def_len
    n_fields, pos = read_uvarint(mv, pos)
    if n_fields > len(mv):
        raise ValueError("implausible field count")
    fields = []
    for _ in range(n_fields):
        nl, pos = read_uvarint(mv, pos)
        name = bytes(mv[pos : pos + nl]).decode()
        pos += nl
        ll, pos = read_uvarint(mv, pos)
        child_logical = bytes(mv[pos : pos + ll]).decode()
        pos += ll
        bl, pos = read_uvarint(mv, pos)
        child = decode_chunk(mv[pos : pos + bl], logical=child_logical)
        pos += bl
        fields.append((name, child))
    return StructData(np.asarray(validity, dtype=bool), fields, logical=logical or "struct")
