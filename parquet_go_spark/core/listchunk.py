"""List-column chunks: Dremel repetition/definition levels around an
inner element chunk.

Level semantics follow the reference's shredding for
``optional group (LIST) { repeated group list { optional element } }``
(``schema.go:585-614``, ``recursiveAddColumnData`` ``schema.go:837-891``,
level math ``recursiveFix`` ``schema.go:667-693``): max_rep=1, max_def=3;
per entry d=0 null list, d=1 empty list, d=2 null element, d=3 element
present; r=0 starts a row, r=1 continues it. Level streams are RLE/BP
hybrid with bit width ``bits.Len16(max)`` (rep: 1, def: 2) and a 4-byte
size prefix (``helpers.go:262-292``).

Container:
  magic "PGSL" | version u8
  | uvarint num_rows | uvarint row_null_count | uvarint n_entries
  | uvarint rep_len | rep stream | uvarint def_len | def stream
  | inner element chunk blob (PGSC container — any codec, dict, pages,
    compression and stats apply to the flattened elements unchanged)
"""

from __future__ import annotations

import zlib

import numpy as np

from ..kernels import hybrid
from ..kernels.varint import read_uvarint, uvarint
from .chunk import ChunkMeta, decode_chunk, encode_chunk
from .columns import ColumnData, ListData, entry_validity

__all__ = ["encode_list_chunk", "decode_list_chunk", "LIST_MAGIC", "compute_levels", "levels_to_structure"]

LIST_MAGIC = b"PGSL"
LIST_VERSION = 1


def compute_levels(col: ListData) -> tuple[np.ndarray, np.ndarray]:
    """-> (rep u64[n_entries], def u64[n_entries]), fully vectorized."""
    valid = col.row_validity
    lens = col.lens
    if len(valid) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    counts = np.where(valid & (lens > 0), lens, 1).astype(np.int64)
    total = int(counts.sum())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rep = np.ones(total, dtype=np.uint64)
    rep[starts] = 0
    dlev = np.empty(total, dtype=np.uint64)
    single = ~(valid & (lens > 0))  # null or empty rows: one entry
    elem_mask = np.ones(total, dtype=bool)
    elem_mask[starts[single]] = False
    dlev[starts[single]] = np.where(valid[single], 1, 0)
    dlev[elem_mask] = np.where(entry_validity(col.elem), 3, 2)
    return rep, dlev


def levels_to_structure(rep: np.ndarray, dlev: np.ndarray, n_rows: int):
    """-> (row_validity, lens, elem_validity): inverse of compute_levels."""
    new_row = rep == 0
    row_id = np.cumsum(new_row) - 1
    is_elem = dlev >= 2
    lens = np.bincount(row_id[is_elem], minlength=n_rows).astype(np.int64)
    first_def = dlev[new_row]
    row_validity = first_def != 0
    elem_validity = dlev[is_elem] == 3
    return row_validity, lens, elem_validity


def encode_list_chunk(
    col: ListData,
    profile: str = "auto",
    compression: str = "none",
    **kw,
) -> tuple[bytes, ChunkMeta]:
    rep, dlev = compute_levels(col)
    rep_s = hybrid.with_size_prefix(hybrid.encode_auto(rep, 1), 1)
    def_s = hybrid.with_size_prefix(hybrid.encode_auto(dlev, 2), 2)
    inner, meta = encode_chunk(col.elem, profile=profile, compression=compression, **kw)
    out = bytearray()
    out += LIST_MAGIC
    out += bytes([LIST_VERSION])
    out += uvarint(col.num_rows)
    out += uvarint(col.num_rows - int(col.row_validity.sum()))
    out += uvarint(len(rep))
    out += uvarint(len(rep_s))
    out += rep_s
    out += uvarint(len(def_s))
    out += def_s
    out += inner
    blob = bytes(out)
    meta = ChunkMeta(
        ptype=f"list<{meta.ptype}>",
        encoding=meta.encoding,
        compression=compression,
        num_rows=col.num_rows,
        null_count=col.num_rows - int(col.row_validity.sum()),
        distinct=meta.distinct,
        raw_bytes=col.raw_bytes,
        encoded_bytes=len(blob),
        num_pages=meta.num_pages,
        crc32=zlib.crc32(blob),
        min_value=meta.min_value,
        max_value=meta.max_value,
    )
    return blob, meta


def decode_list_chunk(blob, logical: str = "") -> ListData:
    mv = memoryview(blob).cast("B")  # normalize signed buffer views
    if bytes(mv[:4]) != LIST_MAGIC:
        raise ValueError("bad list chunk magic")
    if mv[4] != LIST_VERSION:
        raise ValueError("bad list chunk version")
    pos = 5
    num_rows, pos = read_uvarint(mv, pos)
    _null_rows, pos = read_uvarint(mv, pos)
    n_entries, pos = read_uvarint(mv, pos)
    rep_len, pos = read_uvarint(mv, pos)
    rep, _ = hybrid.decode_sized(mv[pos : pos + rep_len], 1, n_entries, 0)
    pos += rep_len
    def_len, pos = read_uvarint(mv, pos)
    dlev, _ = hybrid.decode_sized(mv[pos : pos + def_len], 2, n_entries, 0)
    pos += def_len
    elem_logical = ""
    if logical.startswith("map<"):
        elem_logical = ""  # the struct child chunk stores its own field logicals
    elif logical.startswith("list<") or logical.startswith("large_list<"):
        elem_logical = logical.split("<", 1)[1].rsplit(">", 1)[0]
        if elem_logical.startswith("item:") or elem_logical.startswith("element:"):
            elem_logical = elem_logical.split(":", 1)[1].strip()
    elem = decode_chunk(mv[pos:], logical=elem_logical)
    row_validity, lens, elem_validity = levels_to_structure(
        np.asarray(rep), np.asarray(dlev), num_rows
    )
    if isinstance(elem, ColumnData):
        # leaf: entry validity is carried by this level's def stream
        elem = ColumnData(
            elem.ptype,
            elem_validity,
            values=elem.values,
            lengths=elem.lengths,
            data=elem.data,
            logical=elem.logical,
            type_length=elem.type_length,
        )
    # nested list/struct elems carry their own (identical) validity stream
    return ListData(row_validity, lens, elem, logical=logical or "list")
