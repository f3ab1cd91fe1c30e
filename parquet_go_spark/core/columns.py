"""Column representation bridging Arrow/pandas batches and the codec
kernels: every column becomes (validity, values) where values are either a
fixed-width numpy array or a (lengths, data) flat byte pair — the same
"non-null values + def levels" split the reference's ColumnStore keeps
(``data_store.go:96-136``: nulls only append levels, never values).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

__all__ = [
    "ColumnData",
    "ListData",
    "StructData",
    "from_arrow",
    "to_arrow",
    "entry_validity",
    "split_fields",
    "PHYSICAL",
    "gather_segments",
]


def gather_segments(src: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate src[starts[i] : starts[i]+lengths[i]] segments."""
    total = int(lengths.sum())
    n = len(lengths)
    if total == 0 or n == 0:
        return np.empty(0, dtype=src.dtype)
    if total // n >= 32:
        # long segments: python slice loop = n memcpys, beats index build
        out = np.empty(total, dtype=src.dtype)
        dst = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        for d, s, l in zip(dst.tolist(), starts.tolist(), lengths.tolist()):
            out[d : d + l] = src[s : s + l]
        return out
    idx = np.repeat(starts, lengths) + (
        np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths)
    )
    return src[idx]

# physical types (SURVEY.md §1.2); int96 kept only as a decode-compat shim
PHYSICAL = ("bool", "int32", "int64", "float", "double", "bytes", "flba")


def decimal_width(precision: int) -> int:
    """Minimal FLBA byte width holding ±(10^precision - 1) in two's
    complement — the reference's DECIMAL carrier sizing
    (``type_bytearray.go:328-333``, parquet-format DECIMAL spec)."""
    w = 1
    limit = 10**precision - 1
    while (1 << (8 * w - 1)) <= limit:
        w += 1
    return w

_ARROW_TO_PHYS = {
    pa.bool_(): "bool",
    pa.int8(): "int32",
    pa.int16(): "int32",
    pa.int32(): "int32",
    pa.date32(): "int32",
    pa.int64(): "int64",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.string(): "bytes",
    pa.large_string(): "bytes",
    pa.binary(): "bytes",
    pa.large_binary(): "bytes",
}

_NUMPY_OF = {
    "bool": np.bool_,
    "int32": np.int32,
    "int64": np.int64,
    "float": np.float32,
    "double": np.float64,
}


@dataclass
class ColumnData:
    """Flat, null-stripped column: the unit the chunk encoder consumes."""

    ptype: str  # physical type
    validity: np.ndarray  # bool[n_rows]; True = non-null
    values: np.ndarray | None = None  # fixed kinds: non-null values
    lengths: np.ndarray | None = None  # bytes kind: per-value byte lengths
    data: np.ndarray | None = None  # bytes/flba kind: concatenated bytes
    logical: str = ""  # original Arrow type string (for reassembly)
    type_length: int = 0  # flba kind: fixed byte width per value

    @property
    def num_rows(self) -> int:
        return len(self.validity)

    @property
    def num_values(self) -> int:
        return int(self.validity.sum())

    @property
    def raw_bytes(self) -> int:
        """Uncompressed payload size (the GB measured by the bench)."""
        if self.ptype == "bytes":
            return int(self.lengths.sum()) + len(self.validity) // 8
        if self.ptype == "flba":
            return self.num_values * self.type_length + len(self.validity) // 8
        return self.num_values * np.dtype(_NUMPY_OF[self.ptype]).itemsize


@dataclass
class ListData:
    """List column (Dremel max_rep=1 at this level, def levels 0-3 — the
    ``optional group (LIST) { repeated group list { optional element } }``
    shape, ``schema.go:585-614`` / SURVEY.md §1.3): per-row validity +
    lengths over flattened elements. ``elem`` recurses: a ColumnData leaf,
    another ListData (list<list<...>>), or a StructData (list<struct>,
    and the map<k,v> = list<struct<key,value>> convention,
    ``NewMapColumn`` ``schema.go:616-647``)."""

    row_validity: np.ndarray  # bool[n_rows]; True = list present
    lens: np.ndarray  # int64[n_rows]; elements per row (0 when null)
    elem: "ColumnData | ListData | StructData"  # flattened non-null rows' contents
    logical: str = ""  # arrow type string, e.g. "list<item: float>" / "map<string, int64>"

    @property
    def num_rows(self) -> int:
        return len(self.row_validity)

    @property
    def raw_bytes(self) -> int:
        return self.elem.raw_bytes + len(self.row_validity) // 2

    @property
    def num_values(self) -> int:
        return int(self.row_validity.sum())


@dataclass
class StructData:
    """Struct column: its own validity (one def level) over per-field
    child columns encoded only for the valid parent rows — a null struct
    contributes no child entries, matching the reference's shredding of
    nil groups (``recursiveAddColumnNil``, ``schema.go:790-835``)."""

    validity: np.ndarray  # bool[n_rows]; True = struct present
    fields: list  # [(name, ColumnData | ListData | StructData), ...] over valid rows
    logical: str = ""  # arrow type string, e.g. "struct<a: int64, b: string>"

    @property
    def num_rows(self) -> int:
        return len(self.validity)

    @property
    def num_values(self) -> int:
        return int(self.validity.sum())

    @property
    def raw_bytes(self) -> int:
        return sum(c.raw_bytes for _, c in self.fields) + len(self.validity) // 8


def entry_validity(col: "ColumnData | ListData | StructData") -> np.ndarray:
    """Per-entry presence of any column kind (the d == max_def test)."""
    if isinstance(col, ListData):
        return col.row_validity
    return col.validity


def split_fields(s: str) -> list[str]:
    """Split a type-parameter list on top-level commas only
    (bracket-aware: 'a: int64, b: struct<c: string, d: int64>' -> 2)."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i].strip())
            start = i + 1
    tail = s[start:].strip()
    if tail:
        parts.append(tail)
    return parts


def _phys_of(t: pa.DataType) -> str:
    if t in _ARROW_TO_PHYS:
        return _ARROW_TO_PHYS[t]
    if pa.types.is_timestamp(t):
        return "int64"
    if pa.types.is_decimal(t) or pa.types.is_fixed_size_binary(t):
        return "flba"
    if pa.types.is_dictionary(t):
        return _phys_of(t.value_type)
    raise TypeError(f"unsupported arrow type {t}")


def one_chunk(arr: "pa.Array | pa.ChunkedArray") -> pa.Array:
    """Materialize a (possibly chunked) Arrow array as ONE Array without
    paying combine_chunks' unconditional buffer copy in the common
    1-chunk case (pyarrow concatenates even a single chunk — a full
    memcpy of every buffer)."""
    if isinstance(arr, pa.ChunkedArray):
        return arr.chunk(0) if arr.num_chunks == 1 else arr.combine_chunks()
    return arr


def _offsets_view(barr: pa.Array, odt) -> np.ndarray:
    """Zero-copy view of a variable-length binary array's offsets at
    their native width.

    The Arrow spec permits a LENGTH-0 array to carry an empty (or
    absent) offsets buffer; Spark's Java writer emits exactly that for
    the string child of an all-empty list column, while pyarrow's own
    constructors always materialize the leading 0 — so the pytest
    fixtures never see it, only live Spark jobs with empty partitions
    do. Synthesize the single zero offset for that legal layout; any
    OTHER short buffer is corruption and np.frombuffer raises."""
    n = len(barr)
    if n == 0:
        # any single offset value describes an empty array, and the
        # array's own offset is not trustworthy here: flatten() over an
        # empty-offsets parent yields a length-0 slice whose offset is
        # read from past the buffer (garbage, possibly negative)
        return np.zeros(1, dtype=odt)
    return np.frombuffer(barr.buffers()[1], dtype=odt, count=n + 1 + barr.offset)[barr.offset :]


def from_arrow(arr: pa.Array | pa.ChunkedArray) -> "ColumnData | ListData | StructData":
    """Arrow array -> ColumnData/ListData/StructData (vectorized,
    zero-copy where possible; recursive over list/struct/map nesting)."""
    # combine_chunks COPIES every buffer even when there is exactly one
    # chunk (pyarrow concatenates unconditionally) — 0.5 s of pure
    # memcpy+fault on an 80 MB html column, ~45% of single-core chunk
    # encode. A 1-chunk column unwraps zero-copy (one_chunk).
    arr = one_chunk(arr)
    if pa.types.is_struct(arr.type):
        n = len(arr)
        validity = (
            np.ones(n, dtype=bool) if arr.null_count == 0 else arr.is_valid().to_numpy(zero_copy_only=False)
        )
        vmask = None if validity.all() else pa.array(validity)
        fields = []
        children = arr.flatten()  # offset-corrected child arrays
        for i, ch in enumerate(children):
            if vmask is not None:
                ch = ch.filter(vmask)  # children carry valid parents only
            fields.append((arr.type.field(i).name, from_arrow(ch)))
        return StructData(validity, fields, logical=str(arr.type))
    if pa.types.is_map(arr.type):
        # map<k,v> == list<struct<key,value>> (NewMapColumn, schema.go:616-647)
        entry_t = pa.list_(
            pa.struct(
                [
                    pa.field("key", arr.type.key_type, nullable=False),
                    pa.field("value", arr.type.item_type),
                ]
            )
        )
        ld = from_arrow(arr.cast(entry_t))
        ld.logical = str(arr.type)
        return ld
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        n = len(arr)
        validity = (
            np.ones(n, dtype=bool) if arr.null_count == 0 else arr.is_valid().to_numpy(zero_copy_only=False)
        )
        if n == 0:
            # Spark's Java writer may omit the offsets buffer entirely
            # for a length-0 list (Arrow-legal; pyarrow never builds
            # this). arr.offsets / arr.flatten() read PAST that buffer —
            # flatten returns a child slice with a garbage offset — so
            # take the empty element stream structurally instead.
            elems = arr.values.slice(0, 0)
            return ListData(validity, np.zeros(0, np.int64), from_arrow(elems), logical=str(arr.type))
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offsets)
        lens = np.where(validity, lens, 0).astype(np.int64)
        elems = arr.flatten()  # concatenation of non-null rows' contents
        return ListData(validity, lens, from_arrow(elems), logical=str(arr.type))
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    ptype = _phys_of(arr.type)
    n = len(arr)
    validity = np.ones(n, dtype=bool) if arr.null_count == 0 else arr.is_valid().to_numpy(zero_copy_only=False)
    logical = str(arr.type)
    if ptype == "flba":
        if pa.types.is_decimal(arr.type):
            # decimal128 -> minimal-width big-endian two's complement, the
            # reference's FLBA DECIMAL carrier (type_bytearray.go:328-333)
            w = decimal_width(arr.type.precision)
            buf = arr.buffers()[1]
            if buf is None:  # length-0 arrays may omit the data buffer
                buf = b""
            raw = np.frombuffer(buf, np.uint8, 16 * (n + arr.offset))[16 * arr.offset :]
            be = raw.reshape(n, 16)[:, ::-1]  # LE int128 -> BE bytes
            data = np.ascontiguousarray(be[validity][:, 16 - w :]).reshape(-1)
        else:  # fixed_size_binary
            w = arr.type.byte_width
            buf = arr.buffers()[1]
            if buf is None:
                buf = b""
            raw = np.frombuffer(buf, np.uint8, w * (n + arr.offset))[w * arr.offset :]
            data = np.ascontiguousarray(raw.reshape(n, w)[validity]).reshape(-1)
        return ColumnData("flba", validity, data=data, type_length=w, logical=logical)
    if ptype == "bytes":
        # read the offsets buffer at its NATIVE width (int32 for
        # binary/string, int64 for large_*) — the old normalizing
        # cast(large_binary) rewrote offsets AND data of every bytes
        # column (~0.44 s of a 1.8 s single-core 120k-row pages encode,
        # the marshaling share NOTES_r4 §9 flagged); exotic layouts
        # (binary_view, dictionary-nested) still take the cast fallback
        if pa.types.is_binary(arr.type) or pa.types.is_string(arr.type):
            barr, odt = arr, np.int32
        elif pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
            barr, odt = arr, np.int64
        else:
            barr, odt = arr.cast(pa.large_binary()), np.int64
        offsets = _offsets_view(barr, odt)
        dbuf = barr.buffers()[2]
        data_all = (
            np.frombuffer(dbuf, dtype=np.uint8, count=len(dbuf)) if dbuf is not None else np.empty(0, np.uint8)
        )
        lens_all = np.diff(offsets)
        lens = lens_all[validity]
        if validity.all() or not lens_all[~validity].any():
            # zero-copy view: with no nulls the buffer IS the value
            # stream; with zero-LENGTH null slots (how parquet readers
            # and Spark's Arrow batches always materialize them) the
            # uncompacted buffer is byte-identical to the compacted one
            # — skipping drop_null's full-buffer gather saved 0.45 s on
            # a 323 MB html column with 2% nulls (pure DRAM traffic)
            data = data_all[offsets[0] : offsets[-1]]
        else:
            # null slots carry stale bytes (hand-built buffers): strip
            # via Arrow's C++ gather — drop_null rebuilds compact
            # offsets+data in one native pass — the python-loop
            # gather_segments here cost ~0.2 s per 120k-row web-text
            # column, ~25% of single-core chunk encode
            nn = barr.drop_null()
            noff = _offsets_view(nn, odt)
            ndbuf = nn.buffers()[2]
            data = (
                np.frombuffer(ndbuf, dtype=np.uint8, count=len(ndbuf))[noff[0] : noff[-1]]
                if ndbuf is not None
                else np.empty(0, np.uint8)
            )
        return ColumnData(ptype, validity, lengths=lens.astype(np.int64), data=data, logical=logical)
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.timestamp("us"))
        logical = "timestamp[us]"
        arr = arr.cast(pa.int64())
    elif pa.types.is_date32(arr.type):
        arr = arr.cast(pa.int32())
    if arr.null_count:
        zero = False if ptype == "bool" else 0
        vals = arr.fill_null(zero).to_numpy(zero_copy_only=False)
    else:
        vals = arr.to_numpy(zero_copy_only=False)
    vals = np.asarray(vals).astype(_NUMPY_OF[ptype], copy=False)
    # a boolean-mask index copies even when the mask is all-true; on a
    # null-free fixed-width column the Arrow buffer view itself is the
    # value stream (kernels never mutate ColumnData arrays in place)
    values = vals if validity.all() else np.ascontiguousarray(vals[validity])
    return ColumnData(ptype, validity, values=values, logical=logical)


def to_arrow(col: "ColumnData | ListData | StructData") -> pa.Array:
    """ColumnData/ListData/StructData -> Arrow array of the original
    logical type."""
    if isinstance(col, StructData):
        validity = col.validity
        names = [name for name, _ in col.fields]
        children = [to_arrow(c) for _, c in col.fields]
        if validity.all():
            return pa.StructArray.from_arrays(children, names=names)
        # expand valid-rows-only children back to full length (null at
        # invalid parent slots) via take-with-null-indices
        idx = pa.array((np.cumsum(validity) - 1).astype(np.int64), mask=~validity)
        children = [c.take(idx) for c in children]
        return pa.StructArray.from_arrays(children, names=names, mask=pa.array(~validity))
    if isinstance(col, ListData):
        elem_arr = to_arrow(col.elem)
        offsets64 = np.concatenate([[0], np.cumsum(col.lens)]).astype(np.int64)
        mask = ~col.row_validity
        wide = int(offsets64[-1]) > 0x7FFFFFFF
        if col.logical.startswith("map<"):
            if wide:
                # Arrow maps carry int32 offsets by spec — silently
                # truncating would corrupt; a >2^31-entry map chunk
                # must fail loudly (re-partition the write instead)
                raise ValueError(
                    f"map chunk has {int(offsets64[-1])} entries: exceeds "
                    "Arrow's int32 map offsets; encode with more partitions"
                )
            # null map rows via null offsets (MapArray.from_arrays has no mask)
            off_mask = np.concatenate([mask, [False]]) if mask.any() else None
            off_arr = pa.array(offsets64.astype(np.int32), type=pa.int32(), mask=off_mask)
            return pa.MapArray.from_arrays(off_arr, elem_arr.field(0), elem_arr.field(1))
        if wide:
            # >2^31 elements in one chunk: int32 list offsets would
            # silently wrap — emit a large_list instead
            return pa.LargeListArray.from_arrays(
                pa.array(offsets64, type=pa.int64()),
                elem_arr,
                mask=pa.array(mask) if mask.any() else None,
            )
        out = pa.ListArray.from_arrays(
            pa.array(offsets64.astype(np.int32), type=pa.int32()),
            elem_arr,
            mask=pa.array(mask) if mask.any() else None,
        )
        return out
    n = col.num_rows
    mask = ~col.validity  # pyarrow mask: True = null
    if col.ptype == "flba":
        w = col.type_length
        nv = col.num_values
        vals = col.data.reshape(nv, w)
        vbuf = pa.py_buffer(np.packbits(col.validity, bitorder="little"))
        if col.logical.startswith("decimal128("):
            p, s = (int(x) for x in col.logical[len("decimal128(") : -1].split(","))
            be16 = np.zeros((nv, 16), np.uint8)
            be16[:, 16 - w :] = vals
            neg = (vals[:, 0] & 0x80) != 0
            be16[neg, : 16 - w] = 0xFF  # sign-extend
            full = np.zeros((n, 16), np.uint8)
            full[col.validity] = be16[:, ::-1]  # BE -> LE int128
            return pa.Array.from_buffers(
                pa.decimal128(p, s), n, [vbuf, pa.py_buffer(full)], null_count=int(mask.sum())
            )
        full = np.zeros((n, w), np.uint8)
        full[col.validity] = vals
        return pa.Array.from_buffers(
            pa.binary(w), n, [vbuf, pa.py_buffer(full)], null_count=int(mask.sum())
        )
    if col.ptype == "bytes":
        lens_all = np.zeros(n, dtype=np.int64)
        lens_all[col.validity] = col.lengths
        offsets = np.concatenate([[0], np.cumsum(lens_all)])
        # build the TARGET type straight from buffers instead of the old
        # large_binary -> cast -> cast chain: each cast rewrote offsets
        # and data — redundant copies on the decode hot path
        small = int(offsets[-1]) <= 0x7FFFFFFF
        if col.logical == "string" and small:
            pa_t, odt = pa.string(), np.int32
        elif col.logical == "binary" and small:
            pa_t, odt = pa.binary(), np.int32
        elif col.logical in ("string", "large_string"):
            pa_t, odt = pa.large_string(), np.int64
        else:
            pa_t, odt = pa.large_binary(), np.int64
        arr = pa.Array.from_buffers(
            pa_t,
            n,
            [
                pa.py_buffer(np.packbits(col.validity, bitorder="little")),
                pa.py_buffer(offsets.astype(odt, copy=False)),
                pa.py_buffer(np.ascontiguousarray(col.data)),
            ],
            null_count=int(mask.sum()),
        )
        if pa.types.is_string(pa_t) or pa.types.is_large_string(pa_t):
            # the cast chain validated UTF-8 as a side effect; from_buffers
            # does not, and invalid bytes from a corrupt page or codec bug
            # must fail HERE, not deep inside a downstream shuffle. One
            # validation scan (~2.6 GB/s), zero buffer rewrites.
            arr.validate(full=True)
        return arr
    vals_all = np.zeros(n, dtype=_NUMPY_OF[col.ptype])
    vals_all[col.validity] = col.values
    if col.logical.startswith("timestamp"):
        return pa.array(vals_all, mask=mask).cast(pa.int64()).cast(pa.timestamp("us"))
    if col.logical == "date32[day]":
        return pa.array(vals_all.astype(np.int32), mask=mask).cast(pa.date32())
    pa_type = {
        "bool": pa.bool_(),
        "int32": pa.int32(),
        "int64": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
    }[col.ptype]
    if col.logical in ("int8", "int16"):
        pa_type = {"int8": pa.int8(), "int16": pa.int16()}[col.logical]
        vals_all = vals_all.astype(col.logical)
    return pa.array(vals_all, type=pa_type, mask=mask)
