"""Write REAL Parquet files from this engine's kernels — the write-side
interop layer (analogue of the reference's dockerized cross-impl harness,
``compatibility/run_tests.bash``: write with parquet-go, read with
parquet-mr; here: write with these kernels, read with pyarrow/DuckDB).

V1 data pages, flat optional columns, reference-default layout:
dictionary unless distinct > 32767 (``chunk_writer.go:174-227``), else
the column's fallback encoding; def levels as length-prefixed RLE/BP
hybrid; SNAPPY/ZSTD/GZIP/UNCOMPRESSED codecs; 1 MiB page cuts.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..core.chunk import DICT_MAX, _encode_dict_values, _factorize, _page_boundaries
from ..core.columns import ColumnData, from_arrow
from ..kernels import bytearrays, deltabp, dictenc, levels, plain
from .thrift_writer import write_struct

__all__ = ["write_parquet"]

MAGIC = b"PAR1"

_PQ_TYPE = {"bool": 0, "int32": 1, "int64": 2, "float": 4, "double": 5, "bytes": 6}
_CODEC = {"none": 0, "snappy": 1, "gzip": 2, "zstd": 6}
# parquet encoding ids
E_PLAIN = 0
E_RLE = 3
E_DELTA_BP = 5
E_DELTA_LEN = 6
E_DELTA_BA = 7
E_RLE_DICT = 8


def _compress(payload: bytes, codec: str) -> bytes:
    if codec == "none":
        return payload
    if codec == "gzip":
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(payload) + co.flush()
    return pa.Codec(codec).compress(payload, asbytes=True)


def _encode_page_values(enc: int, col: ColumnData, vlo, vhi, dlo, dhi, codes, dict_size):
    if enc == E_RLE_DICT:
        return dictenc.encode_indices(codes[vlo:vhi].astype(np.uint64), dict_size, mode="auto")
    if col.ptype == "bytes":
        lens = col.lengths[vlo:vhi]
        data = col.data[dlo:dhi]
        if enc == E_PLAIN:
            return plain.encode_byte_array(lens, data)
        if enc == E_DELTA_LEN:
            return bytearrays.encode_delta_length(lens, data)
        if enc == E_DELTA_BA:
            return bytearrays.encode_delta(lens, data)
    else:
        vals = col.values[vlo:vhi]
        if enc == E_PLAIN:
            return plain.encode_bool(vals) if col.ptype == "bool" else plain.encode_fixed(vals, col.ptype)
        if enc == E_DELTA_BP:
            return deltabp.encode(vals, 32 if col.ptype == "int32" else 64)
    raise ValueError(f"encoding {enc} for {col.ptype}")


def _choose(col: ColumnData, encoding: str | None):
    if encoding:
        return {
            "plain": E_PLAIN,
            "delta_bp": E_DELTA_BP,
            "delta_length": E_DELTA_LEN,
            "delta_bytes": E_DELTA_BA,
            "rle_dict": E_RLE_DICT,
        }[encoding]
    if col.ptype == "bool" or col.num_values == 0:
        return E_PLAIN
    _, _, distinct = _factorize(col)
    return E_RLE_DICT if distinct <= DICT_MAX else E_PLAIN


def write_parquet(
    table: pa.Table,
    compression: str = "none",
    encodings: dict[str, str] | None = None,
    max_page: int = 1 << 20,
    return_meta: bool = False,
):
    """pa.Table -> Parquet file bytes (flat schema, one row group).

    ``return_meta=True`` -> (bytes, [{column, encoding, raw/comp bytes}])."""
    metas: list[dict] = []
    out = bytearray(MAGIC)
    codec = _CODEC[compression]
    col_chunks = []
    schema_elems = [{4: ("binary", "schema"), 5: ("i32", table.num_columns)}]
    for name in table.column_names:
        col = from_arrow(table.column(name))
        if isinstance(col, ColumnData) is False:
            raise TypeError("write_parquet supports flat columns only")
        enc_name = (encodings or {}).get(name)
        enc = _choose(col, enc_name)
        codes = uniques = None
        dict_size = 0
        if enc == E_RLE_DICT:
            codes, uniques, dict_size = _factorize(col)
        el = {
            1: ("i32", _PQ_TYPE[col.ptype]),
            3: ("i32", 1),  # OPTIONAL
            4: ("binary", name),
        }
        if col.logical in ("string", "large_string"):
            el[6] = ("i32", 0)  # ConvertedType UTF8
        elif col.logical.startswith("timestamp"):
            el[6] = ("i32", 10)  # TIMESTAMP_MICROS
        schema_elems.append(el)

        chunk_start = len(out)
        dict_offset = None
        encodings_used = {E_RLE}
        total_raw = total_comp = 0
        if enc == E_RLE_DICT and dict_size:
            payload = _encode_dict_values(uniques, col.ptype)
            comp = _compress(payload, compression)
            hdr = write_struct(
                {
                    1: ("i32", 2),  # DICTIONARY_PAGE
                    2: ("i32", len(payload)),
                    3: ("i32", len(comp)),
                    7: ("struct", {1: ("i32", dict_size), 2: ("i32", E_PLAIN)}),
                }
            )
            dict_offset = len(out)
            out += hdr + comp
            total_raw += len(payload) + len(hdr)
            total_comp += len(comp) + len(hdr)
            encodings_used.add(E_PLAIN)
        data_offset = len(out)
        encodings_used.add(enc)
        vstart = 0
        vcum = (
            np.concatenate([[0], np.cumsum(col.lengths)]).astype(np.int64)
            if col.ptype == "bytes"
            else None
        )
        for row_lo, row_hi in _page_boundaries(col, max_page):
            validity = col.validity[row_lo:row_hi]
            nvals = int(validity.sum())
            vend = vstart + nvals
            dlo, dhi = (int(vcum[vstart]), int(vcum[vend])) if vcum is not None else (0, 0)
            lvl = levels.encode_def_levels(validity, mode="auto")
            body = bytes(lvl) + _encode_page_values(enc, col, vstart, vend, dlo, dhi, codes, dict_size)
            comp = _compress(body, compression)
            hdr = write_struct(
                {
                    1: ("i32", 0),  # DATA_PAGE
                    2: ("i32", len(body)),
                    3: ("i32", len(comp)),
                    5: (
                        "struct",
                        {
                            1: ("i32", row_hi - row_lo),
                            2: ("i32", enc),
                            3: ("i32", E_RLE),
                            4: ("i32", E_RLE),
                        },
                    ),
                }
            )
            out += hdr + comp
            total_raw += len(body) + len(hdr)
            total_comp += len(comp) + len(hdr)
            vstart = vend
        meta = {
            1: ("i32", _PQ_TYPE[col.ptype]),
            2: ("list", ("i32", sorted(encodings_used))),
            3: ("list", ("binary", [name])),
            4: ("i32", codec),
            5: ("i64", col.num_rows),
            6: ("i64", total_raw),
            7: ("i64", total_comp),
            9: ("i64", data_offset),
        }
        if dict_offset is not None:
            meta[11] = ("i64", dict_offset)
        col_chunks.append(
            {
                2: ("i64", chunk_start),
                3: ("struct", meta),
            }
        )
        metas.append(
            {
                "column": name,
                "ptype": col.ptype,
                "encoding": {
                    E_PLAIN: "plain",
                    E_RLE_DICT: "rle_dict",
                    E_DELTA_BP: "delta_bp",
                    E_DELTA_LEN: "delta_length",
                    E_DELTA_BA: "delta_bytes",
                }[enc],
                "num_rows": col.num_rows,
                "null_count": col.num_rows - col.num_values,
                "raw_bytes": col.raw_bytes,
                "encoded_bytes": total_comp,
            }
        )
    row_group = {
        1: ("list", ("struct", col_chunks)),
        2: ("i64", sum(c[3][1][7][1] for c in col_chunks)),
        3: ("i64", table.num_rows),
    }
    fmeta = {
        1: ("i32", 1),
        2: ("list", ("struct", schema_elems)),
        3: ("i64", table.num_rows),
        4: ("list", ("struct", [row_group])),
        6: ("binary", "parquet_go_spark"),
    }
    footer = write_struct(fmeta)
    out += footer
    out += len(footer).to_bytes(4, "little")
    out += MAGIC
    if return_meta:
        return bytes(out), metas
    return bytes(out)
