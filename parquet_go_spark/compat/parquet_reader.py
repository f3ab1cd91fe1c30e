"""Decode real Parquet files with this engine's kernels — the golden
interop layer (analogue of the reference's apache/parquet-testing suite,
``parquet_test.go:11-60``): pages written by another implementation
(pyarrow's C++ writer in tests) must decode bit-identically through our
hybrid / dict / delta / plain kernels.

Supports the encodings this engine implements: PLAIN (0),
RLE_DICTIONARY (8) / PLAIN_DICTIONARY (2), DELTA_BINARY_PACKED (5),
DELTA_LENGTH_BYTE_ARRAY (6), DELTA_BYTE_ARRAY (7),
BYTE_STREAM_SPLIT (9, incl. the 2.11 int/FLBA extension); data page V1 + V2,
dictionary pages, UNCOMPRESSED/SNAPPY/ZSTD/GZIP codecs, flat columns.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..kernels import bytearrays, bytestreamsplit, deltabp, hybrid, plain
from .thrift_compact import read_struct

__all__ = ["read_column", "file_meta"]

_PHYS = {0: "bool", 1: "int32", 2: "int64", 3: "int96", 4: "float", 5: "double", 6: "bytes", 7: "flba"}


def _decompress(payload: bytes, codec: int, raw_len: int) -> bytes:
    if codec == 0:
        return payload
    if codec == 1:  # SNAPPY
        return pa.Codec("snappy").decompress(payload, raw_len, asbytes=True)
    if codec == 2:  # GZIP
        return zlib.decompress(payload, 31)
    if codec == 6:  # ZSTD
        return pa.Codec("zstd").decompress(payload, raw_len, asbytes=True)
    raise ValueError(f"unsupported codec {codec}")


def file_meta(buf: bytes) -> dict:
    if buf[:4] != b"PAR1" or buf[-4:] != b"PAR1":
        raise ValueError("not a parquet file")
    flen = int.from_bytes(buf[-8:-4], "little")
    meta, _ = read_struct(memoryview(buf)[-8 - flen : -8], 0)
    return meta


def _schema_leaves(meta: dict) -> dict[str, dict]:
    """name -> {type, type_length} for flat leaf columns."""
    out = {}
    for el in meta[2][1:]:  # skip root
        if 1 in el:  # has a physical type => leaf
            out[el[4].decode()] = {"type": el[1], "type_length": el.get(2, 0)}
    return out


def _decode_values(enc: int, ptype: str, payload, pos: int, nvals: int, dict_vals, type_length: int):
    mv = memoryview(payload)
    if enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY index stream
        bw = mv[pos]
        idx = hybrid.decode(bytes(mv[pos + 1 :]), bw, nvals).astype(np.int64)
        if ptype == "bytes":
            u_lens, u_data = dict_vals
            starts = np.concatenate([[0], np.cumsum(u_lens)[:-1]]) if len(u_lens) else u_lens
            from ..core.columns import gather_segments

            lens = u_lens[idx]
            return (lens, gather_segments(u_data, starts[idx], lens))
        return dict_vals[idx]
    if enc == 0:  # PLAIN
        if ptype == "bytes":
            lens, data, _ = plain.decode_byte_array(payload, nvals, pos)
            return (lens, data)
        if ptype == "flba":
            lens, data, _ = plain.decode_fixed_byte_array(payload, nvals, type_length, pos)
            return (lens, data)
        if ptype == "bool":
            vals, _ = plain.decode_bool(payload, nvals, pos)
            return vals
        vals, _ = plain.decode_fixed(payload, nvals, ptype, pos)
        return vals
    if enc == 5:  # DELTA_BINARY_PACKED
        vals, _ = deltabp.decode(payload, pos, 32 if ptype == "int32" else 64)
        return vals
    if enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
        lens, data, _ = bytearrays.decode_delta_length(payload, pos)
        return (lens, data)
    if enc == 7:  # DELTA_BYTE_ARRAY
        lens, data, _ = bytearrays.decode_delta(payload, pos)
        return (lens, data)
    if enc == 9:  # BYTE_STREAM_SPLIT (fixed-width transpose)
        if ptype == "flba":
            total = nvals * type_length
            raw = np.frombuffer(mv, np.uint8, total, pos).reshape(type_length, nvals)
            data = np.ascontiguousarray(raw.T).reshape(-1)
            return (np.full(nvals, type_length, dtype=np.int64), data)
        np_t = {"int32": np.int32, "int64": np.int64, "float": np.float32, "double": np.float64}
        if ptype not in np_t:
            raise ValueError(f"BYTE_STREAM_SPLIT on unsupported type {ptype}")
        vals, _ = bytestreamsplit.decode(mv, nvals, np.dtype(np_t[ptype]), pos)
        return vals
    raise ValueError(f"unsupported encoding {enc}")


def read_column(buf: bytes, column: str):
    """Decode one flat column entirely with this engine's kernels.

    -> (validity bool[n], values ndarray | (lengths, data))."""
    meta = file_meta(buf)
    leaves = _schema_leaves(meta)
    if column not in leaves:
        raise KeyError(column)
    ptype = _PHYS[leaves[column]["type"]]
    type_length = leaves[column]["type_length"]
    validity_parts, value_parts, len_parts, data_parts = [], [], [], []
    for rg in meta[4]:
        for cc in rg[1]:
            cmeta = cc[3]
            if [p.decode() for p in cmeta[3]] != [column]:
                continue
            codec = cmeta[4]
            n_values = cmeta[5]
            start = cmeta.get(11, cmeta[9])
            start = min(start, cmeta[9]) if 11 in cmeta else cmeta[9]
            end = start + cmeta[7]
            mv = memoryview(buf)
            pos = start
            dict_vals = None
            seen = 0
            while seen < n_values and pos < end:
                hdr, pos = read_struct(mv, pos)
                page_type = hdr[1]
                raw_len, comp_len = hdr[2], hdr[3]
                raw_page = bytes(mv[pos : pos + comp_len])
                pos += comp_len
                if page_type == 3:
                    # V2: rep/def level streams sit OUTSIDE the compressed
                    # region (page_v2.go:173-190 semantics)
                    dph2 = hdr[8]
                    lvl_len = dph2[5] + dph2[6]
                    is_comp = dph2.get(7, True)
                    body = (
                        _decompress(raw_page[lvl_len:], codec, raw_len - lvl_len)
                        if is_comp
                        else raw_page[lvl_len:]
                    )
                    payload = raw_page[:lvl_len] + body
                else:
                    payload = _decompress(raw_page, codec, raw_len)
                if page_type == 2:  # dictionary page
                    dph = hdr[7]
                    dn = dph[1]
                    if ptype == "bytes":
                        u_lens, u_data, _ = plain.decode_byte_array(payload, dn)
                        dict_vals = (u_lens, u_data)
                    else:
                        dict_vals, _ = plain.decode_fixed(payload, dn, ptype)
                    continue
                if page_type == 0:  # data page V1
                    dph = hdr[5]
                    nv = dph[1]
                    enc = dph[2]
                    # def levels: RLE with 4-byte size prefix, bit width 1
                    validity, ppos = _def_levels_v1(payload, nv)
                    repr_ = _decode_values(
                        enc, ptype, payload, ppos, int(validity.sum()), dict_vals, type_length
                    )
                elif page_type == 3:  # data page V2
                    dph = hdr[8]
                    nv, nnulls = dph[1], dph[2]
                    enc = dph[4]
                    dl_len, rl_len = dph[5], dph[6]
                    lv = payload[rl_len : rl_len + dl_len]
                    if dl_len:
                        validity = hybrid.decode(lv, 1, nv).astype(bool)
                    else:
                        validity = np.ones(nv, dtype=bool)
                    repr_ = _decode_values(
                        enc, ptype, payload, rl_len + dl_len, nv - nnulls, dict_vals, type_length
                    )
                else:
                    raise ValueError(f"unsupported page type {page_type}")
                validity_parts.append(validity)
                if ptype in ("bytes", "flba"):
                    len_parts.append(repr_[0])
                    data_parts.append(repr_[1])
                else:
                    value_parts.append(repr_)
                seen += nv
    validity = np.concatenate(validity_parts) if validity_parts else np.empty(0, bool)
    if ptype in ("bytes", "flba"):
        lens = np.concatenate(len_parts) if len_parts else np.empty(0, np.int64)
        data = np.concatenate(data_parts) if data_parts else np.empty(0, np.uint8)
        return validity, (lens.astype(np.int64), data)
    return validity, (np.concatenate(value_parts) if value_parts else np.empty(0))


def _def_levels_v1(payload, nv: int):
    """V1 def-level stream for a flat column: 4-byte LE size + hybrid
    (bit width 1). A required column has... pyarrow always writes the
    stream for optional columns; for required ones max_def=0 and no
    stream exists — callers pass columns written as optional."""
    size = int.from_bytes(bytes(payload[:4]), "little")
    lv = payload[4 : 4 + size]
    validity = hybrid.decode(lv, 1, nv).astype(bool)
    return validity, 4 + size
