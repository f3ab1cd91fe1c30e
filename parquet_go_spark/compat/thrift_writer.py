"""Minimal Thrift compact-protocol writer — enough to emit Parquet
footers and page headers readable by any Parquet implementation
(mirror of thrift_compact.py; same wire rules as the generated thrift
package the reference links).

Values are given as (type, value) pairs per field id; structs nest as
ordered {field_id: (type, value)} dicts; lists as ("list", elem_type,
[values]).
"""

from __future__ import annotations

import struct as _s

__all__ = ["write_struct", "uvarint", "zigzag"]

T_TRUE = 1
T_FALSE = 2
T_BYTE = 3
T_I16 = 4
T_I32 = 5
T_I64 = 6
T_DOUBLE = 7
T_BINARY = 8
T_LIST = 9
T_STRUCT = 12

_TYPES = {"bool": T_TRUE, "byte": T_BYTE, "i16": T_I16, "i32": T_I32, "i64": T_I64, "double": T_DOUBLE, "binary": T_BINARY, "list": T_LIST, "struct": T_STRUCT}


def uvarint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def _value_bytes(t: str, v) -> bytes:
    if t in ("i16", "i32", "i64"):
        return uvarint(zigzag(int(v)))
    if t == "byte":
        return bytes([v & 0xFF])
    if t == "double":
        return _s.pack("<d", v)
    if t == "binary":
        b = v.encode() if isinstance(v, str) else bytes(v)
        return uvarint(len(b)) + b
    if t == "struct":
        return write_struct(v)
    if t == "list":
        elem_t, items = v
        et = _TYPES.get(elem_t, T_TRUE if elem_t == "bool" else None)
        if et is None:
            raise ValueError(elem_t)
        n = len(items)
        hdr = bytes([(min(n, 15) << 4) | et]) + (uvarint(n) if n >= 15 else b"")
        if elem_t == "bool":
            # bool list elements take one byte each (1=true, 2=false)
            return hdr + bytes(T_TRUE if it else T_FALSE for it in items)
        return hdr + b"".join(_value_bytes(elem_t, it) for it in items)
    raise ValueError(t)


def write_struct(fields: dict) -> bytes:
    """fields: {field_id: (type, value)} -> compact-protocol struct."""
    out = bytearray()
    last = 0
    for fid in sorted(fields):
        t, v = fields[fid]
        if t == "bool":
            wire = T_TRUE if v else T_FALSE
        else:
            wire = _TYPES[t]
        delta = fid - last
        if 0 < delta <= 15:
            out.append((delta << 4) | wire)
        else:
            out.append(wire)
            out += uvarint(zigzag(fid))
        last = fid
        if t != "bool":
            out += _value_bytes(t, v)
    out.append(0)
    return bytes(out)
