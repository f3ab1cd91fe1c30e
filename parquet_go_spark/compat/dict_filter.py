"""Dictionary-page filtering for real-Parquet scan planning — the
EXACT point-lookup prune tier (parquet-mr's DictionaryFilter, public
behavior): when a chunk's encoding_stats prove that every data page is
dictionary-encoded, the dictionary page IS the chunk's complete distinct
value set, so an equality/IN predicate whose members all miss the
dictionary provably excludes the chunk — no false-positive rate at all,
unlike a bloom filter, and it works on files whose writer stored no
bloom.

One bounded pread per probe (the dictionary page region, located from
``dictionary_page_offset``), never a data page. Conservative contract:
anything inconclusive — mixed encodings (a dict-overflow fallback to
PLAIN mid-chunk), missing encoding_stats, unsupported types, forged
headers — keeps the chunk.
"""

from __future__ import annotations

import numpy as np

from ..kernels import int96, plain
from .thrift_compact import read_struct

__all__ = ["all_data_pages_dict", "dict_probe_file", "decode_dict_page"]

_PHYS = {0: "bool", 1: "int32", 2: "int64", 3: "int96", 4: "float", 5: "double", 6: "bytes", 7: "flba"}
_DICT_ENCODINGS = {2, 8}  # PLAIN_DICTIONARY / RLE_DICTIONARY
_MAX_DICT_REGION = 1 << 26  # governor: 64 MiB dictionary page region


def all_data_pages_dict(cmeta: dict) -> bool:
    """encoding_stats (ColumnMetaData field 13) prove every data page is
    dictionary-encoded. Absent stats or any non-dict data page ⇒ False
    (the dictionary would not cover the chunk's values)."""
    stats = cmeta.get(13)
    if not stats:
        return False
    saw_data = False
    for s in stats:
        if s.get(1) in (0, 3):  # DATA_PAGE / DATA_PAGE_V2
            saw_data = True
            if s.get(2) not in _DICT_ENCODINGS:
                return False
    return saw_data


def decode_dict_page(region: bytes, cmeta: dict):
    """Dictionary page bytes (header + payload at offset 0) -> decoded
    values: ndarray for fixed types, (lengths, data) for byte types."""
    from .parquet_reader import _MAX_RAW_PAGE, _decompress

    mv = memoryview(region).cast("B")  # normalize signed buffer views
    hdr, pos = read_struct(mv, 0)
    if hdr.get(1) != 2:  # DICTIONARY_PAGE
        raise ValueError("dictionary_page_offset points at a non-dictionary page")
    raw_len, comp_len = hdr[2], hdr[3]
    if not (0 <= comp_len <= len(mv) - pos and 0 <= raw_len <= _MAX_RAW_PAGE):
        raise ValueError("implausible dictionary page header")
    dn = hdr[7][1]
    payload = _decompress(bytes(mv[pos : pos + comp_len]), cmeta[4], raw_len)
    if not 0 <= dn <= len(payload):
        raise ValueError("implausible dictionary count")
    ptype = _PHYS[cmeta[1]]
    if ptype == "bytes":
        lens, data, _ = plain.decode_byte_array(payload, dn)
        return lens, data
    if ptype == "flba":
        raise ValueError("flba dictionary probe unsupported")  # needs type_length
    if ptype == "int96":
        vals, _ = int96.decode_plain_nanos(payload, dn)
        return vals
    vals, _ = plain.decode_fixed(payload, dn, ptype)
    return vals


def _contains(decoded, value, ptype: str) -> bool:
    if ptype == "bytes":
        lens, data = decoded
        # only str/bytes probes compare against a byte_array dictionary:
        # bytes(123) is 123 NUL bytes (a guaranteed miss = FALSE
        # exclusion of present rows) and bytes(1.5) raises — both mean
        # 'no proof', keep the chunk
        if isinstance(value, str):
            raw = value.encode()
        elif isinstance(value, (bytes, bytearray, memoryview)):
            raw = bytes(value)
        else:
            return True  # incomparable probe: inconclusive, keep
        starts = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=starts[1:])
        want = np.flatnonzero(lens == len(raw))
        probe = np.frombuffer(raw, dtype=np.uint8)
        for i in want:
            if np.array_equal(data[starts[i] : starts[i + 1]], probe):
                return True
        return False
    try:
        return bool(np.isin(np.asarray([value]), decoded)[0])
    except (TypeError, ValueError):
        return True  # incomparable probe: inconclusive, keep


def dict_probe_file(path: str, cmeta: dict, values: tuple) -> bool:
    """True ⇒ the chunk MIGHT contain some of ``values``; False ⇒ every
    member provably absent (exact: the dictionary enumerates the chunk's
    distinct values). Reads only [dictionary_page_offset,
    data_page_offset) — one bounded pread."""
    if not all_data_pages_dict(cmeta):
        return True
    dict_off = cmeta.get(11)
    data_off = cmeta.get(9)
    if dict_off is None or data_off is None or not 0 <= dict_off < data_off:
        return True
    size = data_off - dict_off
    if size > _MAX_DICT_REGION:
        return True
    ptype = _PHYS.get(cmeta[1])
    if ptype in (None, "flba", "bool", "int96"):
        return True
    with open(path, "rb") as fh:
        fh.seek(dict_off)
        region = fh.read(size)
    try:
        decoded = decode_dict_page(region, cmeta)
    except (ValueError, KeyError, IndexError):
        return True
    return any(_contains(decoded, v, ptype) for v in values)
