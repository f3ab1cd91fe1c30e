"""Recursive nested types: struct / map / list<list> / mixed depth.

Reference parity: Dremel shredding+assembly over nested, repeated, and map
schemas (``schema.go:585-647`` NewListColumn/NewMapColumn, Dremel paper
fixtures ``data_store_test.go:104-390``, nested round-trip matrix
``readwrite_test.go:144-533``, empty-dict/all-null edge
``readwrite_test.go:534-569``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.core.chunk import decode_chunk, encode_chunk
from parquet_go_spark.core.columns import StructData, from_arrow, to_arrow


def _rt(arr: pa.Array, **kw) -> pa.Array:
    cd = from_arrow(arr)
    blob, meta = encode_chunk(cd, **kw)
    dec = decode_chunk(blob, logical=cd.logical)
    out = to_arrow(dec)
    if out.type != arr.type:
        out = out.cast(arr.type)
    return out


STRUCT_T = pa.struct([("a", pa.int64()), ("b", pa.string())])
DEEP_T = pa.struct([("a", pa.int64()), ("inner", pa.struct([("c", pa.string())]))])

CASES = [
    pa.array([{"a": 1, "b": "x"}, None, {"a": 3, "b": None}], type=STRUCT_T),
    pa.array([{"a": 1, "inner": {"c": "u"}}, {"a": 2, "inner": None}, None], type=DEEP_T),
    pa.array([{"k1": 1, "k2": 2}, None, {}, {"k3": None}], type=pa.map_(pa.string(), pa.int64())),
    pa.array([[[1, 2], [3]], None, [[], [4, None]], []], type=pa.list_(pa.list_(pa.int64()))),
    pa.array([[{"a": 1}, {"a": None}], None, []], type=pa.list_(pa.struct([("a", pa.int64())]))),
    pa.array(
        [{"xs": [1, 2], "n": "p"}, {"xs": None, "n": None}, None],
        type=pa.struct([("xs", pa.list_(pa.int64())), ("n", pa.string())]),
    ),
    pa.array(
        [{"a": [{"z": 1.5}], "b": []}, None, {"c": [{"z": None}, {"z": 2.0}]}],
        type=pa.map_(pa.string(), pa.list_(pa.struct([("z", pa.float64())]))),
    ),
    # reference edge cases: all-null parents, zero rows, empty children
    pa.array([None, None], type=STRUCT_T),
    pa.array([], type=pa.map_(pa.string(), pa.int64())),
    pa.array([None, [], [[]], [None]], type=pa.list_(pa.list_(pa.string()))),
]


@pytest.mark.parametrize("arr", CASES, ids=lambda a: str(a.type)[:48])
def test_nested_roundtrip(arr):
    assert _rt(arr).equals(arr)


@pytest.mark.parametrize("profile", ["auto", "reference"])
@pytest.mark.parametrize("compression", ["none", "zlib"])
def test_nested_roundtrip_profiles(profile, compression):
    arr = CASES[6]
    assert _rt(arr, profile=profile, compression=compression).equals(arr)


def test_nested_randomized_deep():
    rng = np.random.default_rng(7)
    n = 2000
    rows = []
    for i in range(n):
        r = rng.random()
        if r < 0.1:
            rows.append(None)
        else:
            n_keys = int(rng.integers(0, 4))
            rows.append(
                {
                    f"k{int(rng.integers(0, 9))}": (
                        None
                        if rng.random() < 0.2
                        else [
                            {"z": None if rng.random() < 0.3 else float(rng.random())}
                            for _ in range(int(rng.integers(0, 3)))
                        ]
                    )
                    for _ in range(n_keys)
                }
            )
    t = pa.map_(pa.string(), pa.list_(pa.struct([("z", pa.float64())])))
    arr = pa.array(rows, type=t)
    assert _rt(arr).equals(arr)


def test_struct_children_strip_null_parents():
    # a null struct must contribute no child entries (Dremel: nil group
    # appends levels only, schema.go:790-835)
    arr = pa.array([{"a": 1}, None, {"a": 3}], type=pa.struct([("a", pa.int64())]))
    cd = from_arrow(arr)
    assert isinstance(cd, StructData)
    assert cd.fields[0][1].num_rows == 2  # only valid parents


def test_struct_multipage_children():
    vals = [{"a": i, "b": "s" * 50} for i in range(5000)]
    vals[17] = None
    arr = pa.array(vals, type=STRUCT_T)
    cd = from_arrow(arr)
    blob, meta = encode_chunk(cd, max_page=4096)
    assert meta.num_pages > 2  # children actually page
    assert to_arrow(decode_chunk(blob, logical=cd.logical)).equals(arr)


def test_sliced_struct_offset_correct():
    base = pa.array(
        [{"a": i, "b": str(i)} for i in range(100)], type=STRUCT_T
    )
    sl = base.slice(25, 50)
    assert _rt(sl).equals(sl)


def test_sliced_map_offset_correct():
    base = pa.array([{f"k{i}": i} for i in range(100)], type=pa.map_(pa.string(), pa.int64()))
    sl = base.slice(10, 30)
    assert _rt(sl).equals(sl)
