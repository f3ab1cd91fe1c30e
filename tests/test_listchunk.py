"""List-column (Dremel rep/def level) chunk tests — SURVEY.md §1.3:
max_rep=1 / max_def=3 single-level lists over every element type, the
level streams' exact values, and edge cases (null list, empty list, null
elements, empty table)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.core.chunk import decode_chunk, encode_chunk
from parquet_go_spark.core.columns import from_arrow, to_arrow
from parquet_go_spark.core.listchunk import compute_levels, levels_to_structure

CASES = {
    "floats": pa.array([[1.0, 2.5], [], None, [3.25], [None, 4.5, 5.0]], type=pa.list_(pa.float32())),
    "ints": pa.array([list(range(i)) for i in range(20)] + [None, []], type=pa.list_(pa.int64())),
    "strings": pa.array([["ab", "c"], None, [], ["def", None, ""]], type=pa.list_(pa.string())),
    "allnull": pa.array([None, None, None], type=pa.list_(pa.int32())),
    "allempty": pa.array([[], [], []], type=pa.list_(pa.int64())),
    "empty": pa.array([], type=pa.list_(pa.float64())),
    "bools": pa.array([[True], [False, True], None], type=pa.list_(pa.bool_())),
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("profile", ["auto", "reference"])
def test_list_roundtrip(name, profile):
    arr = CASES[name]
    cd = from_arrow(arr)
    blob, meta = encode_chunk(cd, profile=profile)
    out = to_arrow(decode_chunk(blob, logical=str(arr.type)))
    assert out.cast(arr.type).equals(arr), (name, profile)
    assert meta.num_rows == len(arr)
    assert meta.null_count == arr.null_count


@pytest.mark.parametrize("compression", ["zlib", "snappy"])
def test_list_roundtrip_compressed(compression):
    arr = CASES["strings"]
    cd = from_arrow(arr)
    blob, _ = encode_chunk(cd, compression=compression)
    out = to_arrow(decode_chunk(blob, logical=str(arr.type)))
    assert out.cast(arr.type).equals(arr)


def test_levels_exact():
    # [[a, null], null, [], [b]] ->
    # entries: (r0,d3)(r1,d2) | (r0,d0) | (r0,d1) | (r0,d3)
    arr = pa.array([[1, None], None, [], [2]], type=pa.list_(pa.int64()))
    cd = from_arrow(arr)
    rep, dlev = compute_levels(cd)
    assert rep.tolist() == [0, 1, 0, 0, 0]
    assert dlev.tolist() == [3, 2, 0, 1, 3]
    row_validity, lens, elem_validity = levels_to_structure(rep, dlev, 4)
    assert row_validity.tolist() == [True, False, True, True]
    assert lens.tolist() == [2, 0, 0, 1]
    assert elem_validity.tolist() == [True, False, True]


def test_large_list_roundtrip():
    rng = np.random.default_rng(7)
    data = [rng.standard_normal(64).astype(np.float32).tolist() for _ in range(3000)]
    arr = pa.array(data, type=pa.list_(pa.float32()))
    cd = from_arrow(arr)
    blob, meta = encode_chunk(cd, profile="auto")
    out = to_arrow(decode_chunk(blob, logical=str(arr.type)))
    assert out.cast(arr.type).equals(arr)
    # level streams must be tiny: rep is RLE-friendly, def is constant
    assert meta.encoded_bytes < 3000 * 64 * 4 * 1.05
