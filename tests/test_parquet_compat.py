"""Golden interop tests (reference ``parquet_test.go`` analogue): files
written by pyarrow's C++ Parquet writer decode bit-identically through
this engine's kernels via the compat reader."""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.parquet_reader import read_column


def _write(table, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def _col(table, name):
    return table.column(name).combine_chunks()


RNG = np.random.default_rng(11)
N = 5000
TBL = pa.table(
    {
        "i32": pa.array(RNG.integers(-(2**31), 2**31, N, dtype=np.int64).astype(np.int32), type=pa.int32()),
        "i64": pa.array(RNG.integers(-(2**62), 2**62, N), type=pa.int64()),
        "f64": pa.array(RNG.standard_normal(N), type=pa.float64()),
        "s": pa.array([f"prefix-{i % 97}-{i}" for i in range(N)], type=pa.string()),
        "lowcard": pa.array([f"val{i % 7}" for i in range(N)], type=pa.string()),
    }
)


def _check_fixed(buf, name, arr):
    validity, vals = read_column(buf, name)
    assert validity.all()
    got = vals
    want = arr.to_numpy(zero_copy_only=False)
    if got.dtype != want.dtype:
        got = got.view(want.dtype) if got.dtype.itemsize == want.dtype.itemsize else got
    assert np.array_equal(got, want), name


def _check_bytes(buf, name, arr):
    validity, (lens, data) = read_column(buf, name)
    assert validity.all()
    joined = b"".join(v.as_py().encode() for v in arr)
    assert bytes(data.tobytes()) == joined
    assert lens.tolist() == [len(v.as_py().encode()) for v in arr]


@pytest.mark.parametrize("version", ["1.0", "2.4"])
@pytest.mark.parametrize("compression", ["NONE", "SNAPPY", "ZSTD"])
def test_dictionary_pages(version, compression):
    buf = _write(TBL, use_dictionary=True, compression=compression, data_page_version="1.0", version=version)
    _check_bytes(buf, "lowcard", _col(TBL, "lowcard"))
    _check_fixed(buf, "i32", _col(TBL, "i32"))
    _check_fixed(buf, "f64", _col(TBL, "f64"))


def test_plain_pages():
    buf = _write(TBL, use_dictionary=False, compression="NONE", data_page_version="1.0")
    for c in ("i32", "i64", "f64"):
        _check_fixed(buf, c, _col(TBL, c))
    _check_bytes(buf, "s", _col(TBL, "s"))


def test_delta_binary_packed():
    buf = _write(
        TBL,
        use_dictionary=False,
        compression="NONE",
        column_encoding={"i32": "DELTA_BINARY_PACKED", "i64": "DELTA_BINARY_PACKED"},
    )
    _check_fixed(buf, "i32", _col(TBL, "i32"))
    _check_fixed(buf, "i64", _col(TBL, "i64"))


def test_delta_byte_array_encodings():
    buf = _write(
        TBL,
        use_dictionary=False,
        compression="NONE",
        column_encoding={"s": "DELTA_BYTE_ARRAY", "lowcard": "DELTA_LENGTH_BYTE_ARRAY"},
    )
    _check_bytes(buf, "s", _col(TBL, "s"))
    _check_bytes(buf, "lowcard", _col(TBL, "lowcard"))


def test_data_page_v2():
    buf = _write(TBL, use_dictionary=True, compression="SNAPPY", data_page_version="2.0")
    _check_bytes(buf, "lowcard", _col(TBL, "lowcard"))
    _check_fixed(buf, "i64", _col(TBL, "i64"))


def test_nulls_roundtrip():
    arr = pa.array([None if i % 5 == 0 else i for i in range(1000)], type=pa.int64())
    t = pa.table({"x": arr})
    buf = _write(t, use_dictionary=False, compression="NONE")
    validity, vals = read_column(buf, "x")
    assert validity.tolist() == [i % 5 != 0 for i in range(1000)]
    assert vals.tolist() == [i for i in range(1000) if i % 5 != 0]


@pytest.mark.parametrize("compression", ["NONE", "SNAPPY"])
def test_byte_stream_split_pages(compression):
    """pyarrow BYTE_STREAM_SPLIT pages (float/double + the 2.11 int
    extension) decode through our kernels."""
    cols = ["f64", "i32", "i64"]
    tbl = pa.table(
        {
            "f64": TBL.column("f64"),
            "i32": TBL.column("i32"),
            "i64": TBL.column("i64"),
            "f32": pa.array(RNG.standard_normal(N).astype(np.float32), type=pa.float32()),
        }
    )
    buf = _write(
        tbl,
        version="2.6",
        use_dictionary=False,
        compression=compression,
        column_encoding={c: "BYTE_STREAM_SPLIT" for c in cols + ["f32"]},
    )
    for c in cols + ["f32"]:
        _check_fixed(buf, c, _col(tbl, c))


def test_byte_stream_split_flba():
    fixed = pa.array([bytes([i % 251, (i * 7) % 251, i % 13]) for i in range(N)],
                     type=pa.binary(3))
    tbl = pa.table({"fx": fixed})
    buf = _write(
        tbl, version="2.6", use_dictionary=False,
        column_encoding={"fx": "BYTE_STREAM_SPLIT"},
    )
    validity, (lens, data) = read_column(buf, "fx")
    assert validity.all()
    assert lens.tolist() == [3] * N
    assert bytes(data.tobytes()) == b"".join(v.as_py() for v in fixed)
