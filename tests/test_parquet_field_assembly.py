"""Full-field Dremel assembly from real Parquet level streams
(compat.parquet_reader.read_field_arrow): struct / map / list mixtures
at any depth must match pyarrow's own read bit-for-bit (reference
record assembly ``schema.go:283-312`` + Dremel fixtures
``data_store_test.go:104-390``)."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.parquet_reader import (
    field_arrow_type,
    file_meta,
    read_field_arrow,
    schema_tree,
)


def _rt(name, arr, **wkw):
    t = pa.table({name: arr})
    b = io.BytesIO()
    pq.write_table(t, b, **wkw)
    buf = b.getvalue()
    got = read_field_arrow(buf, name)
    exp = pq.read_table(io.BytesIO(buf)).column(name).combine_chunks()
    assert got.to_pylist() == exp.to_pylist()
    node = next(c for c in schema_tree(file_meta(buf))["children"] if c["name"] == name)
    assert field_arrow_type(node) == exp.type
    return got


def test_struct_of_scalars_nulls_everywhere():
    _rt(
        "st",
        pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": "y"}, {"a": 3, "b": None}] * 25),
    )


def test_nested_struct():
    _rt(
        "nst",
        pa.array(
            [
                {"o": {"a": i, "b": f"s{i}"}} if i % 3 else ({"o": None} if i % 2 else None)
                for i in range(100)
            ]
        ),
    )


def test_map_null_empty_full():
    _rt(
        "mp",
        pa.array(
            [{"k1": 1, "k2": 2} if i % 3 else ({} if i % 2 else None) for i in range(100)],
            type=pa.map_(pa.string(), pa.int64()),
        ),
    )


def test_list_of_struct():
    _rt(
        "ls",
        pa.array(
            [
                [{"a": i, "b": None}, {"a": None, "b": str(i)}]
                if i % 4
                else (None if i % 2 else [])
                for i in range(100)
            ]
        ),
    )


def test_struct_of_list():
    _rt(
        "sl",
        pa.array(
            [
                {"xs": [1, 2, i]} if i % 3 else ({"xs": None} if i % 2 else None)
                for i in range(100)
            ],
            type=pa.struct([("xs", pa.list_(pa.int64()))]),
        ),
    )


def test_map_of_list_of_struct():
    _rt(
        "deep",
        pa.array(
            [
                {
                    f"k{j}": [{"p": i * j, "q": None if j % 2 else str(i)}] * (j % 3)
                    for j in range(i % 4)
                }
                if i % 5
                else None
                for i in range(200)
            ],
            type=pa.map_(
                pa.string(), pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())]))
            ),
        ),
    )


def test_list_of_map():
    _rt(
        "lm",
        pa.array(
            [[{"a": i}, None, {}] if i % 3 else None for i in range(100)],
            type=pa.list_(pa.map_(pa.string(), pa.int64())),
        ),
    )


@pytest.mark.parametrize(
    "wkw",
    [
        {"compression": "zstd", "version": "2.6", "data_page_version": "2.0"},
        {"compression": "gzip", "use_dictionary": False},
        {"compression": "snappy", "row_group_size": 37},
    ],
)
def test_shapes_under_writer_variants(wkw):
    _rt(
        "deep",
        pa.array(
            [
                {f"k{j}": [{"p": i * j, "q": str(i)}] * (j % 3) for j in range(i % 4)}
                if i % 5
                else None
                for i in range(200)
            ],
            type=pa.map_(
                pa.string(), pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())]))
            ),
        ),
        **wkw,
    )


def test_unknown_field_raises():
    t = pa.table({"a": pa.array([1])})
    b = io.BytesIO()
    pq.write_table(t, b)
    with pytest.raises(KeyError):
        read_field_arrow(b.getvalue(), "zzz")
