"""Nested-column interop: pyarrow-written Parquet files with lists (any
depth), structs, and combinations decode bit-identically through this
engine's kernels + Dremel assembly (``read_column_arrow``)."""

from __future__ import annotations

import io

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.parquet_reader import (
    read_column_arrow,
    read_leaf_levels,
    schema_leaf_info,
    file_meta,
)

RNG = np.random.default_rng(77)


def _write(table, **kw) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def _rand_list_int(n, null_p=0.15, empty_p=0.15, max_len=6):
    out = []
    for _ in range(n):
        u = RNG.random()
        if u < null_p:
            out.append(None)
        elif u < null_p + empty_p:
            out.append([])
        else:
            out.append(
                [None if RNG.random() < 0.2 else int(RNG.integers(-1000, 1000)) for _ in range(int(RNG.integers(1, max_len)))]
            )
    return out


def _rand_list_str(n):
    return [
        None
        if RNG.random() < 0.1
        else [None if RNG.random() < 0.2 else f"s{int(RNG.integers(0, 50))}" for _ in range(int(RNG.integers(0, 5)))]
        for _ in range(n)
    ]


@pytest.mark.parametrize("version", ["1.0", "2.6"])
@pytest.mark.parametrize("dict_enc", [True, False])
def test_list_int64(version, dict_enc):
    data = _rand_list_int(800)
    tbl = pa.table({"xs": pa.array(data, type=pa.list_(pa.int64()))})
    buf = _write(tbl, version=version, use_dictionary=dict_enc, compression="snappy")
    got = read_column_arrow(buf, "xs")
    assert got.cast(pa.list_(pa.int64())).equals(tbl.column("xs").combine_chunks())


def test_list_strings_and_empties():
    data = _rand_list_str(600)
    tbl = pa.table({"tags": pa.array(data, type=pa.list_(pa.string()))})
    buf = _write(tbl, compression="zstd")
    got = read_column_arrow(buf, "tags")
    assert got.cast(pa.list_(pa.string())).equals(tbl.column("tags").combine_chunks())


def test_list_of_list():
    data = []
    for _ in range(500):
        u = RNG.random()
        if u < 0.1:
            data.append(None)
        elif u < 0.2:
            data.append([])
        else:
            data.append(_rand_list_int(int(RNG.integers(1, 4)), null_p=0.2, empty_p=0.2, max_len=4))
    t = pa.list_(pa.list_(pa.int64()))
    tbl = pa.table({"m": pa.array(data, type=t)})
    buf = _write(tbl)
    got = read_column_arrow(buf, "m")
    assert got.cast(t).equals(tbl.column("m").combine_chunks())


def test_triple_nested_list_doubles():
    t = pa.list_(pa.list_(pa.list_(pa.float64())))
    data = []
    for _ in range(200):
        if RNG.random() < 0.1:
            data.append(None)
            continue
        data.append(
            [
                None
                if RNG.random() < 0.15
                else [
                    [float(RNG.standard_normal()) for _ in range(int(RNG.integers(0, 3)))]
                    for _ in range(int(RNG.integers(0, 3)))
                ]
                for _ in range(int(RNG.integers(0, 3)))
            ]
        )
    tbl = pa.table({"d3": pa.array(data, type=t)})
    buf = _write(tbl)
    got = read_column_arrow(buf, "d3")
    assert got.cast(t).equals(tbl.column("d3").combine_chunks())


def test_struct_leaf_null_propagation():
    # optional struct<a: int64, b: string>: a single-leaf read folds the
    # struct's nulls into the leaf
    structs = [
        None if i % 7 == 0 else {"a": None if i % 5 == 0 else i, "b": f"v{i % 3}"}
        for i in range(300)
    ]
    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    tbl = pa.table({"s": pa.array(structs, type=t)})
    buf = _write(tbl)
    got_a = read_column_arrow(buf, "s.a")
    want_a = pa.array([None if s is None else s["a"] for s in structs], type=pa.int64())
    assert got_a.equals(want_a)
    got_b = read_column_arrow(buf, "s.b")
    want_b = pa.array([None if s is None else s["b"] for s in structs], type=pa.string())
    assert got_b.equals(want_b)


def test_list_of_struct_leaf():
    # list<struct<k: string, v: int64>> — leaf read returns list<leaf>
    rows = []
    for i in range(400):
        if i % 11 == 0:
            rows.append(None)
        else:
            rows.append(
                [
                    {"k": f"k{j % 3}", "v": None if (i + j) % 6 == 0 else i * 10 + j}
                    for j in range(i % 4)
                ]
            )
    t = pa.list_(pa.struct([("k", pa.string()), ("v", pa.int64())]))
    tbl = pa.table({"kv": pa.array(rows, type=t)})
    buf = _write(tbl)
    got_v = read_column_arrow(buf, "kv.list.element.v")
    want_v = pa.array(
        [None if r is None else [e["v"] for e in r] for r in rows], type=pa.list_(pa.int64())
    )
    assert got_v.cast(pa.list_(pa.int64())).equals(want_v)
    got_k = read_column_arrow(buf, "kv.list.element.k")
    want_k = pa.array(
        [None if r is None else [e["k"] for e in r] for r in rows], type=pa.list_(pa.string())
    )
    assert got_k.cast(pa.list_(pa.string())).equals(want_k)


def test_map_leaves():
    # map<string, int64> is list<struct<key, value>> at the level layer
    rows = [
        None if i % 9 == 0 else [(f"k{j}", None if j % 4 == 3 else i + j) for j in range(i % 5)]
        for i in range(300)
    ]
    t = pa.map_(pa.string(), pa.int64())
    tbl = pa.table({"m": pa.array(rows, type=t)})
    buf = _write(tbl)
    leaves = schema_leaf_info(file_meta(buf))
    key_path = [p for p in leaves if p.endswith(".key")][0]
    val_path = [p for p in leaves if p.endswith(".value")][0]
    got_k = read_column_arrow(buf, key_path)
    want_k = pa.array(
        [None if r is None else [k for k, _ in r] for r in rows], type=pa.list_(pa.string())
    )
    assert got_k.cast(pa.list_(pa.string())).equals(want_k)
    got_v = read_column_arrow(buf, val_path)
    want_v = pa.array(
        [None if r is None else [v for _, v in r] for r in rows], type=pa.list_(pa.int64())
    )
    assert got_v.cast(pa.list_(pa.int64())).equals(want_v)


def test_multiple_row_groups_and_pages():
    data = _rand_list_int(3000, max_len=8)
    tbl = pa.table({"xs": pa.array(data, type=pa.list_(pa.int64()))})
    buf = _write(tbl, row_group_size=700, data_page_size=2048)
    got = read_column_arrow(buf, "xs")
    assert got.cast(pa.list_(pa.int64())).equals(tbl.column("xs").combine_chunks())


def test_schema_leaf_info_thresholds():
    t = pa.list_(pa.list_(pa.int64()))
    tbl = pa.table({"m": pa.array([[[1]]], type=t)})
    buf = _write(tbl)
    info = schema_leaf_info(file_meta(buf))
    leaf = [v for k, v in info.items() if k.startswith("m.")][0]
    assert leaf["max_rep"] == 2
    # optional list< optional list< optional int64>>: 3 optionals + 2 repeated
    assert leaf["max_def"] == 5
    assert [r for r, _, _ in leaf["lists"]] == [1, 2]
    (r1, d1, p1), (r2, d2, p2) = leaf["lists"]
    assert (d1, p1) == (2, 1)
    assert (d2, p2) == (4, 3)


def test_read_leaf_levels_values_only_for_full_def():
    data = [[1, None, 3], None, [], [7]]
    tbl = pa.table({"xs": pa.array(data, type=pa.list_(pa.int64()))})
    buf = _write(tbl, use_dictionary=False)
    rep, deflv, values, info = read_leaf_levels(buf, "xs.list.element")
    assert len(rep) == len(deflv) == 6  # 3 + 1 + 1 + 1 positions
    assert list(values) == [1, 3, 7]


def test_logical_types_flat_and_nested():
    import datetime
    import decimal

    cases = [
        ("d", pa.date32(), [datetime.date(2026, 1, 1) + datetime.timedelta(days=i) if i % 5 else None for i in range(200)], {}),
        ("ts", pa.timestamp("us"), [datetime.datetime(2026, 1, 1, 0, 0, i % 60) if i % 7 else None for i in range(200)], {}),
        ("i8", pa.int8(), [(i % 256) - 128 if i % 3 else None for i in range(200)], {}),
        ("i16", pa.int16(), [(i * 37) - 5000 if i % 3 else None for i in range(200)], {}),
        ("u32", pa.uint32(), [(2**32 - 1 - i) if i % 3 else None for i in range(200)], {"use_dictionary": False}),
        ("dec9", pa.decimal128(9, 2), [decimal.Decimal(i * 7) / 100 if i % 4 else None for i in range(200)], {"use_dictionary": False}),
        ("dec20", pa.decimal128(20, 4), [decimal.Decimal(-(10**15) + i * 31) / 10000 if i % 4 else None for i in range(200)], {"use_dictionary": False}),
        ("decl", pa.list_(pa.decimal128(20, 4)), [[decimal.Decimal(i) / 10000, None] if i % 4 else None for i in range(100)], {"use_dictionary": False}),
        ("dl", pa.list_(pa.date32()), [[datetime.date(2026, 2, 1), None] if i % 3 else None for i in range(100)], {}),
    ]
    for name, typ, data, wkw in cases:
        tbl = pa.table({name: pa.array(data, type=typ)})
        buf = _write(tbl, **wkw)
        got = read_column_arrow(buf, name)
        want = tbl.column(name).combine_chunks()
        assert got.type == want.type, (name, got.type, want.type)
        assert got.equals(want), name
