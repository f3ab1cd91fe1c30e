"""Nested write interop: files produced by ``write_parquet`` with nested
schemas (lists, structs, maps) read back exactly in pyarrow and DuckDB,
and the shredded level streams are byte-identical to pyarrow's own."""

from __future__ import annotations

import io

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.parquet_reader import read_leaf_levels
from parquet_go_spark.compat.parquet_writer import write_parquet
from parquet_go_spark.compat.shred import leaf_specs, shred_leaf

RNG = np.random.default_rng(19)


def _rand_lists(n, inner=lambda: int(RNG.integers(-999, 999)), null_p=0.12, empty_p=0.12):
    out = []
    for _ in range(n):
        u = RNG.random()
        if u < null_p:
            out.append(None)
        elif u < null_p + empty_p:
            out.append([])
        else:
            out.append([None if RNG.random() < 0.2 else inner() for _ in range(int(RNG.integers(1, 6)))])
    return out


def _roundtrip(tbl, **kw):
    buf = write_parquet(tbl, **kw)
    back = pq.read_table(io.BytesIO(buf))
    for name in tbl.column_names:
        want = tbl.column(name).combine_chunks()
        got = back.column(name).combine_chunks().cast(want.type)
        assert got.equals(want), name
    return buf


def test_shred_levels_match_pyarrow():
    cases = [
        ("xs", pa.list_(pa.int64()), _rand_lists(500)),
        (
            "m",
            pa.list_(pa.list_(pa.int64())),
            [
                None
                if RNG.random() < 0.1
                else [None if RNG.random() < 0.15 else _rand_lists(1)[0] for _ in range(int(RNG.integers(0, 4)))]
                for _ in range(300)
            ],
        ),
        (
            "st",
            pa.struct([("a", pa.int64()), ("b", pa.string())]),
            [
                None if i % 7 == 0 else {"a": None if i % 5 == 0 else i, "b": f"v{i % 3}"}
                for i in range(300)
            ],
        ),
        (
            "mp",
            pa.map_(pa.string(), pa.int64()),
            [
                None if i % 9 == 0 else [(f"k{j}", None if j == 2 else i + j) for j in range(i % 4)]
                for i in range(300)
            ],
        ),
    ]
    for name, typ, data in cases:
        tbl = pa.table({name: pa.array(data, type=typ)})
        buf = io.BytesIO()
        pq.write_table(tbl, buf, use_dictionary=False, compression="none")
        buf = buf.getvalue()
        col = tbl.column(name).combine_chunks()
        for spec in leaf_specs(name, typ):
            path = ".".join(spec["path"])
            rep, deflv, leaf, counts, has = shred_leaf(col, spec)
            prep, pdef, _, info = read_leaf_levels(buf, path)
            assert np.array_equal(rep, prep), (path, "rep")
            assert np.array_equal(deflv, pdef), (path, "def")
            assert info["max_def"] == spec["max_def"], path
            assert info["max_rep"] == spec["max_rep"], path
            assert int(counts.sum()) == len(rep)
            assert int(has.sum()) == len(leaf)


@pytest.mark.parametrize("compression", ["none", "snappy", "zstd"])
def test_write_nested_readback(compression):
    tbl = pa.table(
        {
            "id": pa.array(range(400), type=pa.int64()),
            "xs": pa.array(_rand_lists(400), type=pa.list_(pa.int64())),
            "tags": pa.array(
                _rand_lists(400, inner=lambda: f"s{int(RNG.integers(0, 40))}"),
                type=pa.list_(pa.string()),
            ),
            "st": pa.array(
                [
                    None if i % 7 == 0 else {"a": None if i % 5 == 0 else i, "b": f"v{i % 3}"}
                    for i in range(400)
                ],
                type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
            "mp": pa.array(
                [
                    None if i % 9 == 0 else [(f"k{j}", None if j == 2 else i + j) for j in range(i % 4)]
                    for i in range(400)
                ],
                type=pa.map_(pa.string(), pa.int64()),
            ),
        }
    )
    _roundtrip(tbl, compression=compression)


def test_write_triple_nested_multipage_multigroup():
    data = []
    for _ in range(1200):
        u = RNG.random()
        if u < 0.1:
            data.append(None)
        else:
            data.append(
                [
                    None
                    if RNG.random() < 0.15
                    else [[float(RNG.standard_normal()) for _ in range(int(RNG.integers(0, 3)))] for _ in range(int(RNG.integers(0, 3)))]
                    for _ in range(int(RNG.integers(0, 4)))
                ]
            )
    tbl = pa.table({"d3": pa.array(data, type=pa.list_(pa.list_(pa.list_(pa.float64()))))})
    buf = _roundtrip(tbl, max_page=4096, max_row_group=317)
    meta = pq.ParquetFile(io.BytesIO(buf)).metadata
    assert meta.num_row_groups == 4


def test_write_nested_duckdb_reads():
    tbl = pa.table(
        {
            "id": pa.array(range(200), type=pa.int64()),
            "xs": pa.array(_rand_lists(200), type=pa.list_(pa.int64())),
        }
    )
    buf = _roundtrip(tbl, compression="snappy")
    con = duckdb.connect()
    con.register_filesystem  # noqa: B018 - fsspec not needed; use a temp file
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".parquet", delete=False) as fh:
        fh.write(buf)
        path = fh.name
    try:
        n, total = con.sql(
            f"SELECT count(*), sum(len(xs)) FROM '{path}'"
        ).fetchone()
        assert n == 200
        want_total = sum(len(x) for x in tbl.column("xs").to_pylist() if x is not None)
        assert int(total) == want_total
    finally:
        os.unlink(path)


def test_write_nested_own_reader_roundtrip():
    # our writer -> our nested reader, no third engine involved
    from parquet_go_spark.compat.parquet_reader import read_column_arrow

    data = _rand_lists(600)
    tbl = pa.table({"xs": pa.array(data, type=pa.list_(pa.int64()))})
    buf = write_parquet(tbl, compression="zstd")
    got = read_column_arrow(buf, "xs")
    assert got.cast(pa.list_(pa.int64())).equals(tbl.column("xs").combine_chunks())


def test_required_key_with_null_raises():
    arr = pa.array([[("a", 1)]], type=pa.map_(pa.string(), pa.int64()))
    spec = [s for s in leaf_specs("m", arr.type) if s["path"][-1] == "key"][0]
    # force a null key through a hand-built struct-of-lists
    kv = pa.ListArray.from_arrays(
        pa.array([0, 1], type=pa.int32()),
        pa.StructArray.from_arrays(
            [pa.array([None], type=pa.string()), pa.array([1], type=pa.int64())],
            names=["key", "value"],
        ),
    )
    with pytest.raises(ValueError, match="required leaf"):
        shred_leaf(kv, {**spec, "steps": [("map", 1, 1, 0), ("leaf", 2, False)]})
