"""Round-5 review batch 9 pins.

Finding 1: ``decode_table``'s task loop called ``content.as_py()`` on
each binaryFile row — a full memcpy of every partition file per task
(doubling peak task RSS on production-sized partitions). The decode
path must accept a zero-copy ``pa.Buffer`` view of the batch column
instead; these tests pin that the whole non-Spark decode stack
(``parse_partition_file`` → ``partition_file_epoch`` →
``decode_blobs_to_batch``) works over a ``pa.Buffer`` payload and that
the scalar view really is zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.spark.decode_job import binary_value_view, decode_blobs_to_batch
from parquet_go_spark.spark.encode_job import (
    encode_columns_to_partition,
    parse_partition_file,
    partition_file_epoch,
)


def _encode_fixture(tmp_path, epoch=0):
    t = pa.table(
        {
            "url": pa.array([f"https://x.test/{i}" for i in range(257)]),
            "n": pa.array(np.arange(257, dtype=np.int64)),
        }
    )
    encode_columns_to_partition(
        t, ["url", "n"], str(tmp_path), 0, compression="snappy", epoch=epoch
    )
    with open(tmp_path / "part-00000.bin", "rb") as f:
        return t, f.read()


def test_binary_value_view_is_zero_copy():
    """The optimization's premise: the view addresses the array's own
    data buffer (scalar ``.as_buffer()``/``.as_py()`` both COPY in this
    pyarrow — that copy is exactly what the decode change removes).
    Sliced arrays (nonzero offset) must honor the slice too."""
    payload = b"\x07" * 4096
    arr = pa.array([b"aa", payload, b"zz"], type=pa.binary()).slice(1, 2)
    buf = binary_value_view(arr, 0)
    data_buf = arr.buffers()[2]
    lo, hi = data_buf.address, data_buf.address + data_buf.size
    assert lo <= buf.address and buf.address + buf.size <= hi
    assert bytes(memoryview(buf)) == payload
    assert bytes(memoryview(binary_value_view(arr, 1))) == b"zz"
    # large_binary layout too (64-bit offsets)
    larr = pa.array([payload], type=pa.large_binary())
    lbuf = binary_value_view(larr, 0)
    ldata = larr.buffers()[2]
    assert ldata.address <= lbuf.address
    assert bytes(memoryview(lbuf)) == payload


def test_decode_stack_accepts_buffer_payload(tmp_path):
    t, raw = _encode_fixture(tmp_path, epoch=3)
    # the exact shape decode_partition sees: a Buffer view of the
    # binaryFile batch column, never bytes
    batch = pa.record_batch({"content": pa.array([raw], type=pa.binary())})
    payload = batch.column("content")[0].as_buffer()
    assert isinstance(payload, pa.Buffer)

    assert partition_file_epoch(payload) == 3
    blobs = parse_partition_file(payload, {"url", "n"})
    assert set(blobs) == {"url", "n"}
    out = decode_blobs_to_batch(
        blobs, ["url", "n"], set(), {"url": "string", "n": "int64"}, None
    )
    assert out.num_rows == 257
    assert out.column("url").to_pylist() == t.column("url").to_pylist()
    assert out.column("n").to_pylist() == t.column("n").to_pylist()


def test_decode_buffer_payload_with_positional_deletes(tmp_path):
    """delete_pos + eq_deletes ride the same payload views."""
    _, raw = _encode_fixture(tmp_path)
    payload = pa.array([raw], type=pa.binary())[0].as_buffer()
    blobs = parse_partition_file(payload, {"url", "n"})
    out = decode_blobs_to_batch(
        blobs,
        ["url", "n"],
        set(),
        {"url": "string", "n": "int64"},
        None,
        delete_pos=np.array([0, 256], dtype=np.int64),
        eq_deletes=[("n", [5, 6])],
    )
    assert out.num_rows == 257 - 2 - 2
    got = set(out.column("n").to_pylist())
    assert {0, 256, 5, 6} & got == set()


@pytest.mark.spark
def test_decode_table_roundtrip_over_buffer_payload(spark, tmp_path):
    """End-to-end: the mapInArrow decode path (now buffer-backed) still
    round-trips through a real session."""
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    df = spark.range(1000).selectExpr(
        "concat('u', id) as url", "id as n", "cast(id % 7 as double) as score"
    )
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col="url", partitions=4, compression="zstd").collect()
    got = decode_table(spark, d)
    assert got.count() == 1000
    assert got.agg({"n": "sum"}).first()[0] == df.agg({"n": "sum"}).first()[0]


def test_decode_entry_points_accept_pa_buffer(tmp_path):
    """Class closure for the signed-'b' memoryview finding: every public
    byte-walking decode entry normalizes its view, so a pa.Buffer (or
    any signed-format buffer) decodes identically to bytes."""
    from parquet_go_spark.core.chunk import (
        chunk_dict_values,
        chunk_page_index,
        decode_chunk,
        encode_chunk,
    )
    from parquet_go_spark.core.columns import from_arrow, to_arrow

    col = from_arrow(pa.array([f"v{i % 7}" for i in range(300)]))
    blob, _ = encode_chunk(col, compression="zstd", page_stats=True)
    bbuf = pa.py_buffer(blob)
    assert to_arrow(decode_chunk(bbuf, logical="string")).equals(
        to_arrow(decode_chunk(blob, logical="string"))
    )
    assert chunk_page_index(bbuf) == chunk_page_index(blob)
    assert chunk_dict_values(bbuf) == chunk_dict_values(blob)

    # nested containers too
    larr = pa.array([[1, 2], None, [], [3]], type=pa.list_(pa.int64()))
    lblob, _ = encode_chunk(from_arrow(larr), compression="snappy")
    assert to_arrow(decode_chunk(pa.py_buffer(lblob), logical="list<int64>")).equals(
        to_arrow(decode_chunk(lblob, logical="list<int64>"))
    )

    # real-parquet reader: footer + column walk over a pa.Buffer
    from parquet_go_spark.compat.parquet_writer import write_parquet
    from parquet_go_spark.compat.parquet_reader import file_meta, read_column

    t = pa.table({"s": pa.array([f"x{i % 300}" for i in range(1000)])})
    pq_bytes = write_parquet(t, compression="snappy")
    pbuf = pa.py_buffer(pq_bytes)
    assert file_meta(pbuf)[3] == 1000
    v_b, (l_b, d_b) = read_column(pq_bytes, "s")
    v_p, (l_p, d_p) = read_column(pbuf, "s")
    assert (l_b == l_p).all() and (np.asarray(d_b) == np.asarray(d_p)).all()


def test_to_arrow_list_offsets_never_wrap_int32(monkeypatch):
    """to_arrow's list path cast offsets to int32 unconditionally — a
    chunk with >2^31 flattened elements would silently WRAP and corrupt
    every row boundary. Wide lists now emit large_list (exact), and
    wide maps (whose Arrow offsets are int32 by spec) raise instead of
    truncating. Exercised with a synthetic lens vector — materializing
    2^31 real elements is not testable — by spot-checking the offsets
    dtype decision boundary."""
    from parquet_go_spark.core.columns import ListData, ColumnData, to_arrow

    # small list: int32 offsets (the common path)
    elem = ColumnData(
        "int64", np.ones(3, bool), values=np.arange(3, dtype=np.int64), logical="int64"
    )
    small = ListData(np.ones(2, bool), np.array([1, 2], np.int64), elem, logical="list<int64>")
    arr = to_arrow(small)
    assert pa.types.is_list(arr.type)
    assert arr.to_pylist() == [[0], [1, 2]]

    # wide list: patch the overflow check boundary via a fake lens sum
    # by monkeypatching numpy cumsum is fragile — instead drive the
    # decision function directly with a crafted ListData whose element
    # column LIES about its length (to_arrow only reads lens for
    # offsets; elem array length is validated by Arrow at from_arrays,
    # so use a tiny elem and expect Arrow's own length error AFTER the
    # large_list branch was chosen — proving no silent int32 wrap).
    big_lens = np.array([0x7FFFFFFF, 10], dtype=np.int64)
    wide = ListData(np.ones(2, bool), big_lens, elem, logical="list<int64>")
    with pytest.raises(Exception) as ei:
        to_arrow(wide)
    # the failure must come from Arrow's length validation on the
    # LARGE_LIST constructor (or our explicit guard) — never a numpy
    # int32 cast (which would succeed silently with wrapped offsets)
    assert "Length" in str(ei.value) or "exceeds" in str(ei.value) or "length" in str(ei.value)

    wide_map = ListData(
        np.ones(2, bool), big_lens, elem, logical="map<string,int64>"
    )
    with pytest.raises(ValueError, match="int32 map offsets"):
        to_arrow(wide_map)
