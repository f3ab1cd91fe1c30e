"""Key-value metadata parity: file-level KV (reference ``WithMetaData``,
``file_writer.go:99-103``), per-column-chunk KV (reference
``WithRowGroupMetaDataForColumnPath``, ``file_writer.go:196-226``,
sorted emission ``chunk_writer.go:279-281``), and the native table's
Iceberg-style table properties (metadata-only snapshots, time-travelable)."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.parquet_reader import (
    column_kv_metadata,
    file_kv_metadata,
    file_meta,
    read_table_arrow,
)
from parquet_go_spark.compat.parquet_writer import write_parquet


def _table():
    return pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array(["a", "b", None], pa.string()),
            "tags": pa.array([["x"], [], None], pa.list_(pa.string())),
        }
    )


def test_file_kv_roundtrip_and_pyarrow_reads_it():
    buf = write_parquet(_table(), kv_metadata={"writer": "pgs", "job": "r2"})
    meta = file_meta(buf)
    assert file_kv_metadata(meta) == {"writer": "pgs", "job": "r2"}
    # a foreign engine sees the same map
    pf = pq.ParquetFile(io.BytesIO(buf))
    got = {k.decode(): v.decode() for k, v in (pf.metadata.metadata or {}).items()}
    assert got == {"writer": "pgs", "job": "r2"}
    # data unaffected
    assert read_table_arrow(buf).num_rows == 3


def test_column_kv_per_chunk_and_multi_row_group():
    buf = write_parquet(
        _table(),
        max_row_group=2,
        column_kv={"k": {"codec-hint": "delta", "origin": "crawl"}},
    )
    meta = file_meta(buf)
    for rg in range(len(meta[4])):
        assert column_kv_metadata(meta, "k", row_group=rg) == {
            "codec-hint": "delta",
            "origin": "crawl",
        }
        assert column_kv_metadata(meta, "v", row_group=rg) == {}
    # pyarrow still reads the file (unknown-to-it KV is inert)
    assert pq.read_table(io.BytesIO(buf)).num_rows == 3


def test_column_kv_nested_leaves_inherit():
    buf = write_parquet(_table(), column_kv={"tags": {"lang": "en"}})
    meta = file_meta(buf)
    # the nested column's leaf path (tags.list.element) answers for the root
    assert column_kv_metadata(meta, "tags") == {"lang": "en"}


def test_column_kv_unknown_column_raises():
    with pytest.raises(ValueError, match="unknown"):
        write_parquet(_table(), column_kv={"nope": {"a": "b"}})


def test_file_kv_reads_pyarrow_written_metadata():
    sink = io.BytesIO()
    pq.write_table(
        pa.table({"x": [1, 2]}), sink, compression="none"
    )
    # rewrite with custom metadata
    t = pa.table({"x": [1, 2]}).replace_schema_metadata({"source": "cc-main"})
    sink = io.BytesIO()
    pq.write_table(t, sink, compression="none")
    kv = file_kv_metadata(file_meta(sink.getvalue()))
    assert kv.get("source") == "cc-main"


@pytest.mark.spark
def test_table_properties_set_unset_and_time_travel(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    out = str(tmp_path / "enc")
    encode_table(pages_df(spark, 200, partitions=1), out, partitions=2).collect()
    base = mf.commit_snapshot(out, "append")
    assert mf.table_properties(out) == {}

    s1 = mf.set_table_properties(out, {"retention.days": "30", "owner": "crawl"})
    assert mf.table_properties(out) == {"retention.days": "30", "owner": "crawl"}
    s2 = mf.set_table_properties(out, {"owner": None, "retention.days": "7"})
    assert mf.table_properties(out) == {"retention.days": "7"}

    # time travel: each version answers with the map current then
    assert mf.table_properties(out, as_of=base["seq"]) == {}
    assert mf.table_properties(out, as_of=s1["seq"]) == {
        "retention.days": "30",
        "owner": "crawl",
    }
    assert mf.table_properties(out, as_of=s2["seq"]) == {"retention.days": "7"}
    # properties snapshots are metadata-only: table still decodes
    from parquet_go_spark.spark.decode_job import decode_table

    assert decode_table(spark, out).count() == 200


def test_properties_cli(tmp_path, capsys):
    import json

    from parquet_go_spark import cli
    from parquet_go_spark.spark import manifest as mf
    import os

    out = str(tmp_path / "enc")
    os.makedirs(mf.snapshot_dir(out), exist_ok=True)
    mf.commit_snapshot(out, "append")
    assert cli.main(["properties", "--enc", out, "--set", "a=1", "--set", "b=2"]) == 0
    assert cli.main(["properties", "--enc", out, "--unset", "b"]) == 0
    assert cli.main(["properties", "--enc", out]) == 0
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(last) == {"a": "1"}


def test_creator_and_file_version():
    """WithCreator / FileVersion analogues land in the footer and a
    foreign engine reports them."""
    buf = write_parquet(_table(), creator="crawl-encoder 2.0", file_version=2)
    meta = file_meta(buf)
    assert meta[1] == 2
    assert meta[6].decode() == "crawl-encoder 2.0"
    pf = pq.ParquetFile(io.BytesIO(buf))
    assert pf.metadata.created_by == "crawl-encoder 2.0"
    assert read_table_arrow(buf).num_rows == 3
