"""Dictionary-page filtering (compat/dict_filter.py): when
encoding_stats prove a chunk fully dictionary-encoded, the dict page is
its exact distinct set — an ==/IN miss excludes the row group with no
false-positive rate (parquet-mr DictionaryFilter semantics). Statistics
alone can never exclude a categorical value inside the [min, max] range,
which is exactly the case these tests pin."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_spark.compat.dict_filter import (
    all_data_pages_dict,
    dict_probe_file,
)
from parquet_go_spark.compat.parquet_reader import file_meta
from parquet_go_spark.compat.parquet_writer import write_parquet
from parquet_go_spark.spark.parquet_source import plan_scan_tasks


@pytest.fixture(scope="module")
def cat_table():
    return pa.table(
        {
            "lang": pa.array(["en", "de", "fr", "en"] * 5000),
            "k": pa.array(range(20_000), type=pa.int64()),
        }
    )


@pytest.fixture(scope="module")
def pa_path(cat_table, tmp_path_factory):
    p = tmp_path_factory.mktemp("dictf") / "pa.parquet"
    buf = io.BytesIO()
    pq.write_table(cat_table, buf, compression="snappy", row_group_size=10_000)
    p.write_bytes(buf.getvalue())
    return str(p)


@pytest.fixture(scope="module")
def our_path(cat_table, tmp_path_factory):
    p = tmp_path_factory.mktemp("dictf") / "ours.parquet"
    p.write_bytes(
        write_parquet(cat_table, compression="snappy", max_row_group=10_000)
    )
    return str(p)


@pytest.mark.parametrize("which", ["pa_path", "our_path"])
def test_absent_value_inside_stats_range_excluded(which, request):
    """'eo' sorts inside [de, fr] so min/max keep every group; only the
    dictionary can prove absence."""
    path = request.getfixturevalue(which)
    assert plan_scan_tasks([path], [("lang", "==", "eo")]) == []
    assert len(plan_scan_tasks([path], [("lang", "==", "de")])) == 2
    assert len(plan_scan_tasks([path], [("lang", "in", ("eo", "de"))])) == 2
    assert plan_scan_tasks([path], [("lang", "in", ("eo", "es"))]) == []


def test_int_dictionary_probe(tmp_path):
    t = pa.table({"code": pa.array([10, 20, 30, 20] * 5000, type=pa.int64())})
    p = tmp_path / "ints.parquet"
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=10_000)
    p.write_bytes(buf.getvalue())
    # 25 is inside [10, 30] — stats keep, dictionary excludes
    assert plan_scan_tasks([str(p)], [("code", "==", 25)]) == []
    assert len(plan_scan_tasks([str(p)], [("code", "==", 20)])) == 2


def test_plain_fallback_stays_conservative(tmp_path):
    """High-cardinality column overflows the dictionary mid-chunk →
    encoding_stats show PLAIN data pages → the dictionary no longer
    covers the chunk and must not exclude anything."""
    t = pa.table({"s": pa.array([f"u{i:07d}" for i in range(300_000)])})
    p = tmp_path / "fb.parquet"
    buf = io.BytesIO()
    pq.write_table(t, buf, row_group_size=300_000)
    p.write_bytes(buf.getvalue())
    md = file_meta(p.read_bytes())[4][0][1][0][3]
    assert not all_data_pages_dict(md)
    assert len(plan_scan_tasks([str(p)], [("s", "==", "u0150000")])) == 1
    # probe itself reports inconclusive -> might contain
    assert dict_probe_file(str(p), md, ("definitely-absent",)) is True


def test_missing_encoding_stats_keeps(our_path):
    md = file_meta(open(our_path, "rb").read())[4][0][1][0][3]
    stripped = {k: v for k, v in md.items() if k != 13}
    assert all_data_pages_dict(stripped) is False
    assert dict_probe_file(our_path, stripped, ("eo",)) is True


def test_forged_dict_header_keeps_not_crashes(our_path):
    md = dict(file_meta(open(our_path, "rb").read())[4][0][1][0][3])
    md[11] = md[9] - 4  # point into the tail of the data region
    assert dict_probe_file(our_path, md, ("eo",)) is True


def test_scan_exact_after_dict_prune(spark, pa_path, cat_table):
    from parquet_go_spark.spark.parquet_source import read_parquet_table

    df = read_parquet_table(spark, pa_path, prune=[("lang", "==", "de")])
    assert df.where("lang = 'de'").count() == 5000
    empty = read_parquet_table(spark, pa_path, prune=[("lang", "==", "eo")])
    assert empty.count() == 0
