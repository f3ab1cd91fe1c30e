"""Distributed real-Parquet sink: output readable by Spark's native
Parquet reader and by DuckDB, with manifest/resume intact."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from parquet_go_spark.spark import manifest as mf
from parquet_go_spark.spark.pages_table import pages_df
from parquet_go_spark.spark.parquet_sink import encode_table_parquet

pytestmark = pytest.mark.spark


def test_parquet_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "pq_out")
    df = pages_df(spark, 2000, partitions=3)
    man = encode_table_parquet(df, out, key_col="url", partitions=4, compression="snappy").collect()
    assert {r["column"] for r in man} == {"url", "warc_ts", "html", "text", "lang"}
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert files
    # Spark's own reader consumes our files
    back = spark.read.parquet(*files)
    a = df.orderBy("url").toPandas()
    b = back.select(df.columns).orderBy("url").toPandas()
    assert a.equals(b)
    # DuckDB consumes them too
    con = duckdb.connect()
    n, langs = con.sql(
        f"SELECT count(*), count(DISTINCT lang) FROM read_parquet('{out}/part-*.parquet')"
    ).fetchone()
    assert n == 2000
    assert langs == df.select("lang").distinct().count()


def test_parquet_sink_resume(spark, tmp_path):
    out = str(tmp_path / "pq_resume")
    df = pages_df(spark, 1000, partitions=2)
    encode_table_parquet(df, out, key_col="url", partitions=3).collect()
    files1 = {p: os.path.getmtime(p) for p in glob.glob(f"{out}/part-*.parquet")}
    victim = sorted(mf.committed_partitions(out))[0]
    os.remove(mf.part_manifest_path(out, victim))
    encode_table_parquet(df, out, key_col="url", partitions=3).collect()
    files2 = {p: os.path.getmtime(p) for p in glob.glob(f"{out}/part-*.parquet")}
    untouched = [p for p in files1 if f"part-{victim:05d}" not in p]
    for p in untouched:
        assert files1[p] == files2[p]
