"""`spark.read.format("pgs")` — the Python DataSource front door
(Spark 4.x pyspark.sql.datasource) with catalyst filter pushdown into
manifest/bloom/page pruning."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture()
def enc_dir(spark, tmp_path):
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    out = str(tmp_path / "enc_ds")
    df = pages_df(spark, 1200, partitions=2)
    encode_table(
        df,
        out,
        key_col="url",
        partitions=4,
        sort_within="warc_ts",
        page_stats=True,
        max_page=4096,
        bloom_columns=["url"],
        compression="snappy",
    ).collect()
    return out


def test_read_format_pgs_full_scan(spark, enc_dir):
    from parquet_go_spark.spark.datasource import PGSDataSource
    from parquet_go_spark.spark.decode_job import decode_table

    spark.dataSource.register(PGSDataSource)
    df = spark.read.format("pgs").load(enc_dir)
    want = decode_table(spark, enc_dir)
    assert df.count() == want.count() == 1200
    assert dict(df.dtypes) == dict(want.dtypes)
    # spot-check full row equality on a stable key
    a = {r["url"]: r["lang"] for r in df.select("url", "lang").collect()}
    b = {r["url"]: r["lang"] for r in want.select("url", "lang").collect()}
    assert a == b


def test_pushed_equality_filter_prunes_and_stays_exact(spark, enc_dir):
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    df = spark.read.format("pgs").load(enc_dir)
    target = df.select("url").collect()[77]["url"]
    got = df.where(df.url == target).collect()
    # exactness: Spark re-applies the filter on top of the pruned scan
    assert len(got) == 1 and got[0]["url"] == target
    # absent key: bloom filters prove absence in every partition
    assert df.where(df.url == "https://never.example/x").count() == 0


def test_pushed_range_filter_correct(spark, enc_dir):
    import pyspark.sql.functions as F

    from parquet_go_spark.spark.datasource import PGSDataSource
    from parquet_go_spark.spark.decode_job import decode_table

    spark.dataSource.register(PGSDataSource)
    df = spark.read.format("pgs").load(enc_dir)
    full = decode_table(spark, enc_dir).toPandas()
    cut = sorted(full["url"])[len(full) * 4 // 5]
    got = df.where(F.col("url") >= cut).count()
    want = int((full["url"] >= cut).sum())
    assert got == want
    got_lang = df.where(F.col("lang") == "en").count()
    assert got_lang == int((full["lang"] == "en").sum())


def test_filter_translation_rules():
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThanOrEqual

    from parquet_go_spark.spark.datasource import _filter_to_prune

    assert _filter_to_prune(EqualTo(("url",), "x")) == ("url", "==", "x")
    assert _filter_to_prune(GreaterThan(("n",), 5)) == ("n", ">=", 5)
    assert _filter_to_prune(LessThanOrEqual(("n",), 5)) == ("n", "<=", 5)
    # nested paths and non-literal-friendly values are not pruned
    assert _filter_to_prune(EqualTo(("a", "b"), 1)) is None
    assert _filter_to_prune(EqualTo(("flag",), True)) is None
