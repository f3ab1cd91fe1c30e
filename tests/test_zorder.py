"""Z-order layout: multi-column clustering so min/max stats prune on ANY
key column (a plain range layout only serves its leading key)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _grid(spark, n=4000):
    """Two independent uniform dimensions — the adversarial case for a
    single-key layout."""
    return (
        spark.range(n)
        .withColumn("x", (F.abs(F.xxhash64("id")) % 1000).cast("bigint"))
        .withColumn("y", (F.abs(F.xxhash64("id", F.lit(7))) % 1000).cast("bigint"))
        .withColumn("payload", F.concat(F.lit("row-"), F.col("id")))
    )


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table, surviving_partitions
    from parquet_go_spark.spark.encode_job import encode_table

    df = _grid(spark)
    zd = str(tmp_path / "zorder")
    rd = str(tmp_path / "range")
    encode_table(df, zd, key_col=["x", "y"], layout="zorder", partitions=16).collect()
    encode_table(df, rd, key_col="x", layout="range", partitions=16).collect()

    q_x = [("x", ">=", 0), ("x", "<=", 99)]
    q_y = [("y", ">=", 0), ("y", "<=", 99)]
    # range layout: perfect on its own key, useless on the other
    assert len(surviving_partitions(rd, q_x)) <= 3
    assert len(surviving_partitions(rd, q_y)) == 16
    # zorder: prunes substantially on EITHER dimension
    assert len(surviving_partitions(zd, q_x)) <= 8
    assert len(surviving_partitions(zd, q_y)) <= 8

    # correctness: pruning never drops a matching row
    for d in (zd, rd):
        got = decode_table(spark, d, prune=q_y).filter(F.col("y") <= 99).count()
        assert got == df.filter(F.col("y") <= 99).count()


def test_zorder_roundtrip_content(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    df = _grid(spark, 1000)
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col=["x", "y"], layout="zorder", partitions=4).collect()
    got = decode_table(spark, d)
    assert got.count() == 1000
    a = sorted(r["payload"] for r in df.select("payload").collect())
    b = sorted(r["payload"] for r in got.select("payload").collect())
    assert a == b


def test_zorder_timestamp_key(spark, tmp_path):
    """Temporal keys (timestamp/timestamp_ntz/date) need the epoch-long
    normalization — Spark 4 refuses a direct cast to double."""
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    df = pages_df(spark, 800, partitions=1).withColumn(
        "k2", (F.abs(F.xxhash64("url")) % 1000).cast("bigint")
    )
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col=["warc_ts", "k2"], layout="zorder", partitions=4).collect()
    assert decode_table(spark, d).count() == 800


def test_zorder_handles_nulls_and_validates_keys(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    df = _grid(spark, 500).withColumn(
        "x", F.when(F.col("id") % 10 == 0, None).otherwise(F.col("x"))
    )
    d = str(tmp_path / "enc")
    encode_table(df, d, key_col=["x", "y"], layout="zorder", partitions=4).collect()
    assert decode_table(spark, d).filter(F.col("x").isNull()).count() == 50

    with pytest.raises(ValueError, match="two or more"):
        encode_table(df, str(tmp_path / "e1"), key_col="x", layout="zorder")
    with pytest.raises(ValueError, match="numeric/timestamp"):
        encode_table(df, str(tmp_path / "e2"), key_col=["x", "payload"], layout="zorder")
