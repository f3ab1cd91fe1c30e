"""Schema evolution on append (Iceberg add-column semantics): appended
batches may add or omit columns; decode null-fills whichever side lacks
the column, while a chunk that the manifest says exists but the file
lacks still errors (corruption, not evolution)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _base(spark, rows=300):
    from parquet_go_spark.spark.pages_table import pages_df

    return pages_df(spark, rows, partitions=1)


def test_append_adds_column_old_partitions_null_fill(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path / "enc")
    df = _base(spark)
    encode_table(df, d, key_col="url", partitions=3).collect()
    mf.commit_snapshot(d, "encode")
    df2 = _base(spark, 100).withColumn(
        "url", F.concat(F.lit("https://b/"), F.col("url"))
    ).withColumn("score", F.length(F.coalesce("text", F.lit(""))).cast("double"))
    with pytest.raises(ValueError, match="schema mismatch"):
        encode_table(df2, d, key_col="url", partitions=3, append=True).collect()
    encode_table(df2, d, key_col="url", partitions=3, append=True, evolve_schema=True).collect()
    mf.commit_snapshot(d, "append")
    # table schema is the union, new column last
    assert [f["name"] for f in mf.read_table_schema(d)][-1] == "score"
    got = decode_table(spark, d)
    assert got.count() == 400
    assert got.filter(F.col("score").isNull()).count() == 300  # old partitions
    news = got.filter(F.col("url").startswith("https://b/"))
    assert news.filter(F.col("score").isNull()).count() == 0
    assert (
        news.filter(
            F.col("score") == F.length(F.coalesce("text", F.lit(""))).cast("double")
        ).count()
        == 100
    )
    # projection of ONLY the evolved column still row-counts correctly
    assert decode_table(spark, d, columns=["score"]).count() == 400


def test_append_may_omit_columns(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path / "enc")
    df = _base(spark)
    encode_table(df, d, key_col="url", partitions=3).collect()
    mf.commit_snapshot(d, "encode")
    df2 = _base(spark, 100).withColumn(
        "url", F.concat(F.lit("https://b/"), F.col("url"))
    ).drop("html")
    encode_table(df2, d, key_col="url", partitions=3, append=True, evolve_schema=True).collect()
    got = decode_table(spark, d)
    assert got.count() == 400
    news = got.filter(F.col("url").startswith("https://b/"))
    assert news.count() == 100 and news.filter(F.col("html").isNull()).count() == 100
    # schema order unchanged (no new columns)
    assert [f["name"] for f in mf.read_table_schema(d)] == df.columns


def test_evolution_cannot_change_types(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path / "enc")
    df = _base(spark, 60)
    encode_table(df, d, partitions=2).collect()
    mf.commit_snapshot(d, "encode")
    with pytest.raises(ValueError, match="cannot change column"):
        encode_table(
            df.withColumn("lang", F.lit(7)), d, partitions=2, append=True, evolve_schema=True
        ).collect()


def test_missing_chunk_with_manifest_row_is_corruption(spark, tmp_path):
    """The evolution null-fill must NOT mask a lost chunk."""
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import (
        encode_table,
        parse_partition_file,
        write_partition_file,
    )

    d = str(tmp_path / "enc")
    encode_table(_base(spark, 60), d, partitions=1).collect()
    path = f"{d}/part-00000.bin"
    blobs = parse_partition_file(open(path, "rb").read())
    kept = [(n, bytes(b)) for n, b in blobs.items() if n != "lang"]
    write_partition_file(path, kept)  # drop lang's chunk, keep its manifest row
    with pytest.raises(Exception, match="manifest but missing"):
        decode_table(spark, d).count()


def test_datasource_evolve_option_and_read(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    d = str(tmp_path / "enc")
    df = _base(spark, 200)
    df.repartition(2).write.format("pgs").mode("append").save(d)
    df2 = df.withColumn("url", F.concat(F.lit("https://b/"), F.col("url"))).withColumn(
        "stars", F.lit(5)
    )
    with pytest.raises(Exception, match="schema mismatch"):
        df2.repartition(2).write.format("pgs").mode("append").save(d)
    (
        df2.repartition(2)
        .write.format("pgs")
        .mode("append")
        .option("evolve_schema", "true")
        .save(d)
    )
    t = spark.read.format("pgs").load(d)
    assert "stars" in t.columns
    assert t.count() == 400
    assert t.filter(F.col("stars").isNull()).count() == 200
    assert t.filter(F.col("stars") == 5).count() == 200
    snaps = mf.read_snapshots(d)
    assert [s["seq"] for s in snaps] == [0, 1]
