"""Equality deletes (Iceberg v2 equality delete files): delete by key
VALUE with zero data scan at write time — the apply set is scoped by
manifest stats/blooms and pinned to partitions committed so far, so
later appends of the same key survive (sequence semantics)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def _docs(spark, n=600):
    from parquet_go_spark.spark.pages_table import pages_df

    return pages_df(spark, n, partitions=1).withColumn(
        "doc_id", (F.abs(F.xxhash64("url")) % 1000000).cast("bigint")
    )


def _encode(spark, df, d, **kw):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    encode_table(df, d, **kw).collect()
    return mf.commit_snapshot(d, "encode")


def test_eq_delete_is_metadata_only_and_applies_on_read(spark, tmp_path):
    import os

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_keys

    df = _docs(spark)
    d = str(tmp_path / "enc")
    _encode(spark, df, d, key_col="url", partitions=4, bloom_columns=["url"])
    victims = [r[0] for r in df.select("url").limit(3).collect()]
    before = {p: os.path.getmtime(os.path.join(d, f"part-{p:05d}.bin")) for p in range(4)}
    res = delete_keys(d, "url", victims)
    # bloom-scoped: a 3-key point delete applies to few partitions
    assert 1 <= res["candidates"] <= 3
    assert res["file"] is not None
    # nothing was read or written besides the sidecar + snapshot
    after = {p: os.path.getmtime(os.path.join(d, f"part-{p:05d}.bin")) for p in range(4)}
    assert after == before
    got = decode_table(spark, d)
    assert got.filter(F.col("url").isin(victims)).count() == 0
    assert got.count() == 600 - 3
    # projection that does NOT select the key column still applies it
    langs = decode_table(spark, d, columns=["lang"])
    assert langs.count() == 600 - 3
    assert langs.columns == ["lang"]
    spec = mf.read_eq_delete_file(d, res["file"])
    assert spec["column"] == "url" and sorted(spec["values"]) == sorted(victims)


def test_eq_delete_sequencing_reinserted_keys_survive(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.maintenance import delete_keys

    df = _docs(spark, 400)
    d = str(tmp_path / "enc")
    snap0 = _encode(spark, df, d, key_col="url", partitions=3)
    victims = [r[0] for r in df.select("url").limit(5).collect()]
    res = delete_keys(d, "url", victims)
    # re-insert two of the deleted keys via a normal append
    reinsert = df.filter(F.col("url").isin(victims[:2])).withColumn("lang", F.lit("re"))
    encode_table(reinsert, d, key_col="url", partitions=1, append=True).collect()
    mf.commit_snapshot(d, "append")
    got = decode_table(spark, d)
    # the delete applies only to partitions committed BEFORE it: the
    # re-inserted rows survive, the originals stay deleted
    assert got.count() == 400 - 5 + 2
    back = got.filter(F.col("url").isin(victims))
    assert back.count() == 2
    assert {r["lang"] for r in back.collect()} == {"re"}
    # time travel: before the delete every row exists
    assert decode_table(spark, d, as_of=snap0["seq"]).count() == 400
    # the format("pgs") front door agrees
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    assert spark.read.format("pgs").load(d).count() == 400 - 5 + 2
    assert (
        spark.read.format("pgs").option("as_of", snap0["seq"]).load(d).count() == 400
    )
    assert decode_table(spark, d, as_of=res["snapshot"]).count() == 400 - 5


def test_eq_delete_materializes_and_survives_rewrites(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import compact_table, delete_keys, delete_where

    df = _docs(spark, 500)
    d = str(tmp_path / "enc")
    _encode(spark, df, d, key_col="url", partitions=4)
    victims = [r[0] for r in df.select("url").limit(4).collect()]
    delete_keys(d, "url", victims)
    # an unrelated COW delete rewrites some partitions in place —
    # value-based sidecars stay valid (idempotent re-filter)
    n_en = df.filter((F.col("lang") == "en") & (~F.col("url").isin(victims))).count()
    delete_where(spark, d, [("lang", "==", "en")], mode="cow")
    got = decode_table(spark, d)
    assert got.count() == 500 - 4 - n_en
    assert got.filter(F.col("url").isin(victims)).count() == 0
    # compaction materializes equality deletes into the new table
    dst = str(tmp_path / "dst")
    compact_table(spark, d, dst, partitions=2)
    assert decode_table(spark, dst).count() == 500 - 4 - n_en
    assert mf.list_eq_delete_files(dst) == []


def test_rollback_undoes_eq_deletes(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import delete_keys, rollback_table

    df = _docs(spark, 300)
    d = str(tmp_path / "enc")
    snap0 = _encode(spark, df, d, key_col="url", partitions=2)
    delete_keys(d, "url", [r[0] for r in df.select("url").limit(2).collect()])
    assert decode_table(spark, d).count() == 298
    rollback_table(d, snap0["seq"])
    assert mf.list_eq_delete_files(d) == []
    assert decode_table(spark, d).count() == 300


def test_merge_into_eq_is_zero_read(spark, tmp_path):
    import os

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.maintenance import merge_into

    df = _docs(spark, 400)
    d = str(tmp_path / "enc")
    snap0 = _encode(spark, df, d, key_col="url", partitions=4, bloom_columns=["url"])
    before = {p: os.path.getmtime(os.path.join(d, f"part-{p:05d}.bin")) for p in range(4)}
    src = df.limit(30).withColumn("lang", F.lit("up"))
    res = merge_into(spark, d, src, key="url", mode="eq")
    # no base partition was opened for writing: merge cost = append cost
    after = {p: os.path.getmtime(os.path.join(d, f"part-{p:05d}.bin")) for p in range(4)}
    assert after == before
    assert res["rows_replaced"] is None  # unknowable without a scan
    got = decode_table(spark, d)
    assert got.count() == 400
    assert got.filter(F.col("lang") == "up").count() == 30
    # history intact: eq merge never rewrites
    assert decode_table(spark, d, as_of=snap0["seq"]).count() == 400
    assert decode_table(spark, d, as_of=snap0["seq"]).filter(F.col("lang") == "up").count() == 0
    assert len(mf.list_eq_delete_files(d)) == 1
