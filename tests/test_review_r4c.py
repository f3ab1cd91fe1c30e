"""Round-4 third review batch: sidecar index CAS, contamination k/w
forwarding, z-order NaN spans, DATE/total_byte_size/V2-nested writer
fidelity, evolved-schema snapshot accounting, case-blind word tokens."""

from __future__ import annotations

import os

import pytest
import pyspark.sql.functions as F

pytestmark = pytest.mark.spark


def test_delete_sidecar_index_claim_never_clobbers(spark, tmp_path):
    """write_delete_file claims its index with an os.link CAS: a sidecar
    already holding the next index (a concurrent committer's) must be
    left intact and the new write lands on the following index."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    d = str(tmp_path / "enc")
    encode_table(pages_df(spark, 200, partitions=1), d, key_col="url", partitions=1).collect()
    n1 = mf.write_delete_file(d, 0, np.array([1, 2]), base_rows=200)
    first = os.path.join(mf.deletes_dir(d), n1)
    before = open(first, "rb").read()
    n2 = mf.write_delete_file(d, 0, np.array([3]), base_rows=200)
    assert n2 != n1
    assert open(first, "rb").read() == before  # loser never clobbered
    assert set(pq.read_table(os.path.join(mf.deletes_dir(d), n2)).column("pos").to_pylist()) == {3}
    assert mf.delete_positions(d, 0).tolist() == [1, 2, 3]


def test_contamination_forwards_k_w(spark):
    """contamination(k=, w=) must fingerprint BOTH sides with the given
    params — dropped forwarding silently scrubbed different docs."""
    from parquet_go_spark.ops.winnow import contamination

    text = "the quick brown fox jumps over the lazy dog again and again " * 3
    corpus = spark.createDataFrame([(1, text), (2, "completely unrelated words here")],
                                   "doc_id long, text string")
    bench = spark.createDataFrame([(9, text)], "doc_id long, text string")
    default_hits = contamination(corpus, bench).filter("doc_id = 1").first()["n_shared_fps"]
    wide = contamination(corpus, bench, k=12, w=32).filter("doc_id = 1").first()["n_shared_fps"]
    # identical text still matches at any (k, w), but the fingerprint
    # densities must differ — equal counts would mean k/w were ignored
    assert default_hits > 0 and wide > 0
    assert wide != default_hits, (wide, default_hits)


def test_zorder_layout_survives_nan_key(spark, tmp_path):
    """A NaN in one z-order key column must not collapse that dimension:
    pre-fix, span=NaN zeroed every row's scaled value and the layout
    degenerated to the other key only."""
    from parquet_go_spark.spark.decode_job import decode_table, surviving_partitions
    from parquet_go_spark.spark.encode_job import encode_table

    rows = [(i, float(i % 100), i % 50) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, price double, bucket long").withColumn(
        "price", F.when(F.col("id") == 3, float("nan")).otherwise(F.col("price"))
    )
    out = str(tmp_path / "z")
    encode_table(df, out, key_col=["price", "bucket"], layout="zorder", partitions=8).collect()
    # a narrow price range must prune partitions — impossible if the
    # price dimension collapsed to a single z-slab
    surv = surviving_partitions(out, [("price", ">=", 10.0), ("price", "<=", 20.0)])
    assert len(surv) < 8, surv
    got = decode_table(spark, out, prune=[("price", ">=", 10.0), ("price", "<=", 20.0)])
    want = df.filter("price >= 10.0 and price <= 20.0").count()
    assert got.filter("price >= 10.0 and price <= 20.0").count() == want


def test_write_parquet_date32_roundtrips_typed(tmp_path):
    """date32 columns must carry the DATE converted type — every reader
    (including this repo's own) otherwise sees plain int32."""
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.compat.parquet_writer import write_parquet

    days = [datetime.date(2020, 1, 1), None, datetime.date(2024, 6, 30)]
    t = pa.table({"d": pa.array(days, type=pa.date32())})
    buf = write_parquet(t)
    p = str(tmp_path / "d.parquet")
    open(p, "wb").write(buf)
    back = pq.read_table(p)
    assert pa.types.is_date32(back.column("d").type), back.schema
    assert back.column("d").to_pylist() == days
    assert [r[0] for r in duckdb.sql(f"SELECT d FROM read_parquet('{p}')").fetchall()] == days


def test_row_group_total_byte_size_is_uncompressed(tmp_path):
    """Parquet spec: RowGroup.total_byte_size = UNCOMPRESSED total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.compat.parquet_writer import write_parquet

    t = pa.table({"s": pa.array(["abcdefgh" * 64] * 2000)})  # compresses hard
    buf = write_parquet(t, compression="zstd")
    p = str(tmp_path / "c.parquet")
    open(p, "wb").write(buf)
    md = pq.ParquetFile(p).metadata
    rg = md.row_group(0)
    comp = sum(rg.column(i).total_compressed_size for i in range(rg.num_columns))
    uncomp = sum(rg.column(i).total_uncompressed_size for i in range(rg.num_columns))
    assert uncomp > comp  # zstd actually engaged
    assert rg.total_byte_size == uncomp, (rg.total_byte_size, uncomp, comp)


def test_write_parquet_v2_pages_cover_nested_columns(tmp_path):
    """page_version=2 must apply to NESTED leaves too (previously a
    silent V1 downgrade); pyarrow and DuckDB read the file back
    identically."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.compat.parquet_writer import write_parquet

    t = pa.table(
        {
            "flat": pa.array(range(50), type=pa.int64()),
            "lst": pa.array([[i, i + 1] if i % 7 else None for i in range(50)],
                            type=pa.list_(pa.int64())),
        }
    )
    buf = write_parquet(t, page_version=2, crc=True)
    p = str(tmp_path / "v2.parquet")
    open(p, "wb").write(buf)
    back = pq.read_table(p)
    assert back.column("lst").to_pylist() == t.column("lst").to_pylist()
    assert back.column("flat").to_pylist() == t.column("flat").to_pylist()
    dd = duckdb.sql(f"SELECT path_in_schema FROM parquet_metadata('{p}')").fetchall()
    assert len(dd) == 2
    n = duckdb.sql(f"SELECT lst FROM read_parquet('{p}')").fetchall()
    assert [r[0] for r in n] == t.column("lst").to_pylist()
    # this repo's own kernels read the V2 nested leaf identically
    from parquet_go_spark.compat.parquet_reader import read_field_arrow

    own = read_field_arrow(buf, "lst")
    assert own.to_pylist() == t.column("lst").to_pylist()


def test_snapshot_rows_count_evolved_partitions(spark, tmp_path):
    """Partitions that legally omit the table's first column (schema
    evolution) must still contribute their rows to snapshot.num_rows."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path / "enc")
    a = spark.createDataFrame([(i, f"t{i}") for i in range(100)], "a long, b string")
    encode_table(a, d, key_col="a", partitions=1).collect()
    mf.commit_snapshot(d, "encode")
    c = spark.createDataFrame([(f"x{i}", i * 2) for i in range(40)], "b string, c long")
    encode_table(c, d, key_col="b", partitions=1, append=True, evolve_schema=True).collect()
    snap = mf.commit_snapshot(d, "append")
    assert snap["num_rows"] == 140, snap["num_rows"]


def test_token_stats_counts_uppercase_words(spark):
    from parquet_go_spark.ops.text import token_stats

    df = spark.createDataFrame(
        [(1, "HELLO WORLD"), (2, "Hello World"), (3, "hello world")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_word_tokens for r in token_stats(df).collect()}
    assert got == {1: 2, 2: 2, 3: 2}, got
