"""Torture tests for Spark's JAVA Arrow layouts through the encode path.

The round-5 verify drive found a live-only crash: Spark's Java Arrow
writer emits a ZERO-byte offsets buffer for a length-0 string child of
an all-empty list column — a layout the Arrow spec allows but pyarrow's
constructors never produce, so pyarrow-built pytest fixtures can't see
it. This file closes that class of gap: every supported column type is
round-tripped through encode_table/decode_table with MORE PARTITIONS
THAN ROWS, so every job carries empty partitions and the kernels see
exactly the buffers Spark's serializer hands a 1000-executor cluster
(where empty/skewed partitions are the norm, not the exception).

Reference parity: the reference writer handles empty row groups and
all-null chunks in its own golden tests (parquet-go's
file_writer_test.go / column_test.go); these are the Spark-shaped
equivalents.
"""

from __future__ import annotations

import datetime
import decimal
import tempfile

import pytest
from pyspark.sql import Row, functions as F, types as T

from parquet_go_spark.spark.decode_job import decode_table
from parquet_go_spark.spark.encode_job import encode_table


def _roundtrip(spark, df, key="k", partitions=16):
    out = tempfile.mkdtemp() + "/enc"
    encode_table(df, out, key_col=key, partitions=partitions).collect()
    back = decode_table(spark, out)
    return back


def _rows_sorted(df, key="k"):
    return [r.asDict(recursive=True) for r in df.orderBy(key).collect()]


def test_all_types_with_empty_partitions(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("s", T.StringType(), True),
            T.StructField("b", T.BinaryType(), True),
            T.StructField("i", T.IntegerType(), True),
            T.StructField("d", T.DoubleType(), True),
            T.StructField("fl", T.FloatType(), True),
            T.StructField("bo", T.BooleanType(), True),
            T.StructField("dec", T.DecimalType(7, 2), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("dt", T.DateType(), True),
            T.StructField("ls", T.ArrayType(T.StringType()), True),
            T.StructField("li", T.ArrayType(T.LongType()), True),
            T.StructField("ll", T.ArrayType(T.ArrayType(T.StringType())), True),
            T.StructField(
                "st",
                T.StructType(
                    [
                        T.StructField("a", T.StringType(), True),
                        T.StructField("n", T.LongType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("mp", T.MapType(T.StringType(), T.LongType()), True),
        ]
    )
    ts = datetime.datetime(2024, 5, 17, 12, 30, 45, 123456)
    dt = datetime.date(2024, 5, 17)
    rows = [
        (
            1,
            "hello",
            b"\x00\xff",
            7,
            1.5,
            2.5,
            True,
            decimal.Decimal("12345.67"),
            ts,
            dt,
            ["x", "y"],
            [1, 2, 3],
            [["a"], [], ["b", "c"]],
            Row(a="in", n=9),
            {"k1": 1},
        ),
        (2, None, None, None, None, None, None, None, None, None, None, None, None, None, None),
        (3, "", b"", 0, 0.0, 0.0, False, decimal.Decimal("0.00"), ts, dt, [], [], [], Row(a=None, n=None), {}),
        (4, "mixed", b"z", -1, -2.5, -3.5, True, decimal.Decimal("-1.25"), ts, dt, [None, "q"], [None, 5], [None, ["w"]], Row(a="", n=0), {"": 0}),
    ]
    df = spark.createDataFrame(rows, schema)
    back = _roundtrip(spark, df, partitions=16)
    assert _rows_sorted(back) == _rows_sorted(df)


@pytest.mark.parametrize(
    "ddl,vals",
    [
        ("a array<string>", [([],), ([],), ([],)]),
        ("a array<binary>", [([],), ([],)]),
        ("a array<array<string>>", [([],), ([[]],)]),
        ("a array<struct<x:string>>", [([],), ([],)]),
        ("a map<string,string>", [({},), ({},)]),
        ("a string", [(None,), (None,), (None,)]),
        ("a array<string>", [(None,), (None,)]),
        ("a struct<x:string,y:array<string>>", [(None,), (None,)]),
    ],
)
def test_empty_and_allnull_nested_shapes(spark, ddl, vals):
    """All-empty / all-null nested columns across empty partitions: the
    Java serializer emits minimal (sometimes zero-byte) child buffers for
    these, and every leaf kernel must treat them as valid length-0
    streams."""
    rows = [(i, *v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, f"k long, {ddl}")
    back = _roundtrip(spark, df, partitions=8)
    assert _rows_sorted(back) == _rows_sorted(df)


def test_zero_row_dataframe_many_partitions(spark):
    df = spark.createDataFrame(
        [], "k long, s string, ls array<string>, st struct<a:string>, mp map<string,long>"
    ).repartition(8)
    out = tempfile.mkdtemp() + "/enc"
    encode_table(df, out, key_col="k", partitions=8).collect()
    back = decode_table(spark, out)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["k", "s", "ls", "st", "mp"]


def test_skewed_single_partition_payload(spark):
    """One partition carries every row, the rest are empty — the shape a
    hot key produces after a key-partitioned shuffle."""
    df = spark.createDataFrame(
        [(i, "txt %d" % i, ["t"] * (i % 3)) for i in range(50)],
        "k long, s string, ls array<string>",
    ).repartition(16, F.lit(1))
    back = _roundtrip(spark, df, partitions=16)
    assert _rows_sorted(back) == _rows_sorted(df)


def test_parquet_sink_all_empty_nested(spark):
    """Same Java empty-offsets layouts through the REAL-Parquet shredding
    sink (compat/shred.py _list_parts had the identical flatten hazard):
    the written files must read back identically in pyarrow."""
    import glob

    import pyarrow.parquet as pq

    from parquet_go_spark.spark.parquet_sink import encode_table_parquet

    df = spark.createDataFrame(
        [
            (1, [["a"], []], {"k": 1}, ["x"]),
            (2, None, None, None),
            (3, [], {}, []),
        ],
        "k long, ll array<array<string>>, mp map<string,long>, ls array<string>",
    )
    out = tempfile.mkdtemp() + "/pq"
    encode_table_parquet(df, out, key_col="k", partitions=8).collect()
    files = sorted(glob.glob(out + "/*.parquet"))
    got = sorted(
        (r for f in files for r in pq.read_table(f).to_pylist()),
        key=lambda r: r["k"],
    )
    want = _rows_sorted(df)
    for g, w in zip(got, want):
        assert g["k"] == w["k"] and g["ll"] == w["ll"] and g["ls"] == w["ls"]
        assert (dict(g["mp"]) if g["mp"] is not None else None) == w["mp"]
