"""Typed-object layer tests (reference ``floor`` package analogue):
dataclass reflection → schema, buffered writes, typed read-back."""

from __future__ import annotations

import dataclasses
import datetime
import decimal
from dataclasses import dataclass, field
from typing import Optional

import pytest
from pyspark.sql import types as T

from parquet_go_spark import floor
from parquet_go_spark.floor import FloorTypeError, Reader, Writer, schema_for

pytestmark = pytest.mark.spark


@dataclass
class Attr:
    key: str
    weight: float


@dataclass
class Page:
    url: str
    warc_ts: datetime.datetime
    html: bytes
    n_links: int
    score: Optional[float]
    tags: list[str]
    counters: dict[str, int]
    main_attr: Attr
    amount: decimal.Decimal
    fetched: datetime.date
    renamed: int = field(default=0, metadata={"parquet": "fetch_status"})


def _mk(i: int) -> Page:
    return Page(
        url=f"https://ex.com/{i}",
        warc_ts=datetime.datetime(2026, 3, 1, 12, 0, i % 60),
        html=f"<p>{i}</p>".encode(),
        n_links=i * 3,
        score=None if i % 5 == 0 else i / 7,
        tags=[f"t{i % 3}", f"t{i % 7}"],
        counters={"a": i, "b": i * 2},
        main_attr=Attr(key=f"k{i % 4}", weight=i / 3),
        amount=decimal.Decimal(i * 100) / decimal.Decimal(7),
        fetched=datetime.date(2026, 3, 1 + i % 28),
        renamed=i % 2,
    )


def test_schema_for_reflection():
    s = schema_for(Page)
    assert s["url"].dataType == T.StringType() and not s["url"].nullable
    assert s["warc_ts"].dataType == T.TimestampType()
    assert s["html"].dataType == T.BinaryType()
    assert s["n_links"].dataType == T.LongType()
    assert s["score"].dataType == T.DoubleType() and s["score"].nullable
    assert s["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert s["counters"].dataType == T.MapType(T.StringType(), T.LongType(), False)
    assert isinstance(s["main_attr"].dataType, T.StructType)
    assert s["amount"].dataType == T.DecimalType(38, 18)
    assert s["fetched"].dataType == T.DateType()
    # metadata rename (floor parquet:"..." tag analogue)
    assert "fetch_status" in s.fieldNames() and "renamed" not in s.fieldNames()


def test_schema_for_rejects_non_dataclass_and_bad_hints():
    with pytest.raises(FloorTypeError):
        schema_for(int)

    @dataclass
    class Bad:
        x: complex

    with pytest.raises(FloorTypeError):
        schema_for(Bad)


def test_write_read_roundtrip(spark, tmp_path):
    out = str(tmp_path / "floor_enc")
    objs = [_mk(i) for i in range(200)]
    with Writer(spark, out, cls=Page, key_col="url", partitions=3) as w:
        w.write_all(objs)
    assert w.close() == 200  # idempotent close returns total

    r = Reader(spark, out, cls=Page)
    got = sorted(r, key=lambda p: p.url)
    want = sorted(objs, key=lambda p: p.url)
    assert len(got) == 200
    for g, x in zip(got, want):
        assert isinstance(g, Page) and isinstance(g.main_attr, Attr)
        assert g.url == x.url
        assert g.warc_ts == x.warc_ts
        assert g.html == x.html
        assert g.score == x.score
        assert g.tags == x.tags
        assert g.counters == x.counters
        assert g.main_attr == x.main_attr
        assert g.fetched == x.fetched
        # decimal survives at declared (38,18) precision
        assert g.amount == x.amount.quantize(decimal.Decimal(1).scaleb(-18))
        assert g.renamed == x.renamed


def test_batched_writes_append_versions(spark, tmp_path):
    from parquet_go_spark.spark import manifest as mf

    out = str(tmp_path / "floor_batches")
    w = Writer(spark, out, cls=Attr, batch_rows=50, partitions=2)
    w.write_all(Attr(key=f"k{i}", weight=float(i)) for i in range(120))
    w.close()
    df = Reader(spark, out).dataframe()
    assert df.count() == 120
    # 120 rows at batch 50 → 3 flushes → 3 snapshots
    snaps = mf.read_snapshots(out)
    assert len([s for s in snaps if s["operation"].startswith("floor.")]) == 3


def test_writer_type_check_and_closed(spark, tmp_path):
    w = Writer(spark, str(tmp_path / "x"), cls=Attr)
    with pytest.raises(FloorTypeError):
        w.write({"key": "a", "weight": 1.0})
    w.write(Attr(key="a", weight=1.0))
    w.close()
    with pytest.raises(RuntimeError):
        w.write(Attr(key="b", weight=2.0))


def test_writer_with_message_schema_dicts(spark, tmp_path):
    out = str(tmp_path / "floor_msg")
    msg = (
        "message pages {\n"
        "  required binary url (STRING);\n"
        "  optional int32 hits (INT(32, true));\n"
        "}\n"
    )
    with Writer(spark, out, message_schema=msg, partitions=1) as w:
        w.write_all({"url": f"u{i}", "hits": i} for i in range(10))
    rows = sorted(Reader(spark, out), key=lambda d: d["url"])
    assert rows[2] == {"url": "u2", "hits": 2}


def test_reader_projection_and_prune(spark, tmp_path):
    out = str(tmp_path / "floor_proj")
    with Writer(spark, out, cls=Attr, key_col="key", partitions=2) as w:
        w.write_all(Attr(key=f"k{i}", weight=float(i)) for i in range(40))
    df = Reader(spark, out, columns=["key"]).dataframe()
    assert df.columns == ["key"]
    pruned = Reader(spark, out, prune=[("key", "==", "k7")]).dataframe()
    assert {r["key"] for r in pruned.collect()} >= {"k7"}
