"""Schema-definition language tests (reference ``parquetschema`` analogue).

Covers: the seven reference fixture files (``parquetschema/schema-files``),
printer fixed point, strict vs lenient LIST/MAP validation
(``schema_parser_test.go`` error cases), logical-type checks, the Spark
bridge in both directions, and ``encode_table(message_schema=...)``
end-to-end.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import types as T

from parquet_go_spark.schematext import (
    Annotation,
    Message,
    SchemaTextError,
    message_from_spark,
    parse_message,
)

REF_SCHEMA_DIR = "/root/reference/parquetschema/schema-files"


# ---------------------------------------------------------------------------
# Reference fixture files
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(REF_SCHEMA_DIR), reason="reference not mounted")
def test_reference_fixture_files_parse_and_roundtrip():
    files = sorted(glob.glob(os.path.join(REF_SCHEMA_DIR, "*.schema")))
    assert len(files) == 7
    for path in files:
        with open(path) as fh:
            text = fh.read()
        msg = parse_message(text)
        # printer fixed point: parse(dumps(m)) == dumps-identical tree
        again = parse_message(msg.dumps())
        assert again.dumps() == msg.dumps(), path
        # every fixture maps to a Spark schema
        assert isinstance(msg.to_spark(), T.StructType), path


@pytest.mark.skipif(not os.path.isdir(REF_SCHEMA_DIR), reason="reference not mounted")
def test_reference_fixture_spark_shapes():
    def load(n):
        with open(os.path.join(REF_SCHEMA_DIR, f"test{n}.schema")) as fh:
            return parse_message(fh.read())

    # test1: required int64 foo
    s1 = load(1).to_spark()
    assert s1["foo"].dataType == T.LongType() and not s1["foo"].nullable

    # test2: strings, int64 ts, legacy MAP (key_value named group, MAP_KEY_VALUE)
    s2 = load(2).to_spark()
    assert s2["the_id"].dataType == T.StringType()
    assert s2["request_body"].dataType == T.BinaryType()
    assert s2["data_enriched"].dataType == T.MapType(T.BinaryType(), T.BinaryType(), False)
    assert s2["is_fraud"].dataType == T.BooleanType() and s2["is_fraud"].nullable

    # test3: LIST of required int64
    s3 = load(3).to_spark()
    assert s3["ids"].dataType == T.ArrayType(T.LongType(), containsNull=False)

    # test4: list<list<int32>>
    s4 = load(4).to_spark()
    assert s4["array_of_arrays"].dataType == T.ArrayType(
        T.ArrayType(T.IntegerType(), containsNull=False), containsNull=False
    )

    # test5: MAP int32->int32 via unnamed key_value group (lenient form)
    s5 = load(5).to_spark()
    assert s5["bar"].dataType == T.MapType(T.IntegerType(), T.IntegerType(), False)

    # test6: TIMESTAMP(NANOS, true) + DATE
    s6 = load(6).to_spark()
    assert s6["ts"].dataType == T.TimestampType()
    assert s6["date"].dataType == T.DateType()

    # test7: UUID FLBA(16) + optional binary
    s7 = load(7).to_spark()
    assert s7["theid"].dataType == T.BinaryType() and not s7["theid"].nullable
    assert s7["data"].dataType == T.BinaryType() and s7["data"].nullable


# ---------------------------------------------------------------------------
# Parser semantics / error cases (schema_parser_test.go analogues)
# ---------------------------------------------------------------------------


def test_field_ids_and_annotations_survive_roundtrip():
    text = (
        "message foo {\n"
        "  required binary the_id (STRING) = 1;\n"
        "  optional int64 ts (TIMESTAMP(MICROS, false)) = 2;\n"
        "  required fixed_len_byte_array(9) amount (DECIMAL(20, 4)) = 3;\n"
        "  optional int32 small (INT(8, true));\n"
        "}\n"
    )
    msg = parse_message(text)
    assert msg.dumps() == text
    assert msg.fields[0].field_id == 1
    assert msg.fields[1].annotation.params == ("MICROS", False)
    assert msg.fields[2].type_length == 9


@pytest.mark.parametrize(
    "bad",
    [
        "",  # empty
        "message foo { required int63 x; }",  # unknown type
        "message foo { needed int64 x; }",  # bad repetition
        "message foo { required int64 x (TIMESTAMP(SECONDS, true)); }",  # bad unit
        "message foo { required int32 x (INT(12, true)); }",  # bad width
        "message foo { required int64 x (INT(64, maybe)); }",  # bad signed
        "message foo { required int32 x (DECIMAL(12, 2)); }",  # precision > int32 bound
        "message foo { required int32 x (TIME(MICROS, true)); }",  # TIME(MICROS) needs int64
        "message foo { required binary x (DATE); }",  # DATE needs int32
        "message foo { required binary x (UUID); }",  # UUID needs FLBA(16)
        "message foo { required group l (LIST) { repeated group list { required int32 element; } required int32 extra; } }",
        "message foo { repeated group l (LIST) { repeated group list { required int32 element; } } }",
        "message foo { required group m (MAP) { required group key_value { required int32 key; required int32 value; } } }",
        "message foo { required int64 x; } trailing",
    ],
)
def test_invalid_schemas_raise(bad):
    with pytest.raises(SchemaTextError):
        parse_message(bad)


def test_strict_rejects_backward_compat_list_and_map():
    legacy_list = (
        "message foo { optional group tags (LIST) { repeated binary array (STRING); } }"
    )
    legacy_map = (
        "message foo { required group m (MAP) { repeated group map "
        "{ required binary key (STRING); required int32 value; } } }"
    )
    mkv = (
        "message foo { required group m (MAP_KEY_VALUE) { repeated group key_value "
        "{ required binary key (STRING); required int32 value; } } }"
    )
    for text in (legacy_list, legacy_map, mkv):
        parse_message(text)  # lenient accepts
        with pytest.raises(SchemaTextError):
            parse_message(text, strict=True)

    strict_ok = (
        "message foo {\n"
        "  optional group tags (LIST) {\n"
        "    repeated group list {\n"
        "      required binary element (STRING);\n"
        "    }\n"
        "  }\n"
        "  required group m (MAP) {\n"
        "    repeated group key_value {\n"
        "      required binary key (STRING);\n"
        "      optional int32 value;\n"
        "    }\n"
        "  }\n"
        "}\n"
    )
    msg = parse_message(strict_ok, strict=True)
    assert msg.dumps() == strict_ok


def test_legacy_repeated_field_maps_to_array():
    msg = parse_message("message foo { repeated int32 nums; }")
    s = msg.to_spark()
    assert s["nums"].dataType == T.ArrayType(T.IntegerType(), containsNull=False)


def test_subschema_promotes_group():
    msg = parse_message(
        "message foo { required group name { required binary first (STRING); } }"
    )
    sub = msg.subschema("name")
    assert isinstance(sub, Message)
    assert sub.to_spark()["first"].dataType == T.StringType()
    assert msg.subschema("nope") is None


def test_converted_type_vocabulary():
    msg = parse_message(
        "message foo {\n"
        "  required binary a (UTF8);\n"
        "  required int32 b (INT_16);\n"
        "  required int32 c (UINT_8);\n"
        "  required int64 d (TIMESTAMP_MILLIS);\n"
        "}\n"
    )
    s = msg.to_spark()
    assert s["a"].dataType == T.StringType()
    assert s["b"].dataType == T.ShortType()
    assert s["c"].dataType == T.ShortType()  # unsigned widens
    assert s["d"].dataType == T.TimestampType()
    assert all(f.annotation.converted_only for f in msg.fields)


# ---------------------------------------------------------------------------
# Spark → message and full round trip
# ---------------------------------------------------------------------------


def test_message_from_spark_roundtrip():
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("score", T.DecimalType(12, 4), True),
            T.StructField("tags", T.ArrayType(T.StringType(), True), True),
            T.StructField(
                "meta", T.MapType(T.StringType(), T.LongType(), True), True
            ),
            T.StructField(
                "nested",
                T.StructType(
                    [
                        T.StructField("a", T.IntegerType(), True),
                        T.StructField(
                            "b", T.ArrayType(T.ArrayType(T.DoubleType(), False), False), False
                        ),
                    ]
                ),
                True,
            ),
        ]
    )
    msg = message_from_spark(schema, name="pages")
    # strict-shape output
    msg.validate(strict=True)
    back = parse_message(msg.dumps(), strict=True).to_spark()
    assert back == schema


def test_decimal_carrier_width():
    msg = message_from_spark(
        T.StructType([T.StructField("d", T.DecimalType(20, 4), False)])
    )
    f = msg.fields[0]
    assert f.physical == "fixed_len_byte_array"
    assert f.annotation == Annotation("DECIMAL", (20, 4))
    # 20 digits need 9 bytes signed
    assert f.type_length == 9
    parse_message(msg.dumps())  # passes DECIMAL precision bound for FLBA(9)


# ---------------------------------------------------------------------------
# Engine integration: encode_table(message_schema=...)
# ---------------------------------------------------------------------------


def test_encode_table_with_message_schema(spark, tmp_path):
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    df = spark.createDataFrame(
        [(f"https://ex.com/{i}", i, float(i) / 7, str(i % 3)) for i in range(200)],
        "url string, hits bigint, score double, lang string",
    )
    # the message narrows hits to int32 and drops `score`
    text = (
        "message pages {\n"
        "  required binary url (STRING);\n"
        "  required int32 hits (INT(32, true));\n"
        "  optional binary lang (STRING);\n"
        "}\n"
    )
    out = str(tmp_path / "enc")
    encode_table(df, out, key_col="url", partitions=4, message_schema=text).collect()
    back = decode_table(spark, out)
    assert [f.name for f in back.schema.fields] == ["url", "hits", "lang"]
    assert dict(back.dtypes)["hits"] == "int"
    assert back.count() == 200
    got = {r["url"]: r["hits"] for r in back.collect()}
    assert got["https://ex.com/7"] == 7

    with pytest.raises(ValueError, match="absent from df"):
        encode_table(
            df, str(tmp_path / "enc2"), message_schema="message m { required int64 nope; }"
        )


def test_cli_schema_parse(tmp_path, capsys):
    from parquet_go_spark.cli import main

    p = tmp_path / "x.schema"
    p.write_text("message foo { required int64 a; optional binary b (STRING); }")
    rc = main(["schema", "--parse", str(p)])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"ddl"' in out and "a bigint" in out.replace(":", " ").lower() or "bigint" in out
