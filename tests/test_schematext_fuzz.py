"""Generative round-trip fuzz for the schema-language bridge: random
Spark StructTypes → ``message_from_spark`` → ``dumps`` → ``parse_message``
→ ``to_spark`` must reproduce the schema, and the printer must be a
parse fixpoint (``dumps(parse(dumps(m))) == dumps(m)``) — the
reference's ``SchemaDefinition.String`` contract
(``parquetschema/schema_def.go:114-131``), previously pinned only on
the fixed ``.schema`` fixtures.

Driver-side metadata only — no Spark session needed.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import types as T

from parquet_go_spark.schematext import message_from_spark, parse_message

_ATOMS = [
    T.StringType(),
    T.BinaryType(),
    T.BooleanType(),
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.DateType(),
    T.TimestampType(),
    T.DecimalType(9, 2),
    T.DecimalType(20, 0),
    T.DecimalType(38, 10),
    T.DecimalType(5, 5),
]


def _rand_type(rng: random.Random, depth: int) -> T.DataType:
    if depth <= 0 or rng.random() < 0.6:
        return rng.choice(_ATOMS)
    kind = rng.randrange(3)
    if kind == 0:
        return T.ArrayType(_rand_type(rng, depth - 1), containsNull=rng.random() < 0.5)
    if kind == 1:
        return T.MapType(
            rng.choice([T.StringType(), T.IntegerType(), T.LongType()]),
            _rand_type(rng, depth - 1),
            valueContainsNull=rng.random() < 0.5,
        )
    n = rng.randrange(1, 4)
    return T.StructType(
        [
            T.StructField(f"c{depth}_{i}", _rand_type(rng, depth - 1), nullable=rng.random() < 0.5)
            for i in range(n)
        ]
    )


def _rand_schema(rng: random.Random) -> T.StructType:
    n = rng.randrange(1, 6)
    return T.StructType(
        [
            T.StructField(f"f{i}", _rand_type(rng, 3), nullable=rng.random() < 0.5)
            for i in range(n)
        ]
    )


@pytest.mark.parametrize("seed", range(60))
def test_spark_schema_roundtrip_through_schema_language(seed):
    rng = random.Random(1_000_000 + seed)
    schema = _rand_schema(rng)
    msg = message_from_spark(schema)
    text = msg.dumps()
    parsed = parse_message(text)
    # printer is a parse fixpoint
    assert parsed.dumps() == text
    # and the bridge reproduces the Spark schema exactly
    assert parsed.to_spark() == schema, text


@pytest.mark.parametrize("seed", range(60))
def test_strict_validation_accepts_bridge_output(seed):
    """message_from_spark emits modern 3-level LIST / key_value MAP
    shapes, so strict validation must accept every bridge output."""
    rng = random.Random(2_000_000 + seed)
    msg = message_from_spark(_rand_schema(rng))
    msg.validate(strict=True)
