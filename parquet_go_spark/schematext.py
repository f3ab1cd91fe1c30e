"""Textual ``message {}`` Parquet schema definitions ⇄ Spark schemas.

The reference ships a full schema-definition language — lexer/parser
(``parquetschema/schema_parser.go:98-720``), LIST/MAP/logical-type
validation (``schema_parser.go:724-980``), and a printer whose output
re-parses to the same definition (``schema_def.go:114-131``).  Users of
the reference carry ``.schema`` files in that syntax (fixtures at
``parquetschema/schema-files/test1-7.schema``), so switching engines
requires reading them.  This module is a from-scratch Python
recursive-descent implementation of the same language:

* :func:`parse_message` — text → :class:`Message` tree, with the
  reference's lenient structural validation applied on parse
  (``schema_parser.go:280`` validates with ``strictMode=false``).
* :meth:`Message.validate` with ``strict=True`` — the
  ``ValidateStrict`` analogue: modern 3-level LIST / ``key_value`` MAP
  shapes only, backward-compat forms rejected.
* :meth:`Message.dumps` — canonical printer; ``parse(dumps(m))`` is a
  fixed point, like the reference's ``SchemaDefinition.String``.
* :meth:`Message.to_spark` / :func:`message_from_spark` — the bridge
  this engine actually uses: Spark ``StructType`` in and out, so
  ``encode_table(message_schema=...)`` can cast a DataFrame to the
  shape a reference ``.schema`` file declares.

Everything is driver-side metadata work on strings — no data movement,
so there is nothing scale-sensitive here.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field as dfield
from typing import Iterator, Optional

from pyspark.sql import types as T

PHYSICAL_TYPES = {
    "boolean",
    "int32",
    "int64",
    "int96",
    "float",
    "double",
    "binary",
    "fixed_len_byte_array",
}

# Converted types accepted in a bare `(NAME)` annotation
# (parquet.thrift ConvertedType values).
CONVERTED_TYPES = {
    "UTF8",
    "MAP",
    "MAP_KEY_VALUE",
    "LIST",
    "ENUM",
    "DECIMAL",
    "DATE",
    "TIME_MILLIS",
    "TIME_MICROS",
    "TIMESTAMP_MILLIS",
    "TIMESTAMP_MICROS",
    "UINT_8",
    "UINT_16",
    "UINT_32",
    "UINT_64",
    "INT_8",
    "INT_16",
    "INT_32",
    "INT_64",
    "JSON",
    "BSON",
    "INTERVAL",
}

_TIME_UNITS = ("MILLIS", "MICROS", "NANOS")


class SchemaTextError(ValueError):
    """Raised on lexical, syntactic, or structural schema errors."""


@dataclass
class Annotation:
    """A `(...)` type annotation: logical or converted type."""

    kind: str  # e.g. STRING, DECIMAL, TIMESTAMP, INT, LIST, UTF8, ...
    params: tuple = ()
    # True when the annotation came from the bare converted-type
    # vocabulary (no logical-type equivalent recorded), e.g. `(UTF8)`.
    converted_only: bool = False

    def __str__(self) -> str:
        if self.kind in ("TIMESTAMP", "TIME"):
            unit, utc = self.params
            return f"{self.kind}({unit}, {'true' if utc else 'false'})"
        if self.kind == "INT":
            width, signed = self.params
            return f"INT({width}, {'true' if signed else 'false'})"
        if self.kind == "DECIMAL" and self.params:
            prec, scale = self.params
            return f"DECIMAL({prec}, {scale})"
        return self.kind


@dataclass
class Field:
    name: str
    repetition: str  # required | optional | repeated
    physical: Optional[str] = None  # None => group
    type_length: Optional[int] = None  # fixed_len_byte_array width
    annotation: Optional[Annotation] = None
    field_id: Optional[int] = None
    children: list["Field"] = dfield(default_factory=list)

    @property
    def is_group(self) -> bool:
        return self.physical is None

    def find(self, name: str) -> Optional["Field"]:
        for c in self.children:
            if c.name == name:
                return c
        return None


@dataclass
class Message:
    name: str
    fields: list[Field]

    # -- printer ---------------------------------------------------------
    def dumps(self) -> str:
        out = [f"message {self.name} {{"]
        for f in self.fields:
            _print_field(out, f, 2)
        out.append("}")
        return "\n".join(out) + "\n"

    # -- validation ------------------------------------------------------
    def validate(self, strict: bool = False) -> None:
        for f in self.fields:
            _validate(f, self.name, strict)

    # -- navigation ------------------------------------------------------
    def subschema(self, name: str) -> Optional["Message"]:
        """SubSchema analogue: promote a group child to its own message."""
        for f in self.fields:
            if f.name == name and f.is_group:
                return Message(name=f.name, fields=f.children)
        return None

    # -- Spark bridge ----------------------------------------------------
    def to_spark(self) -> T.StructType:
        return T.StructType([_field_to_spark(f) for f in self.fields])

    def to_ddl(self) -> str:
        return self.to_spark().simpleString()[len("struct<") : -1]


# ---------------------------------------------------------------------------
# Lexer / parser
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+)
  | (?P<ident>[^\s(){}=;,]+)
  | (?P<punct>[(){}=;,])
    """,
    re.VERBOSE,
)


def _lex(text: str) -> Iterator[tuple[str, str, int]]:
    line = 1
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:  # pragma: no cover - regex covers all chars
            raise SchemaTextError(f"line {line}: unexpected character {text[pos]!r}")
        pos = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "ws":
            line += val.count("\n")
            continue
        yield (kind, val, line)
    yield ("eof", "", line)


class _Parser:
    def __init__(self, text: str):
        self._toks = _lex(text)
        self.tok = next(self._toks)

    def next(self) -> None:
        self.tok = next(self._toks)

    def error(self, msg: str) -> None:
        raise SchemaTextError(f"line {self.tok[2]}: {msg}")

    def expect(self, kind: str, val: Optional[str] = None) -> str:
        k, v, _ = self.tok
        if kind == "punct" and (k != "punct" or v != val):
            self.error(f"expected {val!r}, got {v!r}")
        elif kind == "ident" and k not in ("ident", "num"):
            self.error(f"expected identifier, got {v!r}")
        elif kind not in ("punct", "ident") and k != kind:
            self.error(f"expected {kind}, got {v!r}")
        return v

    # message <name> { fields }
    def parse_message(self) -> Message:
        name = self.expect("ident")
        if name != "message":
            self.error(f'expected "message", got {name!r}')
        self.next()
        msg_name = self.expect("ident")
        self.next()
        self.expect("punct", "{")
        self.next()
        fields = self.parse_body()
        self.expect("punct", "}")
        self.next()
        if self.tok[0] != "eof":
            self.error(f"trailing content {self.tok[1]!r} after message")
        return Message(name=msg_name, fields=fields)

    def parse_body(self) -> list[Field]:
        fields: list[Field] = []
        while self.tok[0] != "eof" and not (self.tok[0] == "punct" and self.tok[1] == "}"):
            fields.append(self.parse_field())
        return fields

    def parse_field(self) -> Field:
        rep = self.expect("ident")
        if rep not in ("required", "optional", "repeated"):
            self.error(f"invalid field repetition type {rep!r}")
        self.next()
        head = self.expect("ident")

        if head == "group":
            self.next()
            name = self.expect("ident")
            self.next()
            ann = None
            if self.tok == ("punct", "(", self.tok[2]) or (
                self.tok[0] == "punct" and self.tok[1] == "("
            ):
                ann = self.parse_annotation(group=True)
            fid = self.parse_field_id()
            self.expect("punct", "{")
            self.next()
            children = self.parse_body()
            self.expect("punct", "}")
            self.next()
            return Field(
                name=name,
                repetition=rep,
                annotation=ann,
                field_id=fid,
                children=children,
            )

        # primitive
        if head not in PHYSICAL_TYPES:
            self.error(f"unsupported type {head!r}")
        self.next()
        type_length = None
        if head == "fixed_len_byte_array":
            self.expect("punct", "(")
            self.next()
            n = self.expect("num")
            type_length = int(n)
            self.next()
            self.expect("punct", ")")
            self.next()
        name = self.expect("ident")
        self.next()
        ann = None
        if self.tok[0] == "punct" and self.tok[1] == "(":
            ann = self.parse_annotation(group=False)
        fid = self.parse_field_id()
        self.expect("punct", ";")
        self.next()
        return Field(
            name=name,
            repetition=rep,
            physical=head,
            type_length=type_length,
            annotation=ann,
            field_id=fid,
        )

    def parse_field_id(self) -> Optional[int]:
        if self.tok[0] == "punct" and self.tok[1] == "=":
            self.next()
            v = self.expect("num")
            self.next()
            return int(v)
        return None

    def parse_annotation(self, group: bool) -> Annotation:
        self.expect("punct", "(")
        self.next()
        name = self.expect("ident")
        upper = name.upper()

        if group:
            # Groups take a bare converted type: LIST, MAP, MAP_KEY_VALUE, ...
            if upper not in CONVERTED_TYPES:
                self.error(f"invalid converted type {name!r}")
            self.next()
            self.expect("punct", ")")
            self.next()
            return Annotation(kind=upper, converted_only=True)

        if upper in ("TIMESTAMP", "TIME"):
            self.next()
            self.expect("punct", "(")
            self.next()
            unit = self.expect("ident")
            if unit not in _TIME_UNITS:
                self.error(f"unknown unit annotation {unit!r} for {upper}")
            self.next()
            self.expect("punct", ",")
            self.next()
            utc = self.expect("ident")
            if utc not in ("true", "false"):
                self.error(f"invalid isAdjustedToUTC annotation {utc!r} for {upper}")
            self.next()
            self.expect("punct", ")")
            self.next()
            self.expect("punct", ")")
            self.next()
            return Annotation(kind=upper, params=(unit, utc == "true"))

        if upper == "INT":
            self.next()
            self.expect("punct", "(")
            self.next()
            width = int(self.expect("num"))
            if width not in (8, 16, 32, 64):
                self.error(f"INT: unsupported bitwidth {width}")
            self.next()
            self.expect("punct", ",")
            self.next()
            signed = self.expect("ident")
            if signed not in ("true", "false"):
                self.error(f"invalid isSigned annotation {signed!r} for INT")
            self.next()
            self.expect("punct", ")")
            self.next()
            self.expect("punct", ")")
            self.next()
            return Annotation(kind="INT", params=(width, signed == "true"))

        if upper == "DECIMAL":
            self.next()
            if self.tok[0] == "punct" and self.tok[1] == ")":
                # bare converted-type DECIMAL with no (precision, scale)
                self.next()
                return Annotation(kind="DECIMAL", converted_only=True)
            self.expect("punct", "(")
            self.next()
            prec = int(self.expect("num"))
            self.next()
            self.expect("punct", ",")
            self.next()
            scale = int(self.expect("num"))
            self.next()
            self.expect("punct", ")")
            self.next()
            self.expect("punct", ")")
            self.next()
            return Annotation(kind="DECIMAL", params=(prec, scale))

        if upper in ("STRING", "DATE", "UUID", "ENUM", "JSON", "BSON"):
            self.next()
            self.expect("punct", ")")
            self.next()
            return Annotation(kind=upper)

        if upper in CONVERTED_TYPES:
            self.next()
            self.expect("punct", ")")
            self.next()
            return Annotation(kind=upper, converted_only=True)

        self.error(f"unsupported logical type or converted type {name!r}")
        raise AssertionError  # unreachable


def parse_message(text: str, strict: bool = False) -> Message:
    """Parse a ``message {}`` schema definition.

    Like the reference parser, lenient structural validation always runs
    (``schema_parser.go:280``); pass ``strict=True`` for the
    ``ValidateStrict`` analogue.
    """
    if not text.strip():
        raise SchemaTextError("empty schema definition")
    msg = _Parser(text).parse_message()
    msg.validate(strict=strict)
    return msg


# ---------------------------------------------------------------------------
# Validation (reference schema_parser.go:752-980 semantics)
# ---------------------------------------------------------------------------


def _validate(col: Field, parent: str, strict: bool) -> None:
    if not col.name:
        raise SchemaTextError("column has no name")
    if not col.is_group and col.children:
        raise SchemaTextError(f"field {col.name} has a type but also children")
    if col.is_group and not col.children:
        raise SchemaTextError(f"field {col.name} has neither children nor a type")

    ann = col.annotation
    kind = ann.kind if ann else None

    if kind == "LIST":
        _validate_list(col, strict)
        return
    if kind == "MAP" or kind == "MAP_KEY_VALUE":
        _validate_map(col, strict)
        return
    if kind == "TIME" and ann.params:
        unit = ann.params[0]
        want = "int32" if unit == "MILLIS" else "int64"
        if col.physical != want:
            raise SchemaTextError(
                f"field {col.name} is annotated as TIME({unit}, ...) but is not an {want}"
            )
    if kind == "TIMESTAMP" and ann.params:
        if col.physical != "int64":
            raise SchemaTextError(
                f"field {col.name} is annotated as TIMESTAMP but is not an int64"
            )
    if kind == "DECIMAL" and ann.params:
        _validate_decimal(col)
    if kind == "INT" and ann.params:
        width = ann.params[0]
        want = "int64" if width == 64 else "int32"
        if col.physical != want:
            raise SchemaTextError(
                f"field {col.name} is annotated as INT({width}, ...) but is not an {want}"
            )
    if kind == "STRING" and col.physical != "binary":
        raise SchemaTextError(f"field {col.name} is annotated as STRING but is not binary")
    if kind == "DATE" and col.physical != "int32":
        raise SchemaTextError(f"field {col.name} is annotated as DATE but is not an int32")
    if kind == "UUID" and (col.physical != "fixed_len_byte_array" or col.type_length != 16):
        raise SchemaTextError(
            f"field {col.name} is annotated as UUID but is not fixed_len_byte_array(16)"
        )

    for c in col.children:
        _validate(c, col.name, strict)


def _validate_list(col: Field, strict: bool) -> None:
    if not col.is_group:
        raise SchemaTextError(f"field {col.name} is not a group but annotated as LIST")
    if col.repetition == "repeated":
        raise SchemaTextError(
            f"field {col.name} is a LIST but has repetition type repeated"
        )
    if len(col.children) != 1:
        raise SchemaTextError(
            f"field {col.name} is a LIST but has {len(col.children)} children"
        )
    inner = col.children[0]
    if inner.name != "list":
        if strict:
            raise SchemaTextError(
                f'field {col.name} is a LIST but its child is not named "list"'
            )
        # Backward-compat rules 1-4 (schema_parser.go:791-809): any
        # repeated child shape is tolerated in lenient mode, as long as a
        # group child has at least one field.
        if inner.is_group and len(inner.children) == 0:
            raise SchemaTextError(
                f"field {col.name} is a LIST but the repeated group inside it "
                'is not called "list" and contains no fields'
            )
    else:
        if not inner.is_group or inner.repetition != "repeated":
            raise SchemaTextError(
                f"field {col.name} is a LIST but its child is not a repeated group"
            )
        if len(inner.children) != 1:
            raise SchemaTextError(
                f"field {col.name}.list has {len(inner.children)} children"
            )
        elem = inner.children[0]
        if elem.name != "element":
            raise SchemaTextError(
                f'{col.name}.list has a child but it\'s called {elem.name!r}, not "element"'
            )
        if elem.repetition == "repeated":
            raise SchemaTextError(
                f"{col.name}.list.element has disallowed repetition type repeated"
            )
    for c in inner.children:
        _validate(c, inner.name, strict)


def _validate_map(col: Field, strict: bool) -> None:
    if col.annotation.kind == "MAP_KEY_VALUE" and strict:
        raise SchemaTextError(f"field {col.name} is incorrectly annotated as MAP_KEY_VALUE")
    if not col.is_group:
        raise SchemaTextError(f"field {col.name} is not a group but annotated as MAP")
    if len(col.children) != 1:
        raise SchemaTextError(
            f"field {col.name} is a MAP but has {len(col.children)} children"
        )
    kv = col.children[0]
    if not kv.is_group or kv.repetition != "repeated":
        raise SchemaTextError(
            f"field {col.name} is a MAP but its child is not a repeated group"
        )
    if strict:
        if kv.name != "key_value":
            raise SchemaTextError(
                f'field {col.name} is a MAP but its child is not named "key_value"'
            )
        found_key = found_value = False
        for c in kv.children:
            if c.name == "key":
                if c.repetition != "required":
                    raise SchemaTextError(
                        f'field {col.name}.key_value.key is not of repetition type "required"'
                    )
                found_key = True
            elif c.name == "value":
                found_value = True
            else:
                raise SchemaTextError(
                    f"field {col.name} is a MAP so {col.name}.key_value.{c.name} is not allowed"
                )
        if not found_key:
            raise SchemaTextError(f"field {col.name} is missing {col.name}.key_value.key")
        if not found_value:
            raise SchemaTextError(f"field {col.name} is missing {col.name}.key_value.value")
    else:
        if len(kv.children) != 2:
            raise SchemaTextError(
                f"field {col.name} is a MAP but {col.name}.{kv.name} contains "
                f"{len(kv.children)} children (expected 2)"
            )
    for c in kv.children:
        _validate(c, kv.name, strict)


def _validate_decimal(col: Field) -> None:
    prec, scale = col.annotation.params
    if scale < 0 or scale > prec:
        raise SchemaTextError(
            f"field {col.name} DECIMAL scale {scale} out of bounds for precision {prec}"
        )
    if col.physical == "int32":
        hi = 9
    elif col.physical == "int64":
        hi = 18
    elif col.physical == "fixed_len_byte_array":
        n = col.type_length or 0
        hi = int(math.floor(math.log10(math.exp2(8 * n - 1) - 1))) if n else 0
    elif col.physical == "binary":
        hi = None
    else:
        raise SchemaTextError(
            f"field {col.name} is annotated as DECIMAL but type {col.physical} is unsupported"
        )
    if prec < 1 or (hi is not None and prec > hi):
        raise SchemaTextError(
            f"field {col.name} is {col.physical} and annotated as DECIMAL but "
            f"precision {prec} is out of bounds"
        )


# ---------------------------------------------------------------------------
# Printer
# ---------------------------------------------------------------------------


def _print_field(out: list[str], f: Field, indent: int) -> None:
    pad = " " * indent
    if f.is_group:
        ann = f" ({f.annotation})" if f.annotation else ""
        # groups carry field ids too — dropping them broke the
        # parse(dumps(m)) fixed point for .schema files using ids
        gid = f" = {f.field_id}" if f.field_id is not None else ""
        out.append(f"{pad}{f.repetition} group {f.name}{ann}{gid} {{")
        for c in f.children:
            _print_field(out, c, indent + 2)
        out.append(f"{pad}}}")
        return
    typ = f.physical
    if typ == "fixed_len_byte_array":
        typ = f"fixed_len_byte_array({f.type_length})"
    ann = f" ({f.annotation})" if f.annotation else ""
    fid = f" = {f.field_id}" if f.field_id is not None else ""
    out.append(f"{pad}{f.repetition} {typ} {f.name}{ann}{fid};")


# ---------------------------------------------------------------------------
# Spark bridge: message → StructType
# ---------------------------------------------------------------------------


def _field_to_spark(f: Field) -> T.StructField:
    nullable = f.repetition == "optional"
    if f.repetition == "repeated":
        # Legacy repeated field outside LIST/MAP: an array of the
        # field's own type with non-null elements.
        inner = Field(
            name=f.name,
            repetition="required",
            physical=f.physical,
            type_length=f.type_length,
            annotation=f.annotation,
            children=f.children,
        )
        return T.StructField(
            f.name, T.ArrayType(_type_of(inner), containsNull=False), nullable=False
        )
    return T.StructField(f.name, _type_of(f), nullable=nullable)


def _type_of(f: Field) -> T.DataType:
    ann = f.annotation
    kind = ann.kind if ann else None

    if f.is_group:
        if kind == "LIST":
            inner = f.children[0]
            if inner.name == "list" and inner.is_group:
                elem = inner.children[0]
                return T.ArrayType(_type_of(elem), containsNull=elem.repetition == "optional")
            # backward-compat forms: element is the repeated child itself
            if not inner.is_group or len(inner.children) != 1:
                return T.ArrayType(_type_of(inner), containsNull=False)
            elem = inner.children[0]
            if inner.name in ("array", "bag", f.name + "_tuple"):
                return T.ArrayType(_type_of(elem), containsNull=False)
            return T.ArrayType(_type_of(inner), containsNull=False)
        if kind in ("MAP", "MAP_KEY_VALUE"):
            kv = f.children[0]
            key = kv.find("key") or kv.children[0]
            value = kv.find("value") or kv.children[1]
            return T.MapType(
                _type_of(key), _type_of(value), valueContainsNull=value.repetition == "optional"
            )
        return T.StructType([_field_to_spark(c) for c in f.children])

    p = f.physical
    if p == "boolean":
        return T.BooleanType()
    if p == "int32":
        if kind == "DATE":
            return T.DateType()
        if kind == "DECIMAL" and ann.params:
            return T.DecimalType(*ann.params)
        if kind == "INT" and ann.params:
            width, signed = ann.params
            if signed:
                return {8: T.ByteType(), 16: T.ShortType(), 32: T.IntegerType()}[width]
            # unsigned widens to the next signed carrier
            return {8: T.ShortType(), 16: T.IntegerType(), 32: T.LongType()}[width]
        if kind == "INT_8":
            return T.ByteType()
        if kind == "INT_16":
            return T.ShortType()
        if kind in ("UINT_8",):
            return T.ShortType()
        if kind in ("UINT_16",):
            return T.IntegerType()
        if kind in ("UINT_32",):
            return T.LongType()
        return T.IntegerType()
    if p == "int64":
        if kind == "TIMESTAMP" and ann.params:
            _, utc = ann.params
            return T.TimestampType() if utc else T.TimestampNTZType()
        if kind in ("TIMESTAMP_MILLIS", "TIMESTAMP_MICROS"):
            return T.TimestampType()
        if kind == "DECIMAL" and ann.params:
            return T.DecimalType(*ann.params)
        if kind in ("UINT_64",):
            return T.DecimalType(20, 0)
        return T.LongType()
    if p == "int96":
        return T.TimestampType()
    if p == "float":
        return T.FloatType()
    if p == "double":
        return T.DoubleType()
    if p == "binary":
        if kind in ("STRING", "UTF8", "ENUM", "JSON"):
            return T.StringType()
        if kind == "DECIMAL" and ann.params:
            return T.DecimalType(*ann.params)
        return T.BinaryType()
    if p == "fixed_len_byte_array":
        if kind == "DECIMAL" and ann.params:
            return T.DecimalType(*ann.params)
        return T.BinaryType()
    raise SchemaTextError(f"unsupported physical type {p!r}")  # pragma: no cover


# ---------------------------------------------------------------------------
# Spark bridge: StructType → message
# ---------------------------------------------------------------------------


def message_from_spark(schema: T.StructType, name: str = "spark_schema") -> Message:
    """Build a strict-shape message definition from a Spark schema.

    Output uses the modern 3-level LIST and ``key_value`` MAP forms and
    round-trips: ``parse_message(message_from_spark(s).dumps()).to_spark()``
    reproduces ``s`` (modulo unsigned/INT96 widenings that Spark cannot
    express).
    """
    fields = [_field_from_spark(f.name, f.dataType, f.nullable) for f in schema.fields]
    return Message(name=name, fields=fields)


def _decimal_flba_width(precision: int) -> int:
    # Minimal FLBA width holding `precision` decimal digits, signed —
    # matches the engine's minimal-width big-endian DECIMAL carrier.
    # EXACT loop the engine's DECIMAL carrier uses (core.columns.
    # decimal_width): the closed-form (p*10+2+23)//24 under-sized
    # precisions 7 and 19 (3 bytes can't hold 9,999,999; 8 bytes can't
    # hold 10^19-1), emitting schemas the module's own validator
    # rejected on re-parse.
    from .core.columns import decimal_width

    return decimal_width(precision)


def _field_from_spark(name: str, dt: T.DataType, nullable: bool) -> Field:
    rep = "optional" if nullable else "required"

    if isinstance(dt, T.ArrayType):
        elem = _field_from_spark("element", dt.elementType, dt.containsNull)
        return Field(
            name=name,
            repetition=rep,
            annotation=Annotation("LIST", converted_only=True),
            children=[Field(name="list", repetition="repeated", children=[elem])],
        )
    if isinstance(dt, T.MapType):
        key = _field_from_spark("key", dt.keyType, False)
        value = _field_from_spark("value", dt.valueType, dt.valueContainsNull)
        return Field(
            name=name,
            repetition=rep,
            annotation=Annotation("MAP", converted_only=True),
            children=[Field(name="key_value", repetition="repeated", children=[key, value])],
        )
    if isinstance(dt, T.StructType):
        return Field(
            name=name,
            repetition=rep,
            children=[_field_from_spark(f.name, f.dataType, f.nullable) for f in dt.fields],
        )

    def prim(physical: str, ann: Optional[Annotation] = None, type_length: Optional[int] = None):
        return Field(
            name=name,
            repetition=rep,
            physical=physical,
            annotation=ann,
            type_length=type_length,
        )

    if isinstance(dt, T.BooleanType):
        return prim("boolean")
    if isinstance(dt, T.ByteType):
        return prim("int32", Annotation("INT", (8, True)))
    if isinstance(dt, T.ShortType):
        return prim("int32", Annotation("INT", (16, True)))
    if isinstance(dt, T.IntegerType):
        return prim("int32")
    if isinstance(dt, T.LongType):
        return prim("int64")
    if isinstance(dt, T.FloatType):
        return prim("float")
    if isinstance(dt, T.DoubleType):
        return prim("double")
    if isinstance(dt, T.StringType):
        return prim("binary", Annotation("STRING"))
    if isinstance(dt, T.BinaryType):
        return prim("binary")
    if isinstance(dt, T.DateType):
        return prim("int32", Annotation("DATE"))
    if isinstance(dt, T.TimestampNTZType):
        return prim("int64", Annotation("TIMESTAMP", ("MICROS", False)))
    if isinstance(dt, T.TimestampType):
        return prim("int64", Annotation("TIMESTAMP", ("MICROS", True)))
    if isinstance(dt, T.DecimalType):
        return prim(
            "fixed_len_byte_array",
            Annotation("DECIMAL", (dt.precision, dt.scale)),
            type_length=_decimal_flba_width(dt.precision),
        )
    raise SchemaTextError(f"cannot express Spark type {dt.simpleString()} as a schema element")
