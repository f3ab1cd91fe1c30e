"""High-level typed-object interface (reference ``floor`` package analogue).

The reference's ``floor`` layer marshals application structs into parquet
rows and back: a declared message schema is authoritative, struct fields
bind by lowercased name or a ``parquet:"name"`` tag
(``floor/writer.go:77-345``, ``floor/reader.go:100-200``,
``floor/fieldname.go``), and ``NewFileWriter``/``NewFileReader`` wrap the
low-level file writer/reader.  The Spark-native analogue works over
dataclasses:

* :func:`schema_for` — dataclass reflection → Spark ``StructType``
  (the ``parquetschema/autoschema`` analogue), honoring
  ``field(metadata={"parquet": name})`` renames and ``Optional`` nullability.
* :class:`Writer` — buffers typed objects and flushes them through
  ``encode_table`` in batches (each flush is an appended, snapshot-pinned
  table version).  An explicit ``message_schema`` is authoritative, like
  floor's ``UseSchemaDefinition``.
* :class:`Reader` — ``dataframe()`` stays distributed; iterating yields
  typed objects through ``toLocalIterator`` (a driver-side convenience,
  same row-at-a-time contract as floor's ``Next()/Scan``).

The scale path is always ``Reader.dataframe()`` / ``encode_table`` on a
DataFrame; the object iterator exists for the reference's high-level
use case (applications handling rows one at a time), not for bulk data
movement.
"""

from __future__ import annotations

import dataclasses
import datetime
import decimal
import functools
import typing

from pyspark.sql import DataFrame, SparkSession, types as T

_SCALARS = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bytes: T.BinaryType(),
    bool: T.BooleanType(),
    datetime.datetime: T.TimestampType(),
    datetime.date: T.DateType(),
    decimal.Decimal: T.DecimalType(38, 18),
}


class FloorTypeError(TypeError):
    pass


def _parquet_name(f: dataclasses.Field) -> str:
    # floor/fieldname.go: tag wins, else lowercased field name
    return f.metadata.get("parquet", f.name.lower())


def _spark_type(hint) -> tuple[T.DataType, bool]:
    """Resolve a type hint to (DataType, nullable)."""
    import types as _types

    origin = typing.get_origin(hint)
    # typing.Optional[X] AND the PEP 604 spelling `X | None` (origin is
    # types.UnionType, not typing.Union) — modern dataclasses use the
    # latter and previously raised FloorTypeError
    if origin is typing.Union or origin is _types.UnionType:
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        if len(args) != 1:
            raise FloorTypeError(f"unsupported union type {hint!r}")
        inner, _ = _spark_type(args[0])
        return inner, True
    if origin in (list, tuple):
        args = typing.get_args(hint)
        if not args:
            raise FloorTypeError("list fields need an element type, e.g. list[int]")
        # tuple[X, ...] is the homogeneous variadic spelling — same array
        # type as list[X]; fixed heterogeneous tuples have no Spark array
        # equivalent and must fail with the module's documented error
        if origin is tuple and len(args) == 2 and args[1] is Ellipsis:
            args = args[:1]
        if len(args) != 1:
            raise FloorTypeError(
                f"cannot map heterogeneous tuple {hint!r} to a Spark array; "
                "use a nested dataclass for fixed-shape records"
            )
        et, en = _spark_type(args[0])
        return T.ArrayType(et, containsNull=en), False
    if origin is dict:
        k, v = typing.get_args(hint)
        kt, _ = _spark_type(k)
        vt, vn = _spark_type(v)
        return T.MapType(kt, vt, valueContainsNull=vn), False
    if dataclasses.is_dataclass(hint):
        return schema_for(hint), False
    # bool is a subclass of int: check exact type, most specific first
    for py, st in _SCALARS.items():
        if hint is py:
            return st, False
    raise FloorTypeError(f"cannot map type hint {hint!r} to a Spark type")


def schema_for(cls) -> T.StructType:
    """Derive a Spark schema from a dataclass (autoschema analogue)."""
    if not dataclasses.is_dataclass(cls):
        raise FloorTypeError(f"{cls!r} is not a dataclass")
    hints = _hints(cls)
    fields = []
    for f in dataclasses.fields(cls):
        dt, nullable = _spark_type(hints[f.name])
        fields.append(T.StructField(_parquet_name(f), dt, nullable=nullable))
    return T.StructType(fields)


def _to_row(obj, cls):
    """Marshal one dataclass instance to a plain dict tree for Spark."""
    out = {}
    for f in dataclasses.fields(cls):
        v = getattr(obj, f.name)
        out[_parquet_name(f)] = _marshal_value(v)
    return out


def _marshal_value(v):
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return _to_row(v, type(v))
    if isinstance(v, (list, tuple)):
        return [_marshal_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _marshal_value(x) for k, x in v.items()}
    return v


@functools.lru_cache(maxsize=None)
def _hints(cls) -> dict:
    # get_type_hints re-evaluates annotation strings on every call;
    # cached per class so Reader iteration pays it once, not per row
    return typing.get_type_hints(cls)


def _from_row(d: dict, cls):
    """Unmarshal one recursive row dict into ``cls``."""
    hints = _hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        v = d.get(_parquet_name(f))
        kwargs[f.name] = _unmarshal_value(v, hints[f.name])
    return cls(**kwargs)


def _unmarshal_value(v, hint):
    import types as _types

    if v is None:
        return None
    origin = typing.get_origin(hint)
    if origin is typing.Union or origin is _types.UnionType:  # incl. PEP 604 X | None
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        return _unmarshal_value(v, args[0])
    if origin in (list, tuple):
        elem = typing.get_args(hint)[0]
        out = [_unmarshal_value(x, elem) for x in v]
        # a tuple-annotated field must come back a tuple, or equality and
        # hashability of the round-tripped dataclass silently break
        return tuple(out) if origin is tuple else out
    if origin is dict:
        k, val = typing.get_args(hint)
        return {kk: _unmarshal_value(vv, val) for kk, vv in v.items()}
    if dataclasses.is_dataclass(hint):
        return _from_row(v, hint)
    if hint is bytes and isinstance(v, bytearray):
        return bytes(v)
    return v


class Writer:
    """Buffered typed-object writer (floor ``NewFileWriter`` analogue).

    Objects accumulate in memory and flush through ``encode_table`` every
    ``batch_rows`` (and on :meth:`close`); each flush after the first is
    an ``append=True`` table version.  For bulk data, skip this class and
    call ``encode_table`` on a DataFrame — the buffer is driver-sided by
    design, sized for the reference's row-at-a-time application pattern.
    """

    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        cls=None,
        message_schema: str | None = None,
        batch_rows: int = 100_000,
        **encode_kwargs,
    ):
        if cls is None and message_schema is None:
            raise ValueError("Writer needs cls (a dataclass) or message_schema")
        self._spark = spark
        self._out = out_dir
        self._cls = cls
        self._schema = schema_for(cls) if cls is not None else None
        self._message = message_schema
        self._batch_rows = batch_rows
        self._kw = encode_kwargs
        self._buf: list = []
        self._flushed = False
        self._closed = False
        self._rows = 0

    def write(self, obj) -> None:
        if self._closed:
            raise RuntimeError("Writer is closed")
        if self._cls is not None:
            if not isinstance(obj, self._cls):
                raise FloorTypeError(f"expected {self._cls.__name__}, got {type(obj).__name__}")
            self._buf.append(_to_row(obj, self._cls))
        else:
            self._buf.append(dict(obj))
        self._rows += 1
        if len(self._buf) >= self._batch_rows:
            self._flush()

    def write_all(self, objs) -> None:
        for o in objs:
            self.write(o)

    def _flush(self) -> None:
        if not self._buf:
            return
        from .spark import manifest as mf
        from .spark.encode_job import encode_table

        if self._schema is not None:
            df = self._spark.createDataFrame(self._buf, schema=self._schema)
        else:
            from .schematext import parse_message

            df = self._spark.createDataFrame(
                self._buf, schema=parse_message(self._message).to_spark()
            )
        encode_table(
            df,
            self._out,
            message_schema=self._message,
            append=self._flushed,
            **self._kw,
        ).collect()
        mf.commit_snapshot(self._out, "floor.append" if self._flushed else "floor.write")
        self._buf = []
        self._flushed = True

    def close(self) -> int:
        """Flush remaining rows; returns the total row count written."""
        if not self._closed:
            self._flush()
            self._closed = True
        return self._rows

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if exc[0] is None:
            self.close()
        return False


class Reader:
    """Typed-object reader (floor ``NewFileReader`` analogue)."""

    def __init__(
        self,
        spark: SparkSession,
        enc_dir: str,
        cls=None,
        columns: list[str] | None = None,
        prune=None,
        as_of: int | None = None,
    ):
        self._spark = spark
        self._dir = enc_dir
        self._cls = cls
        self._columns = columns
        self._prune = prune
        self._as_of = as_of

    def dataframe(self) -> DataFrame:
        """The distributed view — prefer this for any bulk processing."""
        from .spark.decode_job import decode_table

        kw = {}
        if self._columns is not None:
            kw["columns"] = self._columns
        if self._prune is not None:
            kw["prune"] = self._prune
        if self._as_of is not None:
            kw["as_of"] = self._as_of
        return decode_table(self._spark, self._dir, **kw)

    def __iter__(self):
        df = self.dataframe()
        for row in df.toLocalIterator():
            d = row.asDict(recursive=True)
            yield _from_row(d, self._cls) if self._cls is not None else d
