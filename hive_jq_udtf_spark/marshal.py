"""Typed marshalling: jq JSON results → Spark row values.

From-scratch reimplementation of the reference's
ResultObjectMarshaller (ResultObjectMarshaller.java:35-97), keeping
its **Jackson-lenient** coercion rules (SURVEY §2.4, decision D1):

  M1  JSON null / missing field            → SQL NULL (any type)
  M2  string target: text passes through; non-text serializes to
      compact JSON ("stringify anything", load-bearing for the
      single-TYPE form, README.md:74-81)
  M3  struct: recurse by declared field name; extra fields dropped,
      missing → NULL; non-object input → all fields NULL
  M4  map<string,V>: iterate object entries; non-object → empty map
  M5  array<T>: element-wise recurse; non-array → empty array
  M6  int/bigint: lenient asInt/asLong — numeric strings parse,
      bool → 1/0, non-coercible → 0 (NOT NULL), doubles truncate
  M7  float/double: lenient asDouble; float narrows to fp32
  M8  boolean: lenient asBoolean ("true"/"false" strings parse,
      non-coercible → false)
  M10 single-TYPE form wraps the whole result into one column

Converters are built once per schema (compile-time, mirroring the
reference's ObjectInspector tree) and applied per row.
"""

from __future__ import annotations

import base64
import datetime as _dt
import math
import struct as _struct
from decimal import Decimal, InvalidOperation
from typing import Any, Callable, Optional

from pyspark.sql import types as T

from .jqlib.values import tojson

Converter = Callable[[Any], Any]

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1
_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


def _wrap32(v: int) -> int:
    if _INT32_MIN <= v <= _INT32_MAX:
        return v
    return ((v + 2**31) % 2**32) - 2**31


def _wrap64(v: int) -> int:
    if _INT64_MIN <= v <= _INT64_MAX:
        return v
    return ((v + 2**63) % 2**64) - 2**63


def _as_long(j: Any) -> int:
    # Jackson asLong() leniency (ResultObjectMarshaller.java:88-90)
    if isinstance(j, bool):
        return 1 if j else 0
    if isinstance(j, int):
        return _wrap64(j)
    if isinstance(j, float):
        if math.isnan(j) or math.isinf(j):
            return 0
        return _wrap64(int(j))
    if isinstance(j, str):
        s = j.strip()
        try:
            return _wrap64(int(s))
        except ValueError:
            try:
                f = float(s)
                if math.isnan(f) or math.isinf(f):
                    return 0
                return _wrap64(int(f))
            except ValueError:
                return 0
    return 0


def _as_int(j: Any) -> int:
    return _wrap32(_as_long(j))


def _as_double(j: Any) -> float:
    # Jackson asDouble() leniency (ResultObjectMarshaller.java:82-87)
    if isinstance(j, bool):
        return 1.0 if j else 0.0
    if isinstance(j, (int, float)):
        return float(j)
    if isinstance(j, str):
        try:
            return float(j.strip())
        except ValueError:
            return 0.0
    return 0.0


def _as_float(j: Any) -> float:
    # (float) narrowing (ResultObjectMarshaller.java:85-87)
    return _struct.unpack("f", _struct.pack("f", _as_double(j)))[0]


def _as_boolean(j: Any) -> bool:
    # Jackson asBoolean() leniency (ResultObjectMarshaller.java:91-93)
    if isinstance(j, bool):
        return j
    if isinstance(j, int):
        return j != 0
    if isinstance(j, float):
        return j != 0.0
    if isinstance(j, str):
        s = j.strip().lower()
        if s == "true":
            return True
        return False
    return False


def _as_string(j: Any) -> str:
    # M2: text passes through; anything else → compact JSON
    if isinstance(j, str):
        return j
    return tojson(j)


def _as_date(j: Any) -> Optional[_dt.date]:
    if isinstance(j, str):
        try:
            return _dt.date.fromisoformat(j.strip()[:10])
        except ValueError:
            return None
    if isinstance(j, (int, float)) and not isinstance(j, bool):
        return _dt.datetime.fromtimestamp(float(j), _dt.timezone.utc).date()
    return None


def _as_timestamp(j: Any) -> Optional[_dt.datetime]:
    if isinstance(j, str):
        s = j.strip().replace("Z", "+00:00")
        try:
            return _dt.datetime.fromisoformat(s)
        except ValueError:
            return None
    if isinstance(j, (int, float)) and not isinstance(j, bool):
        return _dt.datetime.fromtimestamp(float(j), _dt.timezone.utc).replace(tzinfo=None)
    return None


def _as_binary(j: Any) -> Optional[bytes]:
    if isinstance(j, str):
        try:
            return base64.b64decode(j + "=" * (-len(j) % 4))
        except Exception:
            return j.encode("utf-8")
    return None


def _as_decimal_factory(dt: T.DecimalType) -> Converter:
    q = Decimal(1).scaleb(-dt.scale)

    def conv(j: Any) -> Optional[Decimal]:
        try:
            if isinstance(j, bool):
                return Decimal(1 if j else 0).quantize(q)
            if isinstance(j, (int, float, str)):
                return Decimal(str(j).strip()).quantize(q)
        except (InvalidOperation, ValueError):
            return None
        return None

    return conv


def build_converter(dt: T.DataType) -> Converter:
    """Build a null-preserving converter for one declared type (M1
    handled here: JSON null → SQL NULL for every type)."""
    inner = _build_nonnull(dt)

    def conv(j: Any) -> Any:
        if j is None:
            return None
        return inner(j)

    return conv


def _build_nonnull(dt: T.DataType) -> Converter:
    if isinstance(dt, T.StringType):
        return _as_string
    if isinstance(dt, T.IntegerType):
        return _as_int
    if isinstance(dt, T.LongType):
        return _as_long
    if isinstance(dt, T.DoubleType):
        return _as_double
    if isinstance(dt, T.FloatType):
        return _as_float
    if isinstance(dt, T.BooleanType):
        return _as_boolean
    if isinstance(dt, T.ByteType):
        return lambda j: ((_as_int(j) + 128) % 256) - 128
    if isinstance(dt, T.ShortType):
        return lambda j: ((_as_int(j) + 32768) % 65536) - 32768
    if isinstance(dt, T.DateType):
        return _as_date
    if isinstance(dt, T.TimestampType):
        return _as_timestamp
    if isinstance(dt, T.BinaryType):
        return _as_binary
    if isinstance(dt, T.DecimalType):
        return _as_decimal_factory(dt)
    if isinstance(dt, T.StructType):
        fields = [(f.name, build_converter(f.dataType)) for f in dt.fields]

        def conv_struct(j: Any) -> dict:
            # M3: recurse by name; non-object → all-NULL fields
            if isinstance(j, dict):
                return {name: c(j.get(name)) for name, c in fields}
            return {name: None for name, _c in fields}

        return conv_struct
    if isinstance(dt, T.ArrayType):
        elem = build_converter(dt.elementType)

        def conv_array(j: Any) -> list:
            # M5: element-wise.  Reference parity (Jackson): an OBJECT
            # marshalled as array<T> becomes the list of its field
            # values (ObjectNode.elements() iterates values); any other
            # non-array → empty array (elements() is an empty iterator
            # for scalar nodes).
            if isinstance(j, list):
                return [elem(x) for x in j]
            if isinstance(j, dict):
                return [elem(x) for x in j.values()]
            return []

        return conv_array
    if isinstance(dt, T.MapType):
        val = build_converter(dt.valueType)

        def conv_map(j: Any) -> dict:
            # M4: object entries; non-object → empty map
            if isinstance(j, dict):
                return {str(k): val(v) for k, v in j.items()}
            return {}

        return conv_map
    raise ValueError(f"unsupported type: {dt.simpleString()}")  # M9 unreachable


class RowMarshaller:
    """jq result value → output row tuple (D6/D7/M10).

    single=True: whole result into one column (``TYPE`` form).
    single=False: destructure top-level object fields by declared
    column name (``NAME:TYPE`` form).
    """

    __slots__ = ("schema", "single", "_converters", "_names")

    def __init__(self, schema: T.StructType, single: bool):
        self.schema = schema
        self.single = single
        self._names = [f.name for f in schema.fields]
        self._converters = [build_converter(f.dataType) for f in schema.fields]

    def marshal(self, result: Any) -> tuple:
        if self.single:
            return (self._converters[0](result),)
        if isinstance(result, dict):
            return tuple(c(result.get(n)) for n, c in zip(self._names, self._converters))
        return tuple(None for _ in self._names)
