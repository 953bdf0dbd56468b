"""Output-schema declaration parsing (reference: ObjectInspectors.java).

The reference parses Hive type strings with Hive's own grammar and
whitelists 9 types (ObjectInspectors.java:23-59; closed list in
README.md:181-184).  Spark's DDL parser accepts the identical surface
syntax, so the whole file collapses to a parse + whitelist check
(SURVEY §1.2).

Two declaration forms (JsonQueryUDTF.java:178-194, README.md:35-38):
  * ``jq(json, prog, 'TYPE')``            → single column named col1
  * ``jq(json, prog, 'name:type', ...)``  → N named columns; the
    first arg may omit the name (→ col1), later args may not.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# name pattern from JsonQueryUDTF.java:160 — ^([a-zA-Z_][a-zA-Z0-9_]*):[a-zA-Z_].*
_NAME_AND_TYPE = re.compile(r"^([a-zA-Z_][a-zA-Z0-9_]*)\s*:\s*([a-zA-Z_].*)$")

_ALLOWED_ATOMIC = (
    T.StringType,
    T.IntegerType,
    T.DoubleType,
    T.FloatType,
    T.LongType,
    T.BooleanType,
)

# Extension beyond the reference's whitelist (SURVEY §7 D2), disabled
# by default so behavior matches the reference; enable via
# parse_output_schema(..., extended=True).
_EXTENDED_ATOMIC = (
    T.ByteType,
    T.ShortType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.BinaryType,
)


class SchemaDeclarationError(ValueError):
    """Invalid TYPE / NAME:TYPE declaration (reference:
    UDFArgumentException from ObjectInspectors.java:57-58)."""


def _check_type(dt: T.DataType, extended: bool) -> None:
    allowed = _ALLOWED_ATOMIC + (_EXTENDED_ATOMIC if extended else ())
    if isinstance(dt, allowed):
        return
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            _check_type(f.dataType, extended)
        return
    if isinstance(dt, T.ArrayType):
        _check_type(dt.elementType, extended)
        return
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise SchemaDeclarationError(
                f"unsupported map key type: {dt.keyType.simpleString()} (only string keys, README.md:184)"
            )
        _check_type(dt.valueType, extended)
        return
    raise SchemaDeclarationError(f"unsupported type: {dt.simpleString()}")


_ATOMIC_TYPES = {
    "string": T.StringType,
    "int": T.IntegerType,
    "integer": T.IntegerType,
    "double": T.DoubleType,
    "float": T.FloatType,
    "real": T.FloatType,
    "bigint": T.LongType,
    "long": T.LongType,
    "boolean": T.BooleanType,
    "tinyint": T.ByteType,
    "byte": T.ByteType,
    "smallint": T.ShortType,
    "short": T.ShortType,
    "date": T.DateType,
    "timestamp": T.TimestampType,
    "binary": T.BinaryType,
}


class _TypeParser:
    """Recursive-descent parser for Hive/Spark DDL type strings —
    the pure-Python analog of ObjectInspectors.java:62-77 (which
    drives Hive's ANTLR grammar).  JVM-free so the library layer
    works without a SparkSession."""

    def __init__(self, src: str):
        self.src = src
        self.i = 0

    def _skip_ws(self):
        while self.i < len(self.src) and self.src[self.i].isspace():
            self.i += 1

    def _word(self) -> str:
        self._skip_ws()
        j = self.i
        while j < len(self.src) and (self.src[j].isalnum() or self.src[j] == "_"):
            j += 1
        w = self.src[self.i : j]
        self.i = j
        return w.lower()

    def _expect(self, ch: str):
        self._skip_ws()
        if self.i >= len(self.src) or self.src[self.i] != ch:
            raise SchemaDeclarationError(
                f"invalid type {self.src!r}: expected {ch!r} at {self.i}"
            )
        self.i += 1

    def _peek(self) -> str:
        self._skip_ws()
        return self.src[self.i] if self.i < len(self.src) else ""

    def parse(self) -> T.DataType:
        dt = self._type()
        self._skip_ws()
        if self.i != len(self.src):
            raise SchemaDeclarationError(
                f"invalid type {self.src!r}: trailing {self.src[self.i:]!r}"
            )
        return dt

    def _type(self) -> T.DataType:
        w = self._word()
        if not w:
            raise SchemaDeclarationError(f"invalid type {self.src!r}")
        if w in _ATOMIC_TYPES:
            return _ATOMIC_TYPES[w]()
        if w == "decimal":
            prec, scale = 10, 0
            if self._peek() == "(":
                self._expect("(")
                prec = int(self._word())
                if self._peek() == ",":
                    self._expect(",")
                    scale = int(self._word())
                self._expect(")")
            return T.DecimalType(prec, scale)
        if w == "array":
            self._expect("<")
            elem = self._type()
            self._expect(">")
            return T.ArrayType(elem)
        if w == "map":
            self._expect("<")
            k = self._type()
            self._expect(",")
            v = self._type()
            self._expect(">")
            return T.MapType(k, v)
        if w == "struct":
            self._expect("<")
            fields = []
            while True:
                name = self._field_name()
                self._expect(":")
                fields.append(T.StructField(name, self._type()))
                if self._peek() == ",":
                    self._expect(",")
                    continue
                break
            self._expect(">")
            return T.StructType(fields)
        raise SchemaDeclarationError(f"unsupported type: {w}")

    def _field_name(self) -> str:
        self._skip_ws()
        if self._peek() == "`":
            self.i += 1
            j = self.src.index("`", self.i)
            name = self.src[self.i : j]
            self.i = j + 1
            return name
        j = self.i
        while j < len(self.src) and (self.src[j].isalnum() or self.src[j] == "_"):
            j += 1
        name = self.src[self.i : j]
        if not name:
            raise SchemaDeclarationError(f"invalid type {self.src!r}: field name expected")
        self.i = j
        return name


def parse_type(type_str: str, extended: bool = False) -> T.DataType:
    """Parse one Hive/Spark type string (``struct<a:int,b:string>``...)."""
    dt = _TypeParser(type_str).parse()
    _check_type(dt, extended)
    return dt


def parse_output_schema(
    decls: list[str], extended: bool = False
) -> tuple[T.StructType, bool]:
    """Parse the declaration args into (schema, single_column_mode).

    single_column_mode=True reproduces the ``TYPE`` form: the whole jq
    result marshals into one auto-named ``col1`` column
    (JsonQueryUDTF.java:188-190; M10).  Otherwise each declaration is
    ``name:type`` — except the first, which may omit the name
    (requireName = i > 0, JsonQueryUDTF.java:183).
    """
    if not decls:
        raise SchemaDeclarationError("at least one type declaration is required")
    fields: list[T.StructField] = []
    single = False
    for i, raw in enumerate(decls):
        if raw is None:
            raise SchemaDeclarationError(f"type declaration #{i + 1} must be a constant string")
        m = _NAME_AND_TYPE.match(raw.strip())
        looks_named = m is not None and _is_valid_type(m.group(2), extended)
        if looks_named:
            fields.append(T.StructField(m.group(1), parse_type(m.group(2), extended)))
        else:
            if i > 0:
                # later args must carry a name (JsonQueryUDTF.java:171)
                raise SchemaDeclarationError(
                    f"column name is required in declaration #{i + 1}: {raw!r}"
                )
            dt = parse_type(raw, extended)
            if len(decls) == 1:
                single = True
            fields.append(T.StructField("col1", dt))
    return T.StructType(fields), single


def _is_valid_type(type_str: str, extended: bool) -> bool:
    try:
        parse_type(type_str, extended)
        return True
    except SchemaDeclarationError:
        return False
