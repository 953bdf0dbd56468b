"""JSON value model helpers: typing, ordering, truthiness, serialization.

jq's value universe is exactly JSON: null, boolean, number, string,
array, object.  We represent these as native Python values
(None/bool/int/float/str/list/dict), matching what ``json.loads``
produces — the same choice the reference makes with Jackson
``JsonNode`` trees (SURVEY §1.1).

jq defines a *total order* over all values (null < false < true <
numbers < strings < arrays < objects) used by ``sort``, ``min``,
``<`` etc.; implemented here as ``cmp_values``.
"""

from __future__ import annotations

import json
import math
from typing import Any

# Order of jq types in the total order.
_TYPE_ORDER = {
    "null": 0,
    "false": 1,
    "true": 2,
    "number": 3,
    "string": 4,
    "array": 5,
    "object": 6,
}


def typename(v: Any) -> str:
    """jq ``type``: one of null/boolean/number/string/array/object."""
    if v is None:
        return "null"
    if v is True or v is False:
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {v!r}")


def _order_key(v: Any) -> int:
    if v is None:
        return 0
    if v is False:
        return 1
    if v is True:
        return 2
    if isinstance(v, (int, float)):
        return 3
    if isinstance(v, str):
        return 4
    if isinstance(v, list):
        return 5
    return 6


def cmp_values(a: Any, b: Any) -> int:
    """Total-order compare: -1 / 0 / 1."""
    ka, kb = _order_key(a), _order_key(b)
    if ka != kb:
        return -1 if ka < kb else 1
    if ka in (0, 1, 2):  # null / false / true — equal within kind
        return 0
    if ka == 3:
        # NaN sorts before everything among numbers (jq: NaN < any number)
        a_nan = isinstance(a, float) and math.isnan(a)
        b_nan = isinstance(b, float) and math.isnan(b)
        if a_nan and b_nan:
            return 0
        if a_nan:
            return -1
        if b_nan:
            return 1
        return -1 if a < b else (1 if a > b else 0)
    if ka == 4:
        return -1 if a < b else (1 if a > b else 0)
    if ka == 5:
        for x, y in zip(a, b):
            c = cmp_values(x, y)
            if c:
                return c
        return -1 if len(a) < len(b) else (1 if len(a) > len(b) else 0)
    # objects: compare sorted key arrays first, then values in key order
    akeys, bkeys = sorted(a.keys()), sorted(b.keys())
    c = cmp_values(akeys, bkeys)
    if c:
        return c
    for k in akeys:
        c = cmp_values(a[k], b[k])
        if c:
            return c
    return 0


def values_equal(a: Any, b: Any) -> bool:
    return cmp_values(a, b) == 0


def is_truthy(v: Any) -> bool:
    """jq truthiness: only ``false`` and ``null`` are falsy."""
    return v is not None and v is not False


class SortKey:
    """functools-free adapter so lists sort by jq total order."""

    __slots__ = ("v",)

    def __init__(self, v: Any):
        self.v = v

    def __lt__(self, other: "SortKey") -> bool:
        return cmp_values(self.v, other.v) < 0

    def __eq__(self, other: object) -> bool:
        return isinstance(other, SortKey) and cmp_values(self.v, other.v) == 0


def canonical_number(v: float | int) -> int | float:
    """jq prints integral floats without the fraction (3.0 -> 3)."""
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return v
        if v.is_integer() and abs(v) < 1e17:
            return int(v)
    return v


def _default(o: Any) -> Any:  # pragma: no cover - json hook
    raise TypeError(f"not JSON serializable: {o!r}")


def _prepare(v: Any) -> Any:
    """Recursively canonicalize numbers for serialization."""
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return None  # jq serializes nan as null
        if math.isinf(v):
            # jq clamps infinities to the largest double
            return 1.7976931348623157e308 if v > 0 else -1.7976931348623157e308
        return canonical_number(v)
    if isinstance(v, int):
        return v
    if isinstance(v, list):
        return [_prepare(x) for x in v]
    if isinstance(v, dict):
        return {k: _prepare(x) for k, x in v.items()}
    return v


def tojson(v: Any) -> str:
    """Compact JSON serialization matching jq's ``tojson`` output.

    Object key order is preserved (insertion order), like jq's
    ``keys_unsorted`` view of objects and Jackson's serialization in
    the reference marshaller (ResultObjectMarshaller.java:50-51).
    """
    return json.dumps(_prepare(v), separators=(",", ":"), ensure_ascii=False, default=_default)


def tostring(v: Any) -> str:
    """jq ``tostring``: strings pass through, others serialize."""
    if isinstance(v, str):
        return v
    return tojson(v)


def parse_json(text: str, strict: bool = True) -> Any:
    """Parse one JSON document; rejects trailing garbage like the
    reference's strict mapper (JsonQueryUDTF.java:61,83-87).

    ``strict=False`` additionally allows unquoted control characters
    inside strings (Jackson ALLOW_UNQUOTED_CONTROL_CHARS analog).
    """
    return json.loads(text, strict=strict)
