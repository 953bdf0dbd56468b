"""Scalar jq functions for SQL/DataFrame use (the reference's
scalar-position usage, SURVEY §3.1, in UDF shape).

The UDTF is the full-fidelity surface (0..N rows); these cover the
common "extract one value" cases with less ceremony:

  jq_first(json, prog)   → first result as compact JSON text (NULL
                           if the stream is empty)
  jq_all(json, prog)     → all results as array<string> of JSON
  jq_matches(json, prog) → boolean: first result truthy (WHERE use)
  jq_long / jq_double / jq_string(json, prog)
                         → typed first result, Jackson-lenient (M6/M7/M2)

All are Arrow-batched pandas UDFs; programs are compile-once via the
engine's memo cache, so a constant program column costs one compile
per worker.  Parsed documents are memoized in a bounded per-worker
LRU so N scalar calls over the SAME json column in one projection
(e.g. jq_long(props,..) + jq_matches(props,..) + jq_string(props,..))
parse each document once, not N times — the UDFs run sequentially
over the same Arrow batch in one Python worker, so the second and
third calls hit the cache.  Cached values must be treated as
immutable; the evaluator is purely functional (assignment builds new
values), so sharing is safe."""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..jqlib import JQError, jq_compile
from ..jqlib.values import is_truthy, tojson
from ..marshal import _as_double, _as_long, _as_string
from ..udtf import parse_document

# sized to cover one default Arrow batch (10k rows) with headroom;
# bounded so huge corpora can't pin worker memory
_parse_cached = lru_cache(maxsize=16384)(parse_document)


def _first(json_str: Optional[str], prog_src: str):
    doc, err = _parse_cached(json_str)
    prog = jq_compile(prog_src)
    for out in prog.iter(doc, vars={"error": err}):
        return out
    return None


def _mk(fn, ret_type):
    def batch(js: pd.Series, prog: pd.Series) -> pd.Series:
        return pd.Series(
            [fn(j, p) for j, p in zip(js, prog)], dtype=object
        )

    return pandas_udf(ret_type)(batch)


def _jq_first(j, p):
    out = _first(j, p)
    return None if out is None else tojson(out)


def _jq_all(j, p):
    doc, err = _parse_cached(j)
    try:
        return [tojson(x) for x in jq_compile(p).iter(doc, vars={"error": err})]
    except JQError:
        return None


def _jq_matches(j, p):
    try:
        return is_truthy(_first(j, p))
    except JQError:
        return False


def _jq_long(j, p):
    out = _first(j, p)
    return None if out is None else _as_long(out)


def _jq_double(j, p):
    out = _first(j, p)
    return None if out is None else _as_double(out)


def _jq_string(j, p):
    out = _first(j, p)
    return None if out is None else _as_string(out)


jq_first = _mk(_jq_first, T.StringType())
jq_all = _mk(_jq_all, T.ArrayType(T.StringType()))
jq_matches = _mk(_jq_matches, T.BooleanType())
jq_long = _mk(_jq_long, T.LongType())
jq_double = _mk(_jq_double, T.DoubleType())
jq_string = _mk(_jq_string, T.StringType())


def register_functions(spark: SparkSession, prefix: str = "jq_") -> None:
    """Register the scalar family for SQL use."""
    spark.udf.register(prefix + "first", jq_first)
    spark.udf.register(prefix + "all", jq_all)
    spark.udf.register(prefix + "matches", jq_matches)
    spark.udf.register(prefix + "long", jq_long)
    spark.udf.register(prefix + "double", jq_double)
    spark.udf.register(prefix + "string", jq_string)
