"""jqlib — a from-scratch jq-1.5 expression engine in pure Python.

This is layer (A) of the PySpark engine (SURVEY §0): the replacement
for the reference's embedded jackson-jq dependency.  Usable with no
SparkSession (mirrors the reference's engine-free unit-test layer,
JsonQueryUDTFTest.java:22-33).

>>> from hive_jq_udtf_spark.jqlib import jq_compile
>>> jq_compile('.a[] | select(. > 1)')({"a": [1, 2, 3]})
[2, 3]
"""

from .errors import JQError, JQHalt, JQSyntaxError
from .evaluator import JQProgram, jq_compile, set_env_access
from .values import parse_json, tojson, tostring

__all__ = [
    "JQError",
    "JQHalt",
    "JQSyntaxError",
    "JQProgram",
    "jq_compile",
    "set_env_access",
    "parse_json",
    "tojson",
    "tostring",
]
