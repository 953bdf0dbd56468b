"""Engine-free ports of the reference's 11 behavioral test cases
(JsonQueryUDTFTest.java:46-284 — behaviors re-pinned, not copied),
driven through the pure-library path like the reference's direct
invocation harness (SURVEY §5)."""

import pytest

from hive_jq_udtf_spark.udtf import JsonQueryError, run_jq


# testSingleColumn1 (:46-58): TYPE form, col1 naming, select+field program
def test_single_column_1():
    prog = '.timezones[] | select(.name == "Tokyo") | .offset'
    rows = run_jq(
        prog,
        '{"timezones": [{"name": "Tokyo", "offset": 540},'
        ' {"name": "Taipei", "offset": 480}]}',
        "int",
    )
    assert rows == [(540,)]


# testSingleColumn2 (:61-84): struct single column; binding + object
# construction; 1→3 fan-out; order preserved
def test_single_column_2():
    prog = '.region as $region | .timezones[] | {name: ($region + "/" + .name), offset}'
    rows = run_jq(
        prog,
        '{"region": "Asia", "timezones": [{"name": "Tokyo", "offset": 540},'
        ' {"name": "Taipei", "offset": 480}, {"name": "Seoul", "offset": 540}]}',
        "struct<name:string,offset:int>",
    )
    assert rows == [
        ({"name": "Asia/Tokyo", "offset": 540},),
        ({"name": "Asia/Taipei", "offset": 480},),
        ({"name": "Asia/Seoul", "offset": 540},),
    ]


# testMultiColumn (:87-111): NAME:TYPE destructuring
def test_multi_column():
    prog = '.timezones[]'
    rows = run_jq(
        prog,
        '{"timezones": [{"name": "Tokyo", "offset": 540}, {"name": "Taipei", "offset": 480}]}',
        "name:string",
        "offset:int",
    )
    assert rows == [("Tokyo", 540), ("Taipei", 480)]


# testSubstituteOnError (:114-125): $error + if/then/else substitute
def test_substitute_on_error():
    prog = 'if $error == null then .n else -1 end'
    assert run_jq(prog, '{"n": 7}', "int") == [(7,)]
    assert run_jq(prog, '{"n": broken', "int") == [(-1,)]


# testSkipOnError (:128-139): empty → zero rows on corrupt JSON
def test_skip_on_error():
    prog = 'if $error == null then .n else empty end'
    assert run_jq(prog, '{"n": 7}', "int") == [(7,)]
    assert run_jq(prog, 'not json at all', "int") == []


# testAbortOnError (:142-157): error($error.message) → abort carrying
# the parse message and offending input
def test_abort_on_error():
    prog = 'if $error == null then .n else error($error.message) end'
    assert run_jq(prog, '{"n": 7}', "int") == [(7,)]
    with pytest.raises(JsonQueryError) as ei:
        run_jq(prog, '{{{', "int")
    assert "{{{" in str(ei.value)


# testTypes (:160-194): all 9 supported types incl. nested + boundaries
def test_types():
    prog = "."
    doc = (
        '{"s": "text", "i": 2147483647, "b": 9223372036854775807,'
        ' "d": 1.5, "f": 0.25, "bool": true,'
        ' "st": {"x": 1}, "m": {"k": 10}, "a": [1, 2]}'
    )
    rows = run_jq(
        prog,
        doc,
        "s:string",
        "i:int",
        "b:bigint",
        "d:double",
        "f:float",
        "bool:boolean",
        "st:struct<x:int>",
        "m:map<string,int>",
        "a:array<int>",
    )
    assert rows == [
        ("text", 2147483647, 9223372036854775807, 1.5, 0.25, True, {"x": 1}, {"k": 10}, [1, 2])
    ]


# testNullOutputs (:197-227): JSON null → SQL NULL for every type,
# incl. null inside nested struct
def test_null_outputs():
    doc = '{"s": null, "i": null, "st": {"x": null}, "a": null, "m": null}'
    rows = run_jq(
        ".", doc, "s:string", "i:int", "st:struct<x:int>", "a:array<int>", "m:map<string,int>"
    )
    assert rows == [(None, None, {"x": None}, None, None)]


# testMoreOnStringOutputConversions (:230-248): M2 stringify-object
# rule; null→NULL; plain text passthrough
def test_string_output_conversions():
    assert run_jq(".x", '{"x": {"a": 1}}', "string") == [('{"a":1}',)]
    assert run_jq(".x", '{"x": [1,2]}', "string") == [("[1,2]",)]
    assert run_jq(".x", '{"x": 12}', "string") == [("12",)]
    assert run_jq(".x", '{"x": true}', "string") == [("true",)]
    assert run_jq(".x", '{"x": null}', "string") == [(None,)]
    assert run_jq(".x", '{"x": "plain"}', "string") == [("plain",)]


# testNullInputs (:251-266): NULL / "null" input → one row with NULL
# (identity still emits — NULL input ≠ zero rows)
def test_null_inputs():
    assert run_jq(".", None, "string") == [(None,)]
    assert run_jq(".", "null", "string") == [(None,)]
    assert run_jq(".", None, "int") == [(None,)]


# testMissingFieldsInConversions (:269-284): missing declared field →
# NULL, other fields unaffected
def test_missing_fields():
    rows = run_jq(".", '{"name": "Tokyo"}', "name:string", "offset:int")
    assert rows == [("Tokyo", None)]
    rows = run_jq(".x", '{"x": {"a": 5}}', "st:struct<a:int,b:string>")
    assert rows == [(None,)]  # .x destructured by name "st" → missing
    rows = run_jq("{st: .x}", '{"x": {"a": 5}}', "st:struct<a:int,b:string>")
    assert rows == [({"a": 5, "b": None},)]


# M6/M8 leniency (D1): non-coercible → 0/false, NOT NULL
def test_lenient_coercions():
    assert run_jq(".x", '{"x": "123"}', "int") == [(123,)]
    assert run_jq(".x", '{"x": "12.9"}', "int") == [(12,)]
    assert run_jq(".x", '{"x": "abc"}', "int") == [(0,)]
    assert run_jq(".x", '{"x": true}', "int") == [(1,)]
    assert run_jq(".x", '{"x": 1.9}', "int") == [(1,)]
    assert run_jq(".x", '{"x": "true"}', "boolean") == [(True,)]
    assert run_jq(".x", '{"x": "yes"}', "boolean") == [(False,)]
    assert run_jq(".x", '{"x": 5}', "boolean") == [(True,)]
    assert run_jq(".x", '{"x": "2.5"}', "double") == [(2.5,)]
    assert run_jq(".x", '{"x": "abc"}', "double") == [(0.0,)]
    assert run_jq(".x", '{"x": [1]}', "int") == [(0,)]


def test_single_vs_multi_dispatch():
    # single bare TYPE → whole result wrapped (M10)
    assert run_jq('{"a": 1}', "null", "map<string,int>") == [({"a": 1},)]
    # single NAME:TYPE → destructure mode
    assert run_jq('{"a": 1}', "null", "a:int") == [(1,)]


# Jackson elements()-iteration parity (ADVICE r1): an OBJECT marshalled
# as array<T> becomes the list of its field values (ObjectNode.elements()
# iterates values); scalar nodes have an empty elements() iterator → []
def test_object_to_array_marshals_values():
    assert run_jq(".x", '{"x": {"a": 1, "b": 2}}', "array<int>") == [([1, 2],)]
    assert run_jq(".x", '{"x": 5}', "array<int>") == [([],)]
    assert run_jq(".", '{"arr": {"a": 3}}', "arr:array<int>") == [([3],)]


# SURVEY §7 D2 extension (beyond-reference): decimal/date/timestamp/
# binary declared types behind extended=True; off by default so the
# reference's whitelist still governs
def test_extended_types_gate_and_marshalling():
    import datetime as dt
    from decimal import Decimal

    import pytest as _pytest

    from hive_jq_udtf_spark.schema import SchemaDeclarationError

    with _pytest.raises(Exception):
        run_jq(".", '{"d": "2026-01-02"}', "d:date")  # gated off by default
    doc = (
        '{"d": "2026-01-02", "t": "2026-01-02T08:30:00Z",'
        ' "p": "12.345", "neg": "-0.005", "junk": "x"}'
    )
    rows = run_jq(
        ".", doc, "d:date", "t:timestamp", "p:decimal(12,2)", "junk:decimal(4,1)",
        extended=True,
    )
    d, t, p, junk = rows[0]
    assert d == dt.date(2026, 1, 2)
    assert t.replace(tzinfo=None) == dt.datetime(2026, 1, 2, 8, 30)
    assert p == Decimal("12.34")  # banker's rounding at scale 2
    assert junk is None  # non-numeric → NULL, never an error
