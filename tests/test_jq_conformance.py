"""Table-driven jq conformance corpus (SURVEY §5 item 3): cases
written against the public jq-1.5 manual semantics for every §2.2
construct group (J1–J26)."""

import math

import pytest

from hive_jq_udtf_spark.jqlib import JQError, JQSyntaxError, jq_compile

# (program, input, expected output stream)
CASES = [
    # J1-J5: identity, field access, iteration, pipe
    (".", {"a": 1}, [{"a": 1}]),
    (".a", {"a": {"b": 5}}, [{"b": 5}]),
    (".a.b", {"a": {"b": 5}}, [5]),
    (".a", {}, [None]),
    (".a", None, [None]),
    (".a[]", {"a": [1, 2, 3]}, [1, 2, 3]),
    (".[]", {"x": 1, "y": 2}, [1, 2]),
    (".a | .b", {"a": {"b": 9}}, [9]),
    # J6-J7: select, equality
    (".[] | select(.x == 1)", [{"x": 1}, {"x": 2}], [{"x": 1}]),
    ("select(. == null)", None, [None]),
    ('select(. != "a")', "b", ["b"]),
    ("1 == 1.0", None, [True]),
    ('[1, "1"] | .[0] == .[1]', None, [False]),
    ('{"a":1,"b":2} == {"b":2,"a":1}', None, [True]),
    # J8-J9: variables
    (".a as $x | .b + $x", {"a": 1, "b": 2}, [3]),
    ("(.[] | select(. > 1)) as $x | $x * 10", [1, 2, 3], [20, 30]),
    ("$__loc__", None, [{"file": "<top-level>", "line": 1}]),
    # J10: object construction
    ("{a: 1}", None, [{"a": 1}]),
    ("{a}", {"a": 7, "b": 8}, [{"a": 7}]),
    ('{"x": .a}', {"a": 2}, [{"x": 2}]),
    ("{(.k): .v}", {"k": "key", "v": 3}, [{"key": 3}]),
    ('{a: 1, b: (2, 3)}', None, [{"a": 1, "b": 2}, {"a": 1, "b": 3}]),
    ("{$__loc__}", None, [{"__loc__": {"file": "<top-level>", "line": 1}}]),
    # J11: + polymorphism
    ("1 + 2", None, [3]),
    ('"a" + "b"', None, ["ab"]),
    ("[1] + [2]", None, [[1, 2]]),
    ('{"a":1} + {"b":2}', None, [{"a": 1, "b": 2}]),
    ('{"a":1} + {"a":2}', None, [{"a": 2}]),
    ("null + 5", None, [5]),
    ('"x" + null', None, ["x"]),
    # J12: if/elif/else
    ("if . then 1 else 2 end", True, [1]),
    ("if . then 1 else 2 end", None, [2]),
    ("if . == 0 then 'z' elif . == 1 then 1 else 2 end".replace("'z'", '"z"'), 0, ["z"]),
    ("if . then 1 end", False, [False]),  # missing else = identity
    ("if (true, false) then 1 else 2 end", None, [1, 2]),
    # J13-J14: empty, error
    ("empty", 1, []),
    ("[1, empty, 2]", None, [[1, 2]]),
    # J15: literals
    ("1.5", None, [1.5]),
    ("1e3", None, [1000.0]),
    ('"s"', None, ["s"]),
    ("true, false, null", None, [True, False, None]),
    ("[1, [2]]", None, [[1, [2]]]),
    ('{"a": {"b": [1]}}', None, [{"a": {"b": [1]}}]),
    # J16: access variants
    ('.["key"]', {"key": 1}, [1]),
    (".[0]", [9, 8], [9]),
    (".[-1]", [9, 8], [8]),
    (".[5]", [9, 8], [None]),
    (".[1:3]", [0, 1, 2, 3], [[1, 2]]),
    (".[:2]", [0, 1, 2], [[0, 1]]),
    (".[1:]", "abc", ["bc"]),
    (".a?", 5, []),
    (".[]?", 5, []),
    ('."quoted key"', {"quoted key": 1}, [1]),
    ("..", [1], [[1], 1]),
    ("getpath([\"a\",\"b\"])", {"a": {"b": 2}}, [2]),
    ("getpath([\"a\",\"x\"])", {"a": {}}, [None]),
    ("[paths]", [1, [2]], [[[0], [1], [1, 0]]]),
    ("[leaf_paths]", {"a": {"b": 1}}, [[["a", "b"]]]),
    # J17: arithmetic
    ("5 - 3", None, [2]),
    ("2 * 3", None, [6]),
    ("10 / 4", None, [2.5]),
    ("10 / 5", None, [2]),
    ("7 % 3", None, [1]),
    ("-7 % 3", None, [-1]),
    ("[1,2,3] - [2]", None, [[1, 3]]),
    ('"a,b,c" / ","', None, [["a", "b", "c"]]),
    ('{"a":{"x":1}} * {"a":{"y":2}}', None, [{"a": {"x": 1, "y": 2}}]),
    # J18: boolean
    ("true and false", None, [False]),
    ("null and true", None, [False]),
    ("1 and 2", None, [True]),
    ("false or 1", None, [True]),
    ("true | not", None, [False]),
    ("null | not", None, [True]),
    # J19: alternative, try/catch
    (".a // 1", {}, [1]),
    ("(false, 1, null, 2) // 3", None, [1, 2]),
    ("(false, null) // 3", None, [3]),
    ("try error(\"x\") catch .", None, ["x"]),
    ("try .a", 5, []),
    ("(1 | .a) // 9", None, [9]),
    ('.[] | .a?', [1, {"a": 2}], [2]),
    ("try (1/0) catch .", None, None),  # error message text unpinned
    # J20: comma
    ("1, 2", None, [1, 2]),
    ("(1, 2) + (10, 20)", None, [11, 12, 21, 22]),
    # J21: array/object functions
    ("length", [1, 2], [2]),
    ("length", "ab", [2]),
    ("length", {"a": 1}, [1]),
    ("length", None, [0]),
    ("length", -5, [5]),
    ("utf8bytelength", "ä", [2]),
    ("keys", {"b": 1, "a": 2}, [["a", "b"]]),
    ("keys_unsorted", {"b": 1, "a": 2}, [["b", "a"]]),
    ("keys", [5, 6], [[0, 1]]),
    ('has("a")', {"a": None}, [True]),
    ("has(1)", [9, 8], [True]),
    ("has(2)", [9, 8], [False]),
    ('. as $x | "a" | in($x)', {"a": 1}, [True]),
    ('contains([2])', [1, 2, 3], [True]),
    ('contains({a: 1})', {"a": 1, "b": 2}, [True]),
    ('[1] | inside([1, 2])', None, [True]),
    ("add", [1, 2], [3]),
    ("add", [], [None]),
    ("add", ["a", "b"], ["ab"]),
    ("any", [false_ := False, True], [True]),
    ("any", [], [False]),
    ("all", [True, True], [True]),
    ("all", [], [True]),
    ("any(. > 2)", [1, 3], [True]),
    ("all(. > 2)", [1, 3], [False]),
    ("flatten", [[1], [[2]]], [[1, 2]]),
    ("flatten(1)", [[1], [[2]]], [[1, [2]]]),
    ("[range(3)]", None, [[0, 1, 2]]),
    ("[range(1; 4)]", None, [[1, 2, 3]]),
    ("[range(0; 10; 3)]", None, [[0, 3, 6, 9]]),
    ("[range(5; 0; -2)]", None, [[5, 3, 1]]),
    ("reverse", [1, 2], [[2, 1]]),
    ("sort", [3, None, 1], [[None, 1, 3]]),
    ('sort', [[1], "a", 1, {"a":1}, True, None], [[None, True, 1, "a", [1], {"a": 1}]]),
    ("sort_by(-.)", [1, 3, 2], [[3, 2, 1]]),
    ("group_by(. % 2) | map(sort)", [1, 2, 3, 4], [[[2, 4], [1, 3]]]),
    ("unique", [2, 1, 2], [[1, 2]]),
    ("unique_by(length)", ["a", "bb", "c"], [["a", "bb"]]),
    ("min", [], [None]),
    ("max", [3, 1], [3]),
    ("min_by(.a)", [{"a": 2}, {"a": 1}], [{"a": 1}]),
    ("max_by(.a)", [{"a": 2}, {"a": 1}], [{"a": 2}]),
    ("to_entries", {"a": 1, "b": 2}, [[{"key": "a", "value": 1}, {"key": "b", "value": 2}]]),
    ("from_entries", [{"k": "a", "v": 1}], [{"a": 1}]),
    ("from_entries", [{"name": "a", "value": 1}], [{"a": 1}]),
    ("with_entries(.value += 1)", {"a": 1}, [{"a": 2}]),
    ("map(. * 2)", [1, 2], [[2, 4]]),
    ("map_values(. + 1)", {"a": 1, "b": 2}, [{"a": 2, "b": 3}]),
    ("del(.a)", {"a": 1, "b": 2}, [{"b": 2}]),
    ("del(.[1])", [1, 2, 3], [[1, 3]]),
    ("del(.[0], .[2])", [1, 2, 3], [[2]]),
    ("delpaths([[\"a\"],[\"b\",0]])", {"a": 1, "b": [9, 8]}, [{"b": [8]}]),
    ("setpath([\"a\", 0]; 9)", {}, [{"a": [9]}]),
    ("[limit(2; .[])]", [1, 2, 3], [[1, 2]]),
    ("[limit(0; .[])]", [1, 2, 3], [[]]),
    ("first", [4, 5], [4]),
    ("last", [4, 5], [5]),
    ("first(empty)", None, []),
    ("nth(1)", [4, 5], [5]),
    ("nth(2; range(10))", None, [2]),
    ('indices(", ")', "a, b, c", [[1, 4]]),
    ("indices(1)", [0, 1, 2, 1], [[1, 3]]),
    ("indices([1, 2])", [0, 1, 2, 1, 2], [[1, 3]]),
    ('index(", ")', "a, b", [1]),
    ('rindex(", ")', "a, b, c", [4]),
    # J22: string functions
    ("tostring", 1, ["1"]),
    ("tostring", "s", ["s"]),
    ("tostring", [1], ["[1]"]),
    ("tonumber", "1.5", [1.5]),
    ("ascii_downcase", "AbC", ["abc"]),
    ("ascii_upcase", "AbC", ["ABC"]),
    ("explode", "ab", [[97, 98]]),
    ("implode", [97, 98], ["ab"]),
    ('split(", ")', "a, b", [["a", "b"]]),
    ('split(", *"; null)', "a,  b", [["a", "b"]]),
    ('join(", ")', ["a", "b"], ["a, b"]),
    ('join("-")', [1, None, "x"], ["1--x"]),
    ('ltrimstr("pre")', "prefix", ["fix"]),
    ('ltrimstr("pre")', 5, [5]),
    ('rtrimstr("fix")', "prefix", ["pre"]),
    ('startswith("ab")', "abc", [True]),
    ('endswith("bc")', "abc", [True]),
    ('test("a+")', "caat", [True]),
    ('test("A"; "i")', "a", [True]),
    ('match("a+").length', "caaat", [3]),
    ('[match("a"; "g")] | length', "banana", [3]),
    ('capture("(?<first>[a-z]+)-(?<second>[0-9]+)")', "ab-12", [{"first": "ab", "second": "12"}]),
    ('sub("a"; "X")', "banana", ["bXnana"]),
    ('gsub("a"; "X")', "banana", ["bXnXnX"]),
    ('gsub("(?<c>[aeiou])"; "<\\(.c)>")', "hi", ["h<i>"]),
    ('[scan("[0-9]+")]', "a1b22", [["1", "22"]]),
    ('[splits(",")]', "a,b", [["a", "b"]]),
    # J23: type/json functions
    ("type", None, ["null"]),
    ("type", True, ["boolean"]),
    ("type", 1, ["number"]),
    ("type", "s", ["string"]),
    ("type", [], ["array"]),
    ("type", {}, ["object"]),
    ("tojson", {"a": 1}, ['{"a":1}']),
    ('fromjson', '{"a":1}', [{"a": 1}]),
    ("infinite > 1e308", None, [True]),
    ("isnan", float("nan"), [True]),
    ("nan | isnan", None, [True]),
    ("isinfinite", 1.0, [False]),
    ("floor", 1.7, [1]),
    ("ceil", 1.2, [2]),
    ("sqrt", 9, [3.0]),
    ("pow(2; 10)", None, [1024.0]),
    ("log | floor", 100, [4]),
    ("fabs", -3, [3]),
    # J24: control/recursion
    ("reduce .[] as $x (0; . + $x)", [1, 2, 3], [6]),
    ("reduce empty as $x (99; . + 1)", None, [99]),
    ("[foreach .[] as $x (0; . + $x)]", [1, 2, 3], [[1, 3, 6]]),
    ("[foreach .[] as $x (0; . + $x; [$x, .])]", [1, 2], [[[1, 1], [2, 3]]]),
    ("[while(. < 5; . + 1)]", 0, [[0, 1, 2, 3, 4]]),
    ("until(. >= 5; . + 1)", 0, [5]),
    ("[recurse(if . < 3 then . + 1 else empty end)]", 0, [[0, 1, 2, 3]]),
    ("[recurse]", {"a": [1]}, [[{"a": [1]}, [1], 1]]),
    ("def double: . * 2; double", 21, [42]),
    ("def add3(a; b; c): a + b + c; add3(1; 2; 3)", None, [6]),
    ("def f($v): $v, v; f(9)", None, [9, 9]),  # $v also binds v/0
    ("def outer: def inner: 1; inner + 1; outer", None, [2]),
    ("label $out | 1, break $out, 2", None, [1]),
    ("[limit(3; repeat(1))]", None, [[1, 1, 1]]),
    # J25: assignment
    (".a = 1", {}, [{"a": 1}]),
    (".a.b = 1", {}, [{"a": {"b": 1}}]),
    (".a = (1, 2)", {}, [{"a": 1}, {"a": 2}]),
    (".[] = 0", [1, 2], [[0, 0]]),
    (".a |= . + 1", {"a": 1}, [{"a": 2}]),
    (".a += 1", {"a": 1}, [{"a": 2}]),
    (".a -= 1", {"a": 1}, [{"a": 0}]),
    (".a *= 2", {"a": 3}, [{"a": 6}]),
    (".a /= 2", {"a": 6}, [{"a": 3}]),
    (".a %= 2", {"a": 5}, [{"a": 1}]),
    (".a //= 9", {"a": None}, [{"a": 9}]),
    (".a //= 9", {"a": 1}, [{"a": 1}]),
    (".b += .a", {"a": 1, "b": 2}, [{"a": 1, "b": 3}]),  # RHS vs original input
    ("(.a, .b) = 1", {}, [{"a": 1, "b": 1}]),
    (".[].x = 1", [{}, {}], [[{"x": 1}, {"x": 1}]]),
    # J26: extras
    ('"abc" | md5', None, ["900150983cd24fb0d6963f7d28e17f72"]),
    ('"abc" | sha256', None, ["ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"]),
    ("1700000000 | gmtime | mktime", None, [1700000000]),
    ('1700000000 | strftime("%Y")', None, ["2023"]),
    ('"2023-11-14T22:13:20Z" | strptime("%Y-%m-%dT%H:%M:%SZ") | mktime', None, [1700000000]),
    ('"http://h/p?q=1" | uriparse | .host', None, ["h"]),
    ('"a%20b" | uridecode', None, ["a b"]),
    # string interpolation + formats
    ('"\\(1 + 1)"', None, ["2"]),
    ('@text "v=\\(.)"', 5, ["v=5"]),
    ('@json "\\(.)"', [1], ["[1]"]),
    ('@csv', [[1, "a"]][0], ['1,"a"']),
    ('@tsv', [1, "a\tb"], ["1\ta\\tb"]),
    ('@sh', "it's", ["'it'\\''s'"]),
    ('@html', "<a>", ["&lt;a&gt;"]),
    ('@base64 | @base64d', "round", ["round"]),
    ('@base32', "hello", ["NBSWY3DP"]),
    ('@base32 | @base32d', "round", ["round"]),
    ('@base32', 7, ["G4======"]),  # non-strings stringify first, like @base64
    ('try @base32d catch "bad"', "hello", ["bad"]),  # invalid base32 -> catchable jq error
    # destructuring
    (". as [$a, $b, $c] | [$c, $b, $a]", [1, 2], [[None, 2, 1]]),
    (". as {a: [$x, $y]} | $x + $y", {"a": [1, 2]}, [3]),
    (". as {$a, $b} | [$a, $b]", {"a": 1, "b": 2}, [[1, 2]]),
    ("[.[] | . as [$x] ?// $x | $x]", [[1], 2], [[1, 2]]),
    # misc semantics
    ("[.[] | numbers]", [1, "a", None, 2], [[1, 2]]),
    ("[.[] | values]", [1, None, 2], [[1, 2]]),
    ('[tostream]', {"a": 1}, [[[["a"], 1], [["a"]]]]),
    ('fromstream(tostream)', [[1, {"b": 2}], "x"], [[[1, {"b": 2}], "x"]]),
    # truncate_stream: the stream expr runs with input NULL (jq
    # builtin.jq `. as $n | null | stream | ...`) and the jq-manual
    # example drops the first $n path components
    (
        "[1|truncate_stream([[0],1],([[1,0],2]),([[1,0]]),([[1]]))]",
        None,
        [[[[0], 2], [[0]]]],
    ),
    ('fromstream(1|truncate_stream({"a":[1,2]}|tostream))', None, [[1, 2]]),
    ("[1|truncate_stream([[0,1], .])]", None, [[[[1], None]]]),
    ("tojson | fromjson", {"a": [1, 2.5, None]}, [{"a": [1, 2.5, None]}]),
    ('{} | .a.b.c = 1', None, [{"a": {"b": {"c": 1}}}]),
    # jq-1.7 additions (public builtin.jq definitions)
    ("abs", -5, [5]),
    ("abs", 3.25, [3.25]),
    ("[.[] | abs]", [-1, 2, -3.5], [[1, 2, 3.5]]),
    ("toarray", 1, [[1]]),
    ("toarray", [1, 2], [[1, 2]]),
    ("toarray", None, [[None]]),
    ('pick(.a.b, .c)', {"a": {"b": 1, "x": 2}, "c": 3, "d": 4},
     [{"a": {"b": 1}, "c": 3}]),
    ('pick(.x[1])', {"x": [1, 2, 3]}, [{"x": [None, 2]}]),
    ('pick(.[] | .k)', [{"k": 1, "z": 9}, {"k": 2, "z": 8}],
     [[{"k": 1}, {"k": 2}]]),
    ("trim", "  hi \t", ["hi"]),
    ("ltrim", " hi ", ["hi "]),
    ("rtrim", " hi ", [" hi"]),
    ("trim", "nospace", ["nospace"]),
    # path expressions THROUGH filter parameters (the pick enabler)
    ('def f(p): path(p); f(.a.b)', {"a": {"b": 1}}, [["a", "b"]]),
    ('def f(p): [paths] as $x | path(p); f(.a)', {"a": 1}, [["a"]]),
    # SQL-style helpers (jq builtin.jq: IN / INDEX)
    ("IN(1, 2)", 1, [True]),
    ("IN(1, 2)", 3, [False]),
    ("IN(.[]; 1, 5)", [0, 1, 2], [True]),
    ("IN(.[]; 7, 8)", [0, 1, 2], [False]),
    ("INDEX(.k)", [{"k": "a", "v": 1}, {"k": "b", "v": 2}],
     [{"a": {"k": "a", "v": 1}, "b": {"k": "b", "v": 2}}]),
    ("INDEX(.[]; .id)", [{"id": 7}], [{"7": {"id": 7}}]),
    # strflocaltime: host-TZ-dependent by design — crash-check here,
    # value pinned under an explicit TZ in test_strflocaltime_utc
    ('strflocaltime("%Y-%m-%d")', 0, None),
]


@pytest.mark.parametrize("program,value,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_conformance(program, value, expected):
    got = jq_compile(program)(value)
    if expected is None:
        return  # exercised for absence-of-crash only
    assert got == expected


ERROR_CASES = [
    ('.a', 5),  # cannot index number
    ('.[]', 5),
    ('.[0]', {"a": 1}),
    ('getpath(["a"])', 5),  # traversing THROUGH a scalar errors (jq 1.6)
    ('getpath(["a","b"])', {"a": 1}),
    ('getpath([0])', "abc"),
    ('1 + "a"', None),
    ('error("boom")', None),
    ('"abc" | implode', None),
    ('{} | keys | .[0] | error', None),
    ('[] | first(error("x"))', None),
    ('1/0', None),
]


@pytest.mark.parametrize("program,value", ERROR_CASES, ids=[c[0][:40] for c in ERROR_CASES])
def test_errors(program, value):
    with pytest.raises(JQError):
        list(jq_compile(program).iter(value))


def test_halt_family_is_uncatchable_and_carries_exit_code():
    # real jq: halt/halt_error terminate the program and CANNOT be
    # caught by try/catch or `?` — JQHalt bypasses every jq handler
    from hive_jq_udtf_spark.jqlib import JQHalt

    for prog, code, msg in [
        ("halt", 0, None),
        ("halt_error", 5, "boom"),
        ("halt_error(2)", 2, "boom"),
        ("try (halt_error(2)) catch .", 2, "boom"),
        ("halt_error(3)?", 3, "boom"),
        ("try halt catch .", 0, None),
    ]:
        with pytest.raises(JQHalt) as exc:
            list(jq_compile(prog).iter("boom"))
        assert exc.value.code == code, prog
        assert exc.value.value == msg, prog
    # a non-numeric exit code is an ordinary (catchable) jq error
    assert jq_compile('try (halt_error("x")) catch .')("in") == [
        "halt_error/1: number required"
    ]
    # halt_error(empty): the argument filter yields no values, so real
    # jq produces EMPTY output and does not halt (ADVICE r6)
    assert jq_compile("halt_error(empty), 99")("in") == [99]
    assert jq_compile("try halt_error(empty) catch .")("in") == []


SYNTAX_ERRORS = ["", ".|", "if x then", "def f", "{a:}", "[1,", '"unterminated', "1 +"]


@pytest.mark.parametrize("program", SYNTAX_ERRORS)
def test_syntax_errors(program):
    with pytest.raises(JQSyntaxError):
        jq_compile(program + " ")  # avoid cache hits on ""


# Edge-semantics regression corpus (round-1 hardening probes —
# jq-1.5 quirks: number formatting, cross-type sort order, string
# arithmetic, deep merge, lazy limit, multi-path assignment,
# error-swallowing alternative, stream round-trips)
EDGE_CASES = [
    ("1.0 | tostring", None, ["1"]),
    ("1.5 | tostring", None, ["1.5"]),
    ("[1.0] | tojson", None, ["[1]"]),
    ("1e3 | tostring", None, ["1000"]),
    ("sort", [[], "a", 3, True, None, {"x": 1}, False],
     [[None, False, True, 3, "a", [], {"x": 1}]]),
    ('[null, "a", 1] | min', None, [None]),
    ('"x" * 3', None, ["xxx"]),
    ('"x" * 0', None, [None]),
    ('"a,b,c" / ","', None, [["a", "b", "c"]]),
    ('{"a":{"b":1,"c":2}} * {"a":{"b":9}}', None, [{"a": {"b": 9, "c": 2}}]),
    ('[limit(1; 1, error("boom"))]', None, [[1]]),
    ('first(1, error("boom"))', None, [1]),
    # early-exit laziness: these hang or error if limit/first/until
    # materialize their generator before truncating
    ("[limit(3; repeat(7))]", None, [[7, 7, 7]]),
    ("first(range(1000000000))", None, [0]),
    ("[first(empty)]", None, [[]]),
    ('[limit(0; error("boom"))]', None, [[]]),
    # format-applied string interpolation: the @format applies to each
    # interpolated fragment, never to the literal text around it
    ('{"x":"hi"} | @base64 "val: \\(.x)"', None, ["val: aGk="]),
    ('{"a":"a b"} | @uri "k=\\(.a)"', None, ["k=a%20b"]),
    ('@html "<p>\\("<b>")</p>"', None, ["<p>&lt;b&gt;</p>"]),
    ('@sh "echo \\("it\'s")"', None, ["echo 'it'\\''s'"]),
    ("(.a, .b) = 1", {}, [{"a": 1, "b": 1}]),
    (".a[] = 0", {"a": [1, 2]}, [{"a": [0, 0]}]),
    ("del(.a[])", {"a": [1, 2], "b": 3}, [{"a": [], "b": 3}]),
    ('.[0:2] = ["x"]', [1, 2, 3], [["x", 3]]),
    ('(error("x") // 42)', None, [42]),
    ('[.[] | .a // "d"]', [{"a": 1}, {"a": None}, {}], [[1, "d", "d"]]),
    ('try error("e") catch .', None, ["e"]),
    ('try (1/0) catch "div"', None, ["div"]),
    ("5 % 3", None, [2]),
    ("null + 1", None, [1]),
    ("null + null", None, [None]),
    ("[1,2] - [2]", None, [[1]]),
    ('"abc" < "abd"', None, [True]),
    ('has("a")', {"a": None}, [True]),
    ("fromstream(tostream)", {"a": [1, {"b": 2}]}, [{"a": [1, {"b": 2}]}]),
    ("null | .a.b", None, [None]),
    ('{"b":1,"a":2} | keys', None, [["a", "b"]]),
    ('{"b":1,"a":2} | keys_unsorted', None, [["b", "a"]]),
    (".[] as [$a, $b] | $a + $b", [[1, 2], [3, 4]], [3, 7]),
    (". as {a: $x} | $x", {"a": 5}, [5]),
    ("{} | .a.b.c = 1", None, [{"a": {"b": {"c": 1}}}]),
    ("[1,[2,[3]]] | flatten", None, [[1, 2, 3]]),
    ("[1,[2,[3]]] | flatten(1)", None, [[1, 2, [3]]]),
    ("{a: .[]}", [1, 2], [{"a": 1}, {"a": 2}]),
    ('.["a"]?', 5, []),
    ("[paths(. == 1)]", {"a": 1, "b": {"c": 1}}, [[["a"], ["b", "c"]]]),
    ("to_entries | from_entries", {"a": 1}, [{"a": 1}]),
    ('@json "x\\(1+1)"', None, ["x2"]),
    # jq-1.6 differential parity (ADVICE r1)
    ("transpose", [[1, 2], [3, 4]], [[[1, 3], [2, 4]]]),
    ("transpose", [[1, 2, 3], [4]], [[[1, 4], [2, None], [3, None]]]),
    ("transpose", [], [[]]),
    ("[recurse_down]", {"a": 1}, [[{"a": 1}, 1]]),
    ('[splits("")]', "abc", [["", "a", "b", "c"]]),
    ('[splits("")]', "", [[""]]),
    ('[splits("b")]', "ab", [["a", ""]]),  # non-empty end match keeps tail
    ('[splits(",")]', "a,b,", [["a", "b", ""]]),
    ('getpath(["a","b"])', None, [None]),  # null propagates, no error
    ('getpath(["a"])', {}, [None]),
]


@pytest.mark.parametrize("program,inp,want", EDGE_CASES)
def test_edge_semantics(program, inp, want):
    assert list(jq_compile(program)(inp)) == want


# ---------------------------------------------------------------------------
# Regex dialect (J22): Oniguruma constructs translated or explicitly
# rejected — docs/regex_dialect.md is the authoritative table
# ---------------------------------------------------------------------------

REGEX_DIALECT_OK = [
    # named group + \k<name> backref
    ('[match("(?<a>ab)\\\\k<a>") | .captures[0].string]', "abab", [["ab"]]),
    # \h / \H horizontal whitespace
    ('test("a\\\\hb")', "a b", [True]),
    ('test("a\\\\hb")', "a\nb", [False]),
    ('test("\\\\H")', " \t", [False]),
    # \z / \Z end anchors (Onig \Z = before trailing newline)
    ('test("ab\\\\z")', "ab", [True]),
    ('test("ab\\\\Z")', "ab", [True]),
    ('test("ab\\\\z")', "ab\n", [False]),
    # \x{...} codepoint
    ('test("\\\\x{61}bc")', "abc", [True]),
    # POSIX classes (ASCII approximation)
    ('test("[[:digit:]]+")', "x42", [True]),
    ('test("^[[:alpha:][:digit:]]+$")', "ab12", [True]),
    ('test("[[:punct:]]")', "a,b", [True]),
    # possessive quantifier + atomic group (native on Python 3.11+)
    ('test("a*+b")', "aaab", [True]),
    ('test("(?>a+)b")', "aab", [True]),
    # literal ] as first class member must not close the class
    ('test("[]a]+")', "]a", [True]),
]


@pytest.mark.parametrize("program,inp,want", REGEX_DIALECT_OK)
def test_regex_dialect_translations(program, inp, want):
    assert list(jq_compile(program)(inp)) == want


REGEX_DIALECT_REJECTED = [
    'test("\\\\p{L}+")',
    'test("\\\\P{N}")',
    'test("\\\\g<x>")',
    'test("\\\\K")',
    'test("\\\\R")',
    'test("\\\\X")',
    'test("[[:^alpha:]]")',
    'test("(?<=a+)b")',  # variable-length lookbehind: re compile error
]


@pytest.mark.parametrize("program", REGEX_DIALECT_REJECTED)
def test_regex_dialect_rejections(program):
    with pytest.raises(JQError):
        list(jq_compile(program).iter("abc"))


def test_strflocaltime_utc(monkeypatch):
    # pin the OS timezone for the assertion: strflocaltime follows the
    # HOST tz (like jq), so the parametrized corpus can't assume UTC
    import time as _time

    monkeypatch.setenv("TZ", "UTC")
    _time.tzset()
    try:
        assert jq_compile('strflocaltime("%Y-%m-%d")')(0) == ["1970-01-01"]
    finally:
        monkeypatch.delenv("TZ", raising=False)
        _time.tzset()


def test_trim_strips_vertical_tab():
    # jq 1.7's C trim is isspace()-based: vertical tab included
    assert jq_compile("trim")(" \u000bhi\u000b ") == ["hi"]
    assert jq_compile("ltrim")("\u000bx") == ["x"]


def test_env_opt_in(monkeypatch):
    # default: deterministic empty environment (conformance delta,
    # docs/conformance_deltas.md); set_env_access(True) exposes the
    # real per-process environment like jq / jackson-jq-extra
    from hive_jq_udtf_spark.jqlib import set_env_access

    monkeypatch.setenv("JQLIB_PROBE", "42")
    assert jq_compile("$ENV.JQLIB_PROBE")(None) == [None]
    assert jq_compile("env | length")(None) == [0]
    set_env_access(True)
    try:
        assert jq_compile("$ENV.JQLIB_PROBE")(None) == ["42"]
        assert jq_compile("env.JQLIB_PROBE")(None) == ["42"]
    finally:
        set_env_access(False)
    assert jq_compile("$ENV.JQLIB_PROBE")(None) == [None]


def test_recurse_is_path_trackable():
    # path(..) / recursive updates — NATIVE_PATH recurse family (r7)
    assert jq_compile("[path(..)]")({"a": [1]}) == [[[], ["a"], ["a", 0]]]
    assert jq_compile("[path(recurse(.a?))]")({"a": {"a": 2}}) == [
        [[], ["a"], ["a", "a"]]
    ]
    assert jq_compile("[path(recurse(.[]?; . != null))]")([1, None]) == [[[], [0]]]
    assert jq_compile("(.. | numbers) |= . + 1")({"a": [1, {"b": 2}]}) == [
        {"a": [2, {"b": 3}]}
    ]
    assert jq_compile("del(.. | select(. == 2))")({"a": 2, "b": [2, 3]}) == [
        {"b": [3]}
    ]


def test_large_int_tostring_exact():
    """r14 (VERDICT r13 #7): int64-exact number text — a DELIBERATE,
    documented divergence from jq-1.6 (docs/conformance_deltas.md).
    jq 1.6 rounds `123456789012345678 | tostring` through a C double
    to "123456789012345680"; jackson-jq — the engine the reference
    actually embeds (Java longs end-to-end) — and jq >= 1.7
    (decNumber) both print it EXACTLY, and so do we.  If the system
    jq binary is 1.6, assert its rounded output too so the pin
    records the divergence it expects rather than hiding it."""
    import json
    import shutil
    import subprocess

    n = "123456789012345678"
    assert jq_compile("tostring")(json.loads(n)) == [n]
    assert jq_compile("tojson")(json.loads(n)) == [n]
    assert jq_compile(".")(json.loads(n)) == [json.loads(n)]
    # 2^53+1: above double precision, exact in longs
    assert jq_compile("tostring")(9007199254740993) == ["9007199254740993"]
    jqbin = shutil.which("jq")
    if jqbin:
        p = subprocess.run(
            [jqbin, "tostring"], input=n, capture_output=True, text=True
        )
        if p.returncode == 0 and "1.6" in subprocess.run(
            [jqbin, "--version"], capture_output=True, text=True
        ).stdout:
            # the divergence this pin EXPECTS: jq-1.6 double-rounds
            assert json.loads(p.stdout) == "123456789012345680"
