"""Differential gate for the scalar fast path (evaluator.py
compile_scalar): every program is compiled TWICE — once normally
(scalar path active) and once with _DISABLE_SCALAR forcing the
generator compilers — and both the output streams and the raised
errors must match on every input.

Covers each scalar-compiled construct (paths, index_on, object/
string/array construction, arithmetic + comparison order, and/or/alt
short-circuits, if-chains, as-bindings, reduce, whitelisted builtin
calls, the lean select and iterate_on specializations) plus the
funcdef gate (a program that shadows a whitelisted builtin must use
the shadowed definition) and hypothesis-generated random programs.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import hive_jq_udtf_spark.jqlib.evaluator as E
from hive_jq_udtf_spark.jqlib import JQError


def both_ways(src: str, value):
    """(outcome, payload) under each compile mode; outcome is
    'ok' -> list of outputs, 'err' -> error text."""
    results = []
    for disable in (False, True):
        E._COMPILE_CACHE.clear()
        E._DISABLE_SCALAR = disable
        try:
            prog = E.JQProgram(src)
            try:
                results.append(("ok", prog(value)))
            except JQError as ex:
                results.append(("err", str(ex)))
        finally:
            E._DISABLE_SCALAR = False
    E._COMPILE_CACHE.clear()
    return results


PROGRAMS = [
    # paths / index / iterate specializations
    (".a.b", {"a": {"b": 1}}),
    (".a[1]", {"a": [1, 2, 3]}),
    (".a | .[]", {"a": [1, 2]}),
    (". as $d | $d.xs[]", {"xs": [5, 6]}),
    (".a", 5),  # error: index number with "a"
    # arithmetic / comparison, incl. error ordering (right first)
    (".a + .b", {"a": 1, "b": 2}),
    ('(.a + 1) * (.b - 2)', {"a": 3, "b": 10}),
    ('."x" >= 2', {"x": 3}),
    ('(1/0) == (null + 1)', None),  # both sides error; right's wins
    ('1 + "x"', None),
    # and / or / alt
    ('.a and (1/0 | . > 0)', {"a": False}),  # short-circuit: no error
    ('.a or .b', {"a": None, "b": 1}),
    ('.a // "dflt"', {"a": None}),
    ('(.a | tonumber) // "caught"', {"a": "zz"}),  # alt catches left error
    # constructors
    ('{x: .a, ("k" + "2"): 7}', {"a": 1}),
    ('{(.k): 1}', {"k": 5}),  # non-string key error
    ('"v=\\(.a + 1)!"', {"a": 4}),
    ('[.xs[] | . * 2]', {"xs": [1, 2]}),
    # if / as / reduce
    ('if .a > 1 then "big" elif .a > 0 then "small" else "neg" end', {"a": 1}),
    ('.n as $n | $n + 1', {"n": 41}),
    ('reduce .xs[] as $x (0; . + $x)', {"xs": [1, 2, 3]}),
    ('reduce .xs[] as $x (0; . + $x)', {"xs": []}),
    # whitelisted builtin calls
    ('.s | ascii_downcase | startswith("ab")', {"s": "ABc"}),
    ('.xs | map(. + 1) | add', {"xs": [1, 2]}),
    ('.s | gsub("[aeiou]"; "_")', {"s": "banana"}),
    ('.xs | sort_by(-.) | join(",")', {"xs": ["b", "a"]}),
    ('.o | has("k")', {"o": {"k": 1}}),
    ('.xs | length + 1', {"xs": [1, 2, 3]}),
    # lean select
    ('.xs[] | select(. % 2 == 0)', {"xs": [1, 2, 3, 4]}),
    ('[.xs[] | select(. > 10)] | length', {"xs": [1, 2]}),
    # laziness must survive: dropped streams never evaluate
    ('[limit(0; error("boom"))]', None),
    ('[limit(1; 1, error("boom"))]', None),
    ('first(.xs[] | select(. > 1))', {"xs": [1, 2, 3]}),
    # try/catch and slices (round-4 wave 3 scalar constructs)
    ('try (.a | tonumber) catch "bad"', {"a": "12"}),
    ('try (.a | tonumber) catch "bad"', {"a": "zz"}),
    ('try (1/0) catch .', None),
    ('.s[2:5]', {"s": "abcdefgh"}),
    ('.xs[1:]', {"xs": [1, 2, 3]}),
    ('.xs[:-1]', {"xs": [1, 2, 3]}),
    ('.s[.a:.b]', {"s": "abcdef", "a": 1, "b": 4}),
    ('.s["x":2]', {"s": "abc"}),  # non-numeric index error
    ('.x[1:2]', {"x": 5}),  # slice of number errors
    # funcdef gate: user shadowing of a whitelisted builtin MUST win
    ('def length: 99; .s | length', {"s": "abcdef"}),
    ('def add: "shadowed"; .xs | add', {"xs": [1, 2]}),
]


@pytest.mark.parametrize("src,value", PROGRAMS, ids=[p[0][:48] for p in PROGRAMS])
def test_scalar_matches_generator(src, value):
    a, b = both_ways(src, value)
    assert a == b, f"scalar {a!r} != generator {b!r}"


# -- hypothesis: random compositions of scalar-able constructs --------

_leaf = st.sampled_from([".", ".a", ".b", '.c', "1", "2.5", '"s"', "null", "true"])
_ops = st.sampled_from(["+", "-", "*", "==", "!=", "<", ">=", "//", "and", "or"])


@st.composite
def programs(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(_leaf)
    kind = draw(st.integers(0, 5))
    if kind == 0:
        return f"({draw(programs(depth + 1))} {draw(_ops)} {draw(programs(depth + 1))})"
    if kind == 1:
        return f"({draw(programs(depth + 1))} | {draw(programs(depth + 1))})"
    if kind == 2:
        return f"{{x: {draw(programs(depth + 1))}, y: {draw(programs(depth + 1))}}}"
    if kind == 3:
        return f"[{draw(programs(depth + 1))}]"
    if kind == 4:
        return (
            f"(if {draw(programs(depth + 1))} then {draw(programs(depth + 1))}"
            f" else {draw(programs(depth + 1))} end)"
        )
    return f"({draw(programs(depth + 1))} as $v | ($v // {draw(programs(depth + 1))}))"


_values = st.sampled_from(
    [None, 0, 1, -2, 2.5, "s", True, {"a": 1, "b": "x", "c": [1, 2]}, [1, 2], {}]
)


@settings(max_examples=300, deadline=None)
@given(src=programs(), value=_values)
def test_random_programs_match(src, value):
    a, b = both_ways(src, value)
    assert a == b, f"{src!r} on {value!r}: scalar {a!r} != generator {b!r}"
