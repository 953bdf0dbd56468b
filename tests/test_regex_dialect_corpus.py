"""Regex-dialect delta corpus (VERDICT r5 next-round #6): every
construct the Oniguruma→`re` translator REWRITES or REJECTS, pinned
table-driven so the documented J22 delta (docs/regex_dialect.md) is
enforced by tests, not prose.

Three tables:
  REWRITTEN — (onig pattern, exact Python `re` pattern produced)
  REJECTED  — patterns that must raise JQError naming the construct
  CLASS_SEMANTICS — each POSIX class's ASCII behavior via jq test()

Completeness gates at the bottom assert the corpus covers every
entry of the translator's own tables (_ONIG_REJECT, _POSIX_CLASSES),
so a new translator branch cannot land unpinned.
"""

from __future__ import annotations

import pytest

from hive_jq_udtf_spark.jqlib import JQError, jq_compile
from hive_jq_udtf_spark.jqlib.evaluator import (
    _ONIG_REJECT,
    _POSIX_CLASSES,
    _translate_onig,
)

# ---------------------------------------------------------------------------
# rewritten constructs: exact translator output
# ---------------------------------------------------------------------------

REWRITTEN = [
    # \k<name> backref → (?P=name)
    (r"(?<a>x)\k<a>", r"(?<a>x)(?P=a)"),
    # \h / \H horizontal whitespace
    (r"a\hb", r"a[ \t]b"),
    (r"[\h0]", r"[ \t0]"),
    (r"a\Hb", r"a[^ \t]b"),
    # \z absolute end → \Z ; \Z end-before-final-newline → lookahead
    (r"ab\z", r"ab\Z"),
    (r"ab\Z", r"ab(?=\n?\Z)"),
    # \x{...} codepoint → escaped literal
    (r"\x{61}bc", "abc"),
    (r"\x{2e}", r"\."),
    # literal ] opening a class stays literal
    (r"[]a]", "[]a]"),
    (r"[^]a]", "[^]a]"),
    # POSIX classes → ASCII fragments (all of them, inside a class)
    *[
        (f"[[:{name}:]]", f"[{frag}]")
        for name, frag in sorted(_POSIX_CLASSES.items())
    ],
    # POSIX combined with other members
    (r"[x[:digit:]]", "[x0-9]"),
]


@pytest.mark.parametrize("onig,python", REWRITTEN, ids=[r[0] for r in REWRITTEN])
def test_rewritten_constructs_exact_translation(onig, python):
    assert _translate_onig(onig) == python


# ---------------------------------------------------------------------------
# rejected constructs: JQError naming the construct (never silent
# divergence, never a bare re.error leaking through)
# ---------------------------------------------------------------------------

REJECTED = [
    # every _ONIG_REJECT escape
    (r"\p{L}+", r"\p"),
    (r"\P{N}", r"\P"),
    (r"a\Kb", r"\K"),
    (r"\R", r"\R"),
    (r"\X", r"\X"),
    # subroutine calls
    (r"\g<x>", r"\g"),
    # negated / unknown POSIX classes
    (r"[[:^alpha:]]", "[:^alpha:]"),
    (r"[[:nosuch:]]", "[:nosuch:]"),
    # \H not expressible inside a class
    (r"[\H]", r"\H"),
    # malformed \x{...}
    (r"\x{zz}", r"\x{...}"),
]


@pytest.mark.parametrize("pattern,construct", REJECTED, ids=[r[0] for r in REJECTED])
def test_rejected_constructs_raise_naming_the_construct(pattern, construct):
    prog = jq_compile("test($re)")
    with pytest.raises(JQError) as exc:
        list(prog.iter("abc", vars={"re": pattern}))
    # the error must name what was rejected (docs/regex_dialect.md)
    assert construct.replace("{...}", "") .rstrip("<>") in str(exc.value) or (
        construct in str(exc.value)
    )


def test_variable_length_lookbehind_surfaces_as_jqerror():
    # Oniguruma allows it; Python re raises at compile — the error
    # must surface as JQError, not a raw re.error
    with pytest.raises(JQError):
        list(jq_compile('test("(?<=a+)b")').iter("aab"))


# ---------------------------------------------------------------------------
# POSIX class ASCII semantics end-to-end (the one translated family
# with a documented semantic delta vs Oniguruma's Unicode classes)
# ---------------------------------------------------------------------------

CLASS_SEMANTICS = [
    ("alpha", "g", True), ("alpha", "Ă", False), ("alpha", "7", False),
    ("digit", "7", True), ("digit", "٧", False),  # ARABIC-INDIC SEVEN
    ("alnum", "g7", True), ("alnum", "_", False),
    ("upper", "G", True), ("upper", "g", False),
    ("lower", "g", True), ("lower", "G", False),
    ("space", "\t", True), ("space", " ", False),  # NBSP is not ASCII space
    ("blank", " ", True), ("blank", "\n", False),
    ("punct", ",", True), ("punct", "a", False),
    ("xdigit", "F", True), ("xdigit", "G", False),
    ("cntrl", "\x07", True), ("cntrl", "a", False),
    ("graph", "!", True), ("graph", " ", False),
    ("print", " ", True), ("print", "\x07", False),
    ("word", "_", True), ("word", "-", False),
]


@pytest.mark.parametrize(
    "name,ch,want", CLASS_SEMANTICS, ids=[f"{c[0]}-{c[1]!r}" for c in CLASS_SEMANTICS]
)
def test_posix_class_ascii_semantics(name, ch, want):
    prog = jq_compile(f'test("^[[:{name}:]]+$")')
    assert prog(ch) == [want]


# ---------------------------------------------------------------------------
# completeness: the corpus must cover the translator's own tables
# ---------------------------------------------------------------------------


def test_corpus_covers_every_onig_reject_escape():
    covered = {p[1][1] for p in REJECTED if p[1].startswith("\\")}
    assert set(_ONIG_REJECT) <= covered


def test_corpus_covers_every_posix_class():
    rewritten_names = {
        p[0].split(":")[1] for p in REWRITTEN if p[0].startswith("[[:")
    }
    semantic_names = {c[0] for c in CLASS_SEMANTICS}
    assert set(_POSIX_CLASSES) == rewritten_names
    assert set(_POSIX_CLASSES) == semantic_names
