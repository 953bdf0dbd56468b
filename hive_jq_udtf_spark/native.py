"""jq → native Catalyst expression compiler (SURVEY §4.2 tier 2).

A large fraction of real jq programs are "simple paths":
``.a.b``, ``.a[]``, ``.a[0]``, ``{x: .p, y: .q}``,
``select(.k == lit)`` pipelines of J1–J7.  These compile to pure
Spark expressions (``get_json_object`` / ``from_json`` + ``explode``
+ ``filter``) and skip the Python worker entirely — whole-stage
codegen keeps the hot path JVM-side, the single biggest lever at
100 TB (the reference had no JVM↔Python boundary; this tier removes
ours).

``compile_native(program, decls)`` returns a plan or None; the
`jq_explode(..., native="auto")` entry point in udtf.py uses it
transparently and falls back to the Python UDTF for general
programs.

Semantics delta vs the Python tier (documented per D1): Spark casts
produce NULL where Jackson-lenient marshalling produces 0/false for
*non-coercible* garbage, and compiled arithmetic (`- * / %`) yields
NULL on a null/missing operand where jq ABORTS the query (`+` keeps
jq's null-identity; comparisons keep jq's null-below-everything
order).  ALL of jq's arithmetic is polymorphic (``+`` concatenates
strings/arrays and merges objects, ``-`` subtracts arrays, ``*``
repeats strings and merges objects, ``/`` splits strings), so an
arithmetic expression compiles numerically only when it PROVES
number-valued-or-error (`_proves_num`, r10: numeric literal / neg /
``%`` prove outright; ``+ - /`` propagate proof from either side;
``*`` needs BOTH sides proven because string repetition pairs a
string with a number).  A string literal in a ``+`` chain →
concatenation (strcat spec: null/missing parts are the identity '',
non-string parts yield NULL where jq aborts, corrupt docs yield
NULL); unproven chains (``.a + .b``, ``.a + .b * 2``) fall back to
the Python tier — compiling them numerically silently NULLed
string results (r9 found the path-only ``+`` case, r10 closed the
``- * /``-as-anchor case).
``tostring`` normalizes integral floats below 1e17 to integer text
like jq (1.0 → "1", variant-type-gated so STRING "1.0" passes
through), recursing into OBJECT/ARRAY text via a string-token-safe
regex (r10); r11 closes the SCALAR scientific-notation class exactly
(`_sci_python_text`: Jackson "1.0E20"/"1.5E-7"/"1.23456789E7" → jq
"1e+20"/"1.5e-07"/"12345678.9") plus the nested subclass where both
engines print scientific (e >= 17 / e <= -5); r12 closes the NESTED
digit-shift class too (`_shift_rebuild`: marked tokens at e in
[0,16] / e in [-4,-1] tokenize, shift positionally, and reassemble
in pure codegen — "1.23456789E7" inside an object prints
"12345678.9" like jq).  ``tojson`` /
``@json`` / ``@text`` / ``@base64`` and ``keys_unsorted`` compile
too (r10 scalar tier; r11 under ITERATES and as trailing bare
``keys``/``keys_unsorted`` calls in the single-TYPE decl form):
tojson quotes strings with Jackson escaping (the same
\\n/\\t/\\r/\\uXXXX shortcuts as jqlib's json.dumps), keys_unsorted
reads json_object_keys over raw text for document order — under an
iterate that raw text is the element's text twin.  DUPLICATE-KEY
documents ({"a":1,"a":2}): r12 closes the former every-spec-NULL
class — jq_explode turns on spark.sql.variant.allowDuplicateKeys
(the variant then keeps the LAST occurrence, exactly jq), scalar
plain-path reads route suspect rows (`_dup_suspect`, a backreference
regex over the raw text) through the variant instead of the
first-occurrence get_json_object text, and keys/keys_unsorted
dedupe to first-occurrence document order like jq's in-place
jv_object_set.  r13 (VERDICT r12 #4) closes the composite-value
residual VALUE-PRECISELY: suspect COMPOSITES substitute the variant
render only when the raw text's parsed value actually differs from
the last-wins variant (`_dup_fixed_raw`), so false positives keep
document-order text and true duplicates get correct last-wins
VALUES everywhere (STRING-declared composites, tostring /
interpolation views, keys_unsorted under a duplicated ancestor,
type-changing duplicates in both directions).  r14 (VERDICT r13 #3)
closes the former ORDER-only residue: true-difference composites
substitute a DOCUMENT-ORDER rebuild (`_dup_doc_render`) — a
last-occurrence path walk over ``from_json(.., map<string,string>)``
entries (which preserve duplicate keys in document order with
order-preserving subtree texts) plus a first-position/last-value
object render exactly like jq's in-place jv_object_set — so
STRING-declared composites, tostring/tojson/interpolation views,
keys_unsorted, and object iteration all see jq's key order on
true-duplicate docs.  The same closure fixed a SILENT r13
wrong-render: a subtree whose own object carried the duplicate
({"k":1,"k":3,"z":2}) parsed value-equal on both sides of the
keep-raw gate and kept its duplicate-key raw text.  The iterate
text SOURCE resolves SHALLOWLY (`_dupsql_shallow`: last-occurrence
walk + top-level first-position/last-value dedup, child texts kept
RAW) so object iteration emits jq's row set without spending the
rebuild depth budget before per-element readers — which carry their
own budget from the element's text twin — ever run.  Narrowed
residuals, documented here: still-suspect composites nested MORE
than `_DUP_RENDER_DEPTH` (=2) levels below the reading site fall
back to the sorted variant render (values exact, order sorted), and
element-level reads whose text twin has no SQL form (single-level
posexplode) keep the r13 sorted fallback; duplicate keys spelled
with DIFFERENT JSON escapes ("a" vs "\\u0061") are caught by a
second suspect trigger (any \\uXXXX escape in key position —
over-approximation is free by the false-positive-safety property)
and read last-wins through the variant, which normalizes escapes
exactly like jq.
sqrt of a
negative yields NaN natively where the Python tier raises the jq
error — same class.  On clean data the tiers agree BIT-FOR-BIT —
pinned by the property tests in tests/test_native.py; transcendental
math fns stay Python-tier because JVM libm is not correctly rounded
(see _NUM_FNS note).

Iteration deltas: ``.[]``/``.path[]`` iterates BOTH arrays and
objects at EVERY iterate level of a multi-iterate program — object
values in document key order, matching the Python tier (first level
r8; inner levels r9 via a raw-text twin threaded through the chained
explodes, since Spark variants sort object keys and cannot carry
document order).  ``.[]`` on scalars/null yields no rows where jq
raises (the documented error-channel delta shared with missing
paths).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .jqlib.parser import AST, parse
from .schema import parse_output_schema

# ---------------------------------------------------------------------------
# AST analysis → IR
# ---------------------------------------------------------------------------

Path = tuple  # of str (field) / int (array index)

# projection-spec marker tags; a PATH whose first field collides with
# one of these would be misread as a spec, so analysis falls back to
# the Python tier for such (rare) field names
_SPEC_KINDS = {
    "lit",
    "expr",
    "fnchain",
    "alt",
    "length",
    "keyssorted",
    "keysunsorted",
    "arrayfn",
    "slicearr",
    "strpred",
    "capture",
    "ifelse",
    "splitidx",
    "splitarr",
    "reduce",
    "strcat",
    "strinterp",
}


@dataclass
class Filter:
    lhs: Path
    op: str  # == != < <= > >= or "truthy"/"not_truthy"/"has"
    lit: Any
    combine: str = "and"  # reserved
    # when set, the condition LHS is a compiled scalar expression
    # (arithmetic over paths) instead of a bare path; ``lhs`` then
    # holds only the base-path prefix the expression is relative to
    lhs_expr: Any = None
    # r11: when "length", the comparison LHS is jq `length` of the
    # path's value (`select(.tags | length > 1)`) — evaluated via
    # _variant_length over the exact-typed variant
    fn: Optional[str] = None


@dataclass
class OrGroup:
    """Disjunction of simple filters inside one select() — members
    OR together, the group ANDs with its siblings.  (OR of ANDs
    falls back to the Python tier.)"""

    filters: list  # of Filter


@dataclass
class NativeIR:
    pre_path: Path = ()
    iterate: bool = False
    # steps between consecutive iterates for multi-level explode
    # (.a[].b[] → pre_path=(a,), mid_paths=[(b,)]); empty for the
    # single-iterate case.  Filters/projections are always relative
    # to the LAST iterated element.
    mid_paths: list = field(default_factory=list)
    # per-iterate output cap from limit(n; ...)/first(...): entry k
    # caps the k-th iterate (None = unlimited).  jq's generator
    # laziness maps to a pre-explode array slice — the explode never
    # materializes the elements limit() would not have pulled.
    iter_limits: list = field(default_factory=list)
    pre_filters: list[Filter] = field(default_factory=list)
    post_filters: list[Filter] = field(default_factory=list)
    # projection: None = identity; {name: Path|("lit", v)} = object construct
    project: Optional[dict[str, Any]] = None
    single_path: Optional[Path] = None  # trailing bare path
    # trailing bare ``keys`` / ``keys_unsorted`` call applied to
    # single_path's value (r11: both tiers, incl. under iterates —
    # ``.[] | keys_unsorted`` reads the element's raw-text twin for
    # document order); None = no trailing call
    single_call: Optional[str] = None
    # r11: this project was SYNTHESIZED by wrapping a bare
    # single-TYPE program's tail as a one-field object (jq1-style
    # ``.a | tostring`` → ``{col1: (.a | tostring)}``) — exempt from
    # the "single-TYPE form with an object construct" rejection,
    # which targets USER-written constructs only
    wrapped_single: bool = False


def _flatten(ast: AST, out: list) -> bool:
    """Flatten pipe/postfix chains into a stage list; False = reject."""
    tag = ast[0]
    if tag == "pipe":
        return _flatten(ast[1], out) and _flatten(ast[2], out)
    if tag == "identity":
        return True
    if tag == "field":
        out.append(("step", ast[1]))
        return True
    if tag == "index_on":
        if not _flatten(ast[1], out):
            return False
        idx = ast[2]
        if idx[0] == "literal" and isinstance(idx[1], (int, str)) and not isinstance(idx[1], bool):
            out.append(("step", idx[1]))
            return True
        return False
    if tag == "iterate_on":
        if not _flatten(ast[1], out):
            return False
        out.append(("iterate",))
        return True
    if tag == "call" and ast[1] == "select" and len(ast[2]) == 1:
        f = _parse_filters(ast[2][0])
        if f is None:
            return False
        out.append(("select", f))
        return True
    if tag == "call" and ast[1] == "first" and len(ast[2]) == 0:
        # jq: `first` == `.[0]`
        out.append(("step", 0))
        return True
    if tag == "call" and ast[1] in ("limit", "first") and len(ast[2]) in (1, 2):
        # limit(n; <path chain with one iterate>) / first(<same>):
        # the first n stream outputs of a pure path chain are the
        # first n array elements — a pre-explode slice.  Bodies with
        # select() stay Python-tier (their per-element output count
        # is data-dependent, not slice-able).
        if ast[1] == "limit":
            if len(ast[2]) != 2:
                return False
            n_ast, body = ast[2]
            if n_ast[0] == "neg" and n_ast[1][0] == "literal":
                n_ast = ("literal", -n_ast[1][1]) if isinstance(
                    n_ast[1][1], int
                ) and not isinstance(n_ast[1][1], bool) else n_ast
            if (
                n_ast[0] != "literal"
                or not isinstance(n_ast[1], int)
                or isinstance(n_ast[1], bool)
            ):
                return False
            # jqlib pins limit(n <= 0; f) -> empty
            n = max(n_ast[1], 0)
        else:
            if len(ast[2]) != 1:
                return False
            body = ast[2][0]
            n = 1
        sub: list = []
        if not _flatten(body, sub):
            return False
        if any(s[0] not in ("step", "iterate") for s in sub):
            return False
        iters = [i for i, s in enumerate(sub) if s[0] == "iterate"]
        if len(iters) == 0:
            # body is a bare path: one output, so limit(n>=1) is the
            # identity on it; n == 0 (empty) is not expressible here
            if n < 1:
                return False
            out.extend(sub)
            return True
        if len(iters) != 1:
            return False
        # Nested limit/first (e.g. limit(5; first(.a[]))): the inner
        # call already capped this iterate — the composed stream cap
        # is the MIN of the two, never the outer overwrite.
        prev = sub[iters[0]]
        eff = n if len(prev) < 2 or prev[1] is None else min(n, prev[1])
        sub[iters[0]] = ("iterate", eff)
        out.extend(sub)
        return True
    if tag == "object":
        proj = {}
        for k_ast, v_ast in ast[1]:
            if k_ast[0] != "literal" or not isinstance(k_ast[1], str):
                return False
            p = _as_path(v_ast)
            if p is not None:
                if p and isinstance(p[0], str) and p[0] in _SPEC_KINDS:
                    return False  # field name collides with a spec tag
                proj[k_ast[1]] = p
            elif v_ast[0] == "literal":
                proj[k_ast[1]] = ("lit", v_ast[1])
            elif v_ast[0] == "neg" and v_ast[1][0] == "literal":
                proj[k_ast[1]] = ("lit", -v_ast[1][1])
            elif _expr_ok(v_ast):
                proj[k_ast[1]] = ("expr", v_ast)
            elif (fc := _as_fnchain(v_ast)) is not None:
                proj[k_ast[1]] = ("fnchain", fc[0], fc[1])
            elif (lp := _as_length_chain(v_ast)) is not None:
                proj[k_ast[1]] = ("length", lp)
            elif (kp := _as_keys_chain(v_ast)) is not None:
                proj[k_ast[1]] = (
                    "keyssorted" if kp[1] else "keysunsorted", kp[0]
                )
            elif v_ast[0] == "alt" and _as_path(v_ast[1]) is not None and (
                (d := _scalar_literal(v_ast[2])) is not None
            ):
                proj[k_ast[1]] = ("alt", _as_path(v_ast[1]), d[0])
            elif (sc := _as_strcat(v_ast)) is not None:
                proj[k_ast[1]] = ("strcat", tuple(sc))
            elif (si2 := _as_strinterp(v_ast)) is not None:
                proj[k_ast[1]] = ("strinterp", tuple(si2))
            elif (sp := _as_strpred(v_ast)) is not None:
                proj[k_ast[1]] = ("strpred",) + sp
            elif (cp := _as_capture(v_ast)) is not None:
                proj[k_ast[1]] = ("capture",) + cp
            elif (af := _as_arrayfn(v_ast)) is not None:
                proj[k_ast[1]] = ("arrayfn",) + af
            elif (sl := _as_slice(v_ast)) is not None:
                proj[k_ast[1]] = ("slicearr",) + sl
            elif (si := _as_split_index(v_ast)) is not None:
                proj[k_ast[1]] = ("splitidx",) + si
            elif (sa := _as_split_full(v_ast)) is not None:
                proj[k_ast[1]] = ("splitarr",) + sa
            elif (ie := _as_ifelse(v_ast)) is not None:
                proj[k_ast[1]] = ("ifelse",) + ie
            elif (rd := _as_reduce(v_ast)) is not None:
                proj[k_ast[1]] = ("reduce",) + rd
            else:
                return False
        out.append(("project", proj))
        return True
    return False


# Scalar-expression sub-language compilable to Catalyst: numeric
# arithmetic and path-vs-literal comparisons over paths/literals.
_NUM_OPS = {"+", "-", "*", "/", "%"}
# jq's total order puts null below everything, so null OP number is:
_NULL_CMP = {"<": True, "<=": True, ">": False, ">=": False, "==": False, "!=": True}


# Whitelisted scalar function chains compilable to Catalyst.  Value
# semantics preserved on well-typed data; deltas are the documented
# cast-garbage class (jq aborts on type errors, the native tier
# passes through / NULLs).
_STR_FNS = {
    "ascii_downcase": 0,
    "ascii_upcase": 0,
    "ltrimstr": 1,
    "rtrimstr": 1,
    "tostring": 0,
    "tojson": 0,
    "gsub": 2,
    # r14 growth (VERDICT r13 #4): FIRST-occurrence replace — Spark
    # has no replaceFirst builtin, so the compiled form splices
    # around the first match (regexp_instr + regexp_extract)
    "sub": 2,
}
# NOTE deliberately excludes the transcendentals (exp/log/log2/log10/
# pow): JVM Math.* is only 1-ulp-accurate while the Python tier's
# libm is correctly rounded — measured 1-ulp drift on log2 — and the
# native tier holds a BIT-EQUALITY contract with the Python tier on
# clean data (tests/test_native.py differentials).  floor/ceil are
# exact integer ops and sqrt is IEEE-correctly-rounded on both sides,
# so those compile natively.
_NUM_FNS = {
    "tonumber": 0,
    "floor": 0,
    "ceil": 0,
    "sqrt": 0,
    "fabs": 0,
}

# string predicates compilable inside select(): jq fn name → handled
# in _string_pred_col (startswith/endswith literal; test → rlike)
_STR_PREDS = {"startswith", "endswith", "test", "contains"}


def _regex_portable(pat: str) -> bool:
    """True when the pattern means the same under Python re (the jq
    tier's engine) and Java regex (Catalyst rlike).  Conservative:
    rejects inline groups/flags `(?...)`, unicode properties, and any
    escape outside the shared core — those fall back to the Python
    tier rather than silently diverging (SURVEY J22 dialect note)."""
    if "(?" in pat:
        return False
    import re as _re

    for m in _re.finditer(r"\\(.)", pat):
        ch = m.group(1)
        if ch.isalnum() and ch not in "dDwWsSbBnrtf":
            return False
    return True


def _capture_names(pat: str):
    """Named-group inventory (in appearance order) for a pattern whose
    ``capture`` compiles to per-group ``regexp_extract`` — else None.

    Compilable means the Java/Python semantics are identical AND every
    named group PARTICIPATES in any overall match (jq renders a
    non-participating group as null; regexp_extract renders it '' —
    a value divergence, not just a null-vs-error delta).  Enforced
    conservatively: every '(' is escaped, inside a character class, a
    named group ``(?<name>``, or non-capturing ``(?:``; no '|' outside
    character classes; no zero-admitting quantifier (?, *, {0...})
    after the ')' of any group that contains a named group; escapes
    restricted to the shared re/Java core (like _regex_portable);
    names unique (jq object keys) and identifier-shaped (both regex
    dialects' named-group grammar)."""
    import re as _re

    for m in _re.finditer(r"\\(.)", pat):
        ch = m.group(1)
        if ch.isalnum() and ch not in "dDwWsSbBnrtf":
            return None
    names: list[str] = []
    stack: list[bool] = []  # per open group: contains a named group?
    i, n = 0, len(pat)
    in_class = False
    while i < n:
        ch = pat[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            continue
        if ch == "|":
            return None
        if ch == "(":
            m = _re.match(r"\(\?<([A-Za-z_][A-Za-z0-9_]*)>", pat[i:])
            if m:
                names.append(m.group(1))
                stack.append(True)
                i += m.end()
                continue
            if pat.startswith("(?:", i):
                stack.append(False)
                i += 3
                continue
            return None
        if ch == ")":
            if not stack:
                return None
            has_named = stack.pop()
            if has_named and stack:
                stack[-1] = True
            rest = pat[i + 1 :]
            if has_named and (
                rest[:1] in ("?", "*") or _re.match(r"\{0", rest)
            ):
                return None
            i += 1
            continue
        i += 1
    if in_class or stack or not names or len(set(names)) != len(names):
        return None
    return tuple(names)


def _as_length_chain(ast: AST) -> Optional[Path]:
    """``.path | length`` (or bare ``length``) → the path, else None."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "call" or last[1] != "length" or last[2]:
        return None
    path: tuple = ()
    for n in nodes[:-1]:
        p = _as_path(n)
        if p is None:
            return None
        path = path + p
    return path


def _as_keys_chain(ast: AST):
    """``.path | keys`` / ``.path | keys_unsorted`` (or bare forms) →
    (path, sorted?) else None.  ``keys`` sorts by codepoint — exactly
    the order variant objects store their fields in (`_variant_keys`);
    ``keys_unsorted`` is document order, which variants LOSE — it
    reads `json_object_keys` over the raw text instead (r10 scalar
    tier; r11 under iterates too, via the element raw-text twin —
    posexplode-indexed at level 0, the r9 ``ex`` twin at mid levels)."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "call" or last[1] not in ("keys", "keys_unsorted") or last[2]:
        return None
    path: tuple = ()
    for n in nodes[:-1]:
        p = _as_path(n)
        if p is None:
            return None
        path = path + p
    return path, last[1] == "keys"


def _scalar_literal(ast: AST):
    """(value,) for a (possibly negated) non-bool scalar literal,
    else None — a 1-tuple so falsy values like 0/"" still signal
    presence."""
    if ast[0] == "literal" and not isinstance(ast[1], bool) and isinstance(
        ast[1], (int, float, str)
    ):
        return (ast[1],)
    if ast[0] == "neg" and ast[1][0] == "literal" and isinstance(
        ast[1][1], (int, float)
    ) and not isinstance(ast[1][1], bool):
        return (-ast[1][1],)
    return None


def _pipe_list(ast: AST, acc: list) -> None:
    if ast[0] == "pipe":
        _pipe_list(ast[1], acc)
        _pipe_list(ast[2], acc)
    else:
        acc.append(ast)


def _fn_info(node: AST):
    """(name, [literal args]) for a whitelisted call node, else None."""
    if node[0] != "call":
        return None
    name, args = node[1], node[2]
    arity = _STR_FNS.get(name, _NUM_FNS.get(name))
    if name == "type":
        arity = 0  # head-only; _as_fnchain rejects mid-chain type
    if arity is None or len(args) != arity:
        return None
    lits = []
    for a in args:
        if a[0] != "literal" or not isinstance(a[1], str):
            return None
        lits.append(a[1])
    if name in ("gsub", "sub") and not _regex_portable(lits[0]):
        # the pattern must mean the same under re and Java regex
        return None
    return (name, lits)


def _as_fnchain(ast: AST):
    """path + trailing whitelisted-fn suffix → (path, [(name, args)]),
    else None.  Handles both pipe nestings."""
    nodes: list = []
    _pipe_list(ast, nodes)
    fns = []
    while nodes:
        info = _fn_info(nodes[-1])
        if info is None:
            break
        fns.insert(0, info)
        nodes.pop()
    if not fns:
        return None
    # `type` reads the exact-typed variant of the PATH value — only
    # meaningful as the chain head (mid-chain the running value's
    # jq type is not recoverable from its string view)
    if any(f[0] == "type" for f in fns[1:]):
        return None
    path: tuple = ()
    for n in nodes:
        p = _as_path(n)
        if p is None:
            return None
        path = path + p
    return (path, fns)


def _as_strcat(ast: AST):
    """Linear jq ``+`` tree over STRING literals and simple paths
    (at least one of each) → part list [("lit", s) | ("path", p)],
    else None.  The string literal anchors the chain's type: jq then
    either concatenates (string operands), passes null as the
    identity, or ABORTS (any other operand type) — the abort maps to
    the documented NULL-delta class in the compiled form."""
    parts: list = []

    def walk(n: AST) -> bool:
        if n[0] == "binop" and n[1] == "+":
            return walk(n[2]) and walk(n[3])
        if n[0] == "literal" and isinstance(n[1], str):
            parts.append(("lit", n[1]))
            return True
        p = _as_path(n)
        if p is not None and not (
            p and isinstance(p[0], str) and p[0] in _SPEC_KINDS
        ):
            parts.append(("path", p))
            return True
        return False

    if not walk(ast):
        return None
    if not any(k == "lit" for k, _ in parts):
        return None
    if not any(k == "path" for k, _ in parts):
        return None
    return parts


def _as_strinterp(ast: AST):
    """jq string INTERPOLATION ``"a\\(.p)b"`` with simple-path
    interpolants → part list [("lit", s) | ("path", p) |
    ("pathjson", p)], else None.  Plain interpolation applies
    ``tostring`` to every value (any type, never errors;
    null/missing → "null"), which is exactly the number-normalized
    raw-text view ``_tostring_view`` compiles; ``@text`` is defined
    as tostring so it compiles to the SAME parts (r10).  ``@json``
    marks interpolants "pathjson" — the tojson view `_tojson_view`
    (strings quoted+escaped, numbers canonical); ``@base64`` marks
    them "pathb64" — utf-8 base64 of the tostring view (`_b64_view`).
    Other @formats (@csv/@html/...) stay on the Python tier."""
    if ast[0] != "string" or ast[2] not in (None, "@text", "@json", "@base64"):
        return None
    pkind = {"@json": "pathjson", "@base64": "pathb64"}.get(ast[2], "path")
    parts: list = []
    for p in ast[1]:
        if isinstance(p, str):
            parts.append(("lit", p))
        else:
            pp = _as_path(p)
            if pp is None or (
                pp and isinstance(pp[0], str) and pp[0] in _SPEC_KINDS
            ):
                return None
            parts.append((pkind, pp))
    if not any(k != "lit" for k, _ in parts):
        return None
    return parts


def _strcat_col(parts, var_of) -> Column:
    """Compile a strcat part list given ``var_of(path) -> variant
    Column``.  Per part: string content for JSON strings, '' for
    null/missing (jq's ``+`` null identity), and any OTHER type
    poisons the whole result to NULL (jq aborts the row — the
    documented error-channel delta class)."""
    segs = []
    poison = F.lit(False)
    for kind, val in parts:
        if kind == "lit":
            segs.append(F.lit(val))
        else:
            v = var_of(val)
            vt = F.schema_of_variant(v)
            bad = (
                vt.isNotNull()
                & (vt != F.lit("STRING"))
                & (vt != F.lit("VOID"))
            )
            poison = poison | bad
            segs.append(
                F.coalesce(F.try_variant_get(v, "$", "string"), F.lit(""))
            )
    return F.when(~poison, F.concat(*segs))


def _apply_fnchain(c: Column, fns) -> Column:
    """Apply a whitelisted fn chain to a STRING-typed Column (the
    get_json_object / from_json string view of the value).
    ``is_num`` tracks whether the running value is a NUMBER (output
    of tonumber/floor/ceil/sqrt/fabs) — tojson renders numbers bare
    with integral normalization, strings quoted."""
    import string as _string

    is_num = False
    for name, args in fns:
        is_num_next = name in _NUM_FNS
        if name == "ascii_downcase":
            # jq's ascii_* fold ONLY A-Z — translate, not lower()
            # (lower() would also fold unicode, a real semantic delta)
            c = F.translate(c, _string.ascii_uppercase, _string.ascii_lowercase)
        elif name == "ascii_upcase":
            c = F.translate(c, _string.ascii_lowercase, _string.ascii_uppercase)
        elif name == "ltrimstr":
            pre = args[0]
            c = F.when(c.startswith(pre), F.substring(c, len(pre) + 1, 2**31 - 1)).otherwise(c)
        elif name == "rtrimstr":
            suf = args[0]
            c = F.when(
                c.endswith(suf), c.substr(F.lit(1), F.length(c) - len(suf))
            ).otherwise(c)
        elif name == "gsub":
            pat, repl = args
            # literal replacement: escape Java's $-group refs and
            # backslashes so the text is inserted verbatim (jq's
            # \(...)-interpolating replacements never reach here —
            # they aren't string literals)
            esc = repl.replace("\\", "\\\\").replace("$", "\\$")
            c = F.regexp_replace(c, pat, esc)
        elif name == "sub":
            # r14 growth (VERDICT r13 #4): replace the FIRST match
            # only.  regexp_instr finds its 1-based start,
            # regexp_extract(…, 0) its text; splice the literal
            # replacement between the surrounding substrings (no
            # regexp_replace, so no $/backslash escaping needed).
            # No match (idx = 0) keeps the input, like jq; an empty
            # match at position 1 prepends, like jq sub("";"x").
            pat, repl = args
            idx = F.regexp_instr(c, F.lit(pat))
            m = F.regexp_extract(c, pat, 0)
            spliced = F.concat(
                c.substr(F.lit(1), idx - F.lit(1)),
                F.lit(repl),
                c.substr(idx + F.length(m), F.length(c) + F.lit(1)),
            )
            c = F.when(idx > 0, spliced).otherwise(c)
        elif name == "tostring":
            # the string view of a JSON value IS jq's tostring (both
            # get_json_object and from_json string fields re-serialize
            # compact JSON; plain strings appear as their content);
            # only null needs mapping: jq tostring(null) = "null"
            c = F.coalesce(c, F.lit("null"))
        elif name == "tojson":
            # NON-leading tojson (leading is special-cased to the
            # variant-gated _tojson_view): a NUMBER renders bare with
            # the integral normalization (floor|tojson of 7.0 → "7");
            # a string quotes; NULL after a numeric fn stays NULL
            # (jq aborted upstream — the documented delta class)
            if is_num:
                d = c.try_cast("double")
                intish = (
                    d.isNotNull()
                    & (d == F.floor(d))
                    & (F.abs(d) < F.lit(1e17))
                )
                s = d.cast("string")
                # r11: the cast prints Double.toString scientific
                # form for |v| >= 1e7 / < 1e-3 — normalize to jq's
                # float text like the leading views do
                c = F.when(intish, d.cast("bigint").cast("string")).otherwise(
                    F.when(s.rlike(_SCI_TOKEN_RE), _sci_python_text(s)).otherwise(s)
                )
            else:
                c = _json_quote(c)
        elif name == "tonumber":
            # try_cast: garbage strings are the documented NULL-delta
            # class (jq aborts the row); never an ANSI runtime crash
            c = c.try_cast("double")
        elif name == "floor":
            c = F.floor(c.try_cast("double"))
        elif name == "ceil":
            c = F.ceil(c.try_cast("double"))
        elif name == "sqrt":
            c = F.sqrt(c.try_cast("double"))
        elif name == "fabs":
            c = F.abs(c.try_cast("double"))
        is_num = is_num_next

    return c


# array functions compilable in projections (scalar, non-iterate tier)
_ARRAY_FNS = {"add", "max", "min", "first", "last", "reverse", "sort", "unique", "join", "map"}
# string predicates compilable as PROJECTED booleans
_PROJ_STR_PREDS = {"test", "contains", "startswith", "endswith"}


def _path_prefix(nodes: list) -> Optional[Path]:
    path: tuple = ()
    for n in nodes:
        p = _as_path(n)
        if p is None:
            return None
        path = path + p
    return path


def _as_strpred(ast: AST):
    """``.path | test("re")`` (or contains/startswith/endswith) as a
    projected boolean → (path, name, literal), else None."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "call" or last[1] not in _PROJ_STR_PREDS:
        return None
    args = last[2]
    if len(args) != 1 or args[0][0] != "literal" or not isinstance(args[0][1], str):
        return None
    if last[1] == "test" and not _regex_portable(args[0][1]):
        return None
    path = _path_prefix(nodes[:-1])
    if path is None:
        return None
    return (path, last[1], args[0][1])


def _as_capture(ast: AST):
    """``.path | capture("(?<x>...)-(?<y>...)")`` as a projected
    OBJECT of named groups → (path, pattern, names), else None (r14
    growth, VERDICT r13 #4).  The pattern gate (`_capture_names`)
    guarantees every named group participates in any match, so each
    declared struct field is one ``regexp_extract`` by group index."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "call" or last[1] != "capture":
        return None
    args = last[2]
    if len(args) != 1 or args[0][0] != "literal" or not isinstance(
        args[0][1], str
    ):
        return None
    names = _capture_names(args[0][1])
    if names is None:
        return None
    path = _path_prefix(nodes[:-1])
    if path is None:
        return None
    return (path, args[0][1], names)


def _as_slice(ast: AST):
    """``.path[lo:hi]`` as a projection value → (path, lo, hi) with
    lo/hi int|None (r13 growth, VERDICT r12 #5 — formerly rejected
    because jq's slice also applies to STRING values).  The compiled
    column (`_slice_col`) gates on the EXACT-TYPED variant so each
    declared shape honors only its own type: ARRAY values slice under
    an array decl, STRING values substring (by codepoints) under a
    string decl; the cross-type cases and OBJECT inputs are NULL (jq
    errors on objects — the documented NULL-delta class)."""
    if ast[0] != "slice_on":
        return None
    base = _as_path(ast[1])
    if base is None or (
        base and isinstance(base[0], str) and base[0] in _SPEC_KINDS
    ):
        return None

    def lit_idx(n):
        if n is None:
            return None, True
        if (
            n[0] == "literal"
            and isinstance(n[1], int)
            and not isinstance(n[1], bool)
        ):
            return n[1], True
        if (
            n[0] == "neg"
            and n[1][0] == "literal"
            and isinstance(n[1][1], int)
            and not isinstance(n[1][1], bool)
        ):
            return -n[1][1], True
        return None, False

    lo, ok_lo = lit_idx(ast[2])
    hi, ok_hi = lit_idx(ast[3])
    if not (ok_lo and ok_hi):
        return None
    return (base, lo, hi)


def _as_arrayfn(ast: AST):
    """``.path | add/max/min/first/last/reverse/sort/unique/join/map``
    → (path, fn, args), else None."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "call" or last[1] not in _ARRAY_FNS:
        return None
    name, args = last[1], last[2]
    path = _path_prefix(nodes[:-1])
    if path is None:
        return None
    if name == "join":
        if len(args) != 1 or args[0][0] != "literal" or not isinstance(args[0][1], str):
            return None
        return (path, "join", (args[0][1],))
    if name == "map":
        if len(args) != 1:
            return None
        mp = _as_path(args[0])
        if not mp or not all(isinstance(s, str) for s in mp):
            return None
        return (path, "map", (mp,))
    if args:
        return None
    return (path, name, ())


def _as_reduce(ast: AST):
    """``reduce .path[] as $v (INIT; UPDATE)`` with a numeric INIT
    and an arithmetic UPDATE over ``.`` (the accumulator), ``$v`` and
    numeric literals (+ − * /) → (path, init, update_ast, varname),
    else None.  Compiles to a Catalyst ``aggregate()`` fold over the
    once-parsed array — custom reductions (sum of squares, weighted
    folds) stay JVM-side, generalizing the fixed ``add`` arrayfn.

    jq deltas are the documented cast-garbage class shared by every
    arrayfn: jq ABORTS on a null/typed-wrong element (number + null)
    or division by zero, this tier propagates NULL / IEEE inf which
    the declared-type try_cast turns into NULL."""
    if ast[0] != "reduce":
        return None
    src, pat, init, upd = ast[1], ast[2], ast[3], ast[4]
    if pat[0] != "pvar" or src[0] != "iterate_on":
        return None
    path = _as_path(src[1])
    if not path or not all(isinstance(s, str) for s in path):
        return None
    if path[0] in _SPEC_KINDS:
        return None
    d = _scalar_literal(init)
    if d is None or not isinstance(d[0], (int, float)) or isinstance(d[0], bool):
        return None
    if not _reduce_update_ok(upd, pat[1]):
        return None
    return (path, d[0], upd, pat[1])


def _reduce_update_ok(ast: AST, var: str) -> bool:
    tag = ast[0]
    if tag == "identity":
        return True
    if tag == "var":
        return ast[1] == var
    if tag == "literal":
        return isinstance(ast[1], (int, float)) and not isinstance(ast[1], bool)
    if tag == "neg":
        return _reduce_update_ok(ast[1], var)
    if tag == "binop" and ast[1] in ("+", "-", "*", "/"):
        return _reduce_update_ok(ast[2], var) and _reduce_update_ok(ast[3], var)
    return False


def _reduce_col(json_col: Column, path: Path, init, upd: AST) -> Column:
    # dup-key aware (r12): the fold must see the LAST occurrence's
    # array like jq; array element order survives the variant cast
    raw = _dup_fixed_json_text(json_col, path)
    arr = F.from_json(raw, T.ArrayType(T.DoubleType()))

    def build(a: AST, acc: Column, x: Column) -> Column:
        tag = a[0]
        if tag == "identity":
            return acc
        if tag == "var":
            return x
        if tag == "literal":
            return F.lit(float(a[1]))
        if tag == "neg":
            return -build(a[1], acc, x)
        op, l, r = a[1], build(a[2], acc, x), build(a[3], acc, x)
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        return l / r

    return F.aggregate(
        arr, F.lit(float(init)), lambda acc, x: build(upd, acc, x)
    )


def _as_split_index(ast: AST):
    """``.path | split("sep")[i]`` → (path, sep, i), else None.  jq's
    split/1 is a LITERAL separator (the regex form is split/2)."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "index_on":
        return None
    call, idx = last[1], last[2]
    if call[0] != "call" or call[1] != "split" or len(call[2]) != 1:
        return None
    sep = call[2][0]
    if sep[0] != "literal" or not isinstance(sep[1], str) or not sep[1]:
        return None
    if idx[0] != "literal" or not isinstance(idx[1], int) or isinstance(idx[1], bool):
        return None
    if idx[1] < 0:
        return None
    path = _path_prefix(nodes[:-1])
    if path is None:
        return None
    return (path, sep[1], idx[1])


def _as_split_full(ast: AST):
    """``.path | split("sep")`` (no index) → (path, sep), else None —
    r12 growth: the full split array in a projection (``splitarr``
    spec; the indexed form is ``splitidx`` above).  jq's split/1 is a
    LITERAL separator (the regex form is split/2)."""
    nodes: list = []
    _pipe_list(ast, nodes)
    last = nodes[-1]
    if last[0] != "call" or last[1] != "split" or len(last[2]) != 1:
        return None
    sep = last[2][0]
    if sep[0] != "literal" or not isinstance(sep[1], str) or not sep[1]:
        return None
    path = _path_prefix(nodes[:-1])
    if path is None:
        return None
    return (path, sep[1])


def _as_ifelse(ast: AST):
    """``if COND then V else W end`` with a select-compilable COND and
    literal/path branches → (filters, then_spec, else_spec)."""
    if ast[0] != "if" or len(ast[1]) != 1 or ast[2] is None:
        return None
    cond, then_ast = ast[1][0]
    filters = _parse_filters(cond)
    if filters is None:
        return None

    def branch(b: AST):
        if b[0] == "literal" and isinstance(b[1], (int, float, str, bool)):
            return ("lit", b[1])
        if (d := _scalar_literal(b)) is not None:
            return ("lit", d[0])
        p = _as_path(b)
        if p is not None:
            return ("path", p)
        return None

    t = branch(then_ast)
    e = branch(ast[2])
    if t is None or e is None:
        return None
    return (filters, t, e)


def _proves_num(ast: AST) -> bool:
    """True when this subtree — IF jq evaluates it without error —
    is a NUMBER.  jq's arithmetic is polymorphic (jqlib
    evaluator.py's binop table): ``+`` also concatenates
    strings/arrays and merges objects, ``-`` also subtracts arrays,
    ``*`` also repeats strings and merges objects, ``/`` also splits
    strings.  Per-op proof rules:

    - numeric literal / ``neg`` / ``%`` prove numbers outright
      (negation and ``%`` have no non-number overload in jq);
    - ``+ - /``: ONE proven side suffices — every non-number
      overload of these pairs two non-numeric operands, so a proven
      numeric side forces number-or-error (the error lands in the
      documented abort-delta class);
    - ``*``: BOTH sides must be proven, because string repetition
      ``"ab" * 3`` pairs a string with a NUMBER — a numeric literal
      operand proves nothing (r10 fix: the old rule treated any
      ``- * /`` as an anchor, so ``.a + .b * 2`` with string ``.b``
      compiled to double arithmetic and yielded NULL where jq
      returns ``"xyy"``).

    Unproven arithmetic falls back to the Python tier (string-literal
    ``+`` chains compile via the strcat spec instead)."""
    tag = ast[0]
    if tag == "literal":
        return isinstance(ast[1], (int, float)) and not isinstance(ast[1], bool)
    if tag == "neg":
        return True
    if tag == "binop":
        op, l, r = ast[1], ast[2], ast[3]
        if op == "%":
            return True
        if op == "*":
            return _proves_num(l) and _proves_num(r)
        if op in ("+", "-", "/"):
            return _proves_num(l) or _proves_num(r)
    return False


def _expr_kind(ast: AST, in_arith: bool = False) -> Optional[str]:
    """'num' | 'bool' for a compilable expression, None = not
    compilable.  Arithmetic and neg require NUMERIC operands — a
    comparison used as an arithmetic operand (legal jq: true+1
    errors, (.k>1)+1 errors too — but booleans would type-mismatch in
    Catalyst) must reject so auto mode falls back to Python.
    ``in_arith`` marks nodes inside an arithmetic chain whose MAXIMAL
    root already passed the `_proves_num` check (checked once per
    chain: inner unproven subtrees of a proven root can only produce
    value/NULL-where-jq-aborts rows, the documented delta class —
    never a different value where jq is valued)."""
    tag = ast[0]
    if tag == "literal":
        ok = isinstance(ast[1], (int, float)) and not isinstance(ast[1], bool)
        return "num" if ok else None
    if tag == "neg":
        return "num" if _expr_kind(ast[1]) == "num" else None
    if _as_path(ast) is not None:
        return "num"  # read as double
    if tag == "binop":
        op, l, r = ast[1], ast[2], ast[3]
        if op in _NUM_OPS:
            if not in_arith and not _proves_num(ast):
                return None  # polymorphic jq arithmetic without proof
            ok = (
                _expr_kind(l, True) == "num"
                and _expr_kind(r, True) == "num"
            )
            return "num" if ok else None
        if op in _CMP_OPS:
            # path-vs-NUMERIC-literal only (either side): the path is
            # read as double, so string/bool literals stay in Python
            def num_lit(a):
                return a[0] == "literal" and isinstance(a[1], (int, float)) and not isinstance(a[1], bool)

            ok = (
                _as_path(l) is not None
                and num_lit(r)
                or _as_path(r) is not None
                and num_lit(l)
            )
            return "bool" if ok else None
    return None


def _expr_ok(ast: AST) -> bool:
    return _expr_kind(ast) is not None


def _expr_paths(ast: AST, acc: list) -> None:
    """Collect paths referenced by a compilable expression."""
    tag = ast[0]
    p = _as_path(ast)
    if p is not None and tag != "identity":
        acc.append(p)
        return
    if tag == "neg":
        _expr_paths(ast[1], acc)
    elif tag == "binop":
        _expr_paths(ast[2], acc)
        _expr_paths(ast[3], acc)


def _compile_expr(ast: AST, num_path_col) -> Column:
    """Expression AST → Column.  ``num_path_col(path)`` must return
    the path's value as a double Column (NULL when missing).

    jq semantics preserved: ``+`` treats null as identity (null+x=x,
    null+null=null); comparisons use jq's total order for null vs
    literal.  Delta (documented): on `- * / %` with a null operand jq
    ABORTS while this tier yields NULL; on non-numeric garbage values
    the cast yields NULL where jq would abort."""
    tag = ast[0]
    if tag == "literal":
        return F.lit(ast[1])
    if tag == "neg":
        return -_compile_expr(ast[1], num_path_col)
    p = _as_path(ast)
    if p is not None:
        return num_path_col(p)
    op, l, r = ast[1], ast[2], ast[3]
    if op in _CMP_OPS:
        if _as_path(l) is not None and r[0] == "literal":
            path, lit, cop = _as_path(l), r[1], op
        else:
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            path, lit, cop = _as_path(r), l[1], flip.get(op, op)
        return _cmp_with_null_order(num_path_col(path), cop, lit)
    lc = _compile_expr(l, num_path_col)
    rc = _compile_expr(r, num_path_col)
    if op == "+":
        return F.when(lc.isNull(), rc).when(rc.isNull(), lc).otherwise(lc + rc)
    if op == "-":
        return lc - rc
    if op == "*":
        return lc * rc
    if op == "/":
        return lc.cast("double") / rc.cast("double")
    if op == "%":
        return lc.cast("long") % rc.cast("long")
    raise AssertionError(op)


def _as_path(ast: AST) -> Optional[Path]:
    """Pure access chain → path tuple, else None."""
    acc: list = []
    if not _flatten_path_only(ast, acc):
        return None
    return tuple(acc)


def _flatten_path_only(ast: AST, acc: list) -> bool:
    tag = ast[0]
    if tag == "identity":
        return True
    if tag == "pipe":
        return _flatten_path_only(ast[1], acc) and _flatten_path_only(ast[2], acc)
    if tag == "field":
        acc.append(ast[1])
        return True
    if tag == "index_on":
        if not _flatten_path_only(ast[1], acc):
            return False
        idx = ast[2]
        if idx[0] == "literal" and isinstance(idx[1], (int, str)) and not isinstance(idx[1], bool):
            acc.append(idx[1])
            return True
        return False
    return False


_CMP_OPS = {"==", "!=", "<", "<=", ">", ">="}


def _parse_filters(cond: AST) -> Optional[list]:
    """select condition → AND-list of path-vs-literal comparisons
    (each element a Filter or an OrGroup of Filters)."""
    if cond[0] == "and":
        l = _parse_filters(cond[1])
        r = _parse_filters(cond[2])
        if l is None or r is None:
            return None
        return l + r
    if cond[0] == "or":
        l = _parse_filters(cond[1])
        r = _parse_filters(cond[2])
        if l is None or r is None or len(l) != 1 or len(r) != 1:
            return None  # OR of ANDs — Python tier
        members: list[Filter] = []
        for side in (l[0], r[0]):
            members.extend(side.filters if isinstance(side, OrGroup) else [side])
        return [OrGroup(members)]
    if cond[0] == "binop" and cond[1] in _CMP_OPS:
        op, lhs, rhs = cond[1], cond[2], cond[3]
        p = _as_path(lhs)
        if p is not None and rhs[0] == "literal":
            return [Filter(p, op, rhs[1])]
        p = _as_path(rhs)
        if p is not None and lhs[0] == "literal":
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return [Filter(p, flip.get(op, op), lhs[1])]

        def _len_lit(a):
            return (
                a[0] == "literal"
                and isinstance(a[1], (int, float))
                and not isinstance(a[1], bool)
            )

        # r11: `(.path | length) OP n` — the array-size / key-count /
        # string-length gate (`select(.tags | length > 1)`)
        lp = _as_length_chain(lhs)
        if lp is not None and _len_lit(rhs):
            return [Filter(lp, op, rhs[1], fn="length")]
        lp = _as_length_chain(rhs)
        if lp is not None and _len_lit(lhs):
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return [Filter(lp, flip.get(op, op), lhs[1], fn="length")]

        def num_lit(a):
            return a[0] == "literal" and isinstance(a[1], (int, float)) and not isinstance(a[1], bool)

        if _expr_ok(lhs) and num_lit(rhs):
            return [Filter((), op, rhs[1], lhs_expr=lhs)]
        if _expr_ok(rhs) and num_lit(lhs):
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return [Filter((), flip.get(op, op), lhs[1], lhs_expr=rhs)]
        return None
    p = _as_path(cond)
    if p is not None:
        return [Filter(p, "truthy", None)]
    # trailing-call predicates applied to a path prefix (bare call
    # form applies to `.`): startswith/endswith/test (string preds;
    # test patterns must be portable between Python re and Java regex
    # or the program falls back), `not` (negated jq truthiness), and
    # `has(key)` (object-key / array-index membership)
    nodes: list = []
    _pipe_list(cond, nodes)
    call = nodes[-1]

    def prefix_path():
        path: tuple = ()
        for n in nodes[:-1]:
            pp = _as_path(n)
            if pp is None:
                return None
            path = path + pp
        return path

    # `.path | length OP n` — jq's pipe binds looser than the
    # comparison, so this arrives as a path prefix + a binop whose
    # LHS is the bare `length` call (r11)
    if call[0] == "binop" and call[1] in _CMP_OPS and len(nodes) > 1:
        op, lhs, rhs = call[1], call[2], call[3]

        def bare_len(a):
            return a[0] == "call" and a[1] == "length" and not a[2]

        def n_lit(a):
            return (
                a[0] == "literal"
                and isinstance(a[1], (int, float))
                and not isinstance(a[1], bool)
            )

        path = prefix_path()
        if path is not None:
            if bare_len(lhs) and n_lit(rhs):
                return [Filter(path, op, rhs[1], fn="length")]
            if bare_len(rhs) and n_lit(lhs):
                flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
                return [Filter(path, flip.get(op, op), lhs[1], fn="length")]
        return None
    if call[0] != "call":
        return None

    if (
        call[1] in _STR_PREDS
        and len(call[2]) == 1
        and call[2][0][0] == "literal"
        and isinstance(call[2][0][1], str)
    ):
        pat = call[2][0][1]
        if call[1] == "test" and not _regex_portable(pat):
            return None
        path = prefix_path()
        return None if path is None else [Filter(path, call[1], pat)]
    if call[1] == "not" and not call[2]:
        path = prefix_path()
        return None if path is None else [Filter(path, "not_truthy", None)]
    if (
        call[1] == "has"
        and len(call[2]) == 1
        and call[2][0][0] == "literal"
        and isinstance(call[2][0][1], (int, str))
        and not isinstance(call[2][0][1], bool)
    ):
        path = prefix_path()
        return None if path is None else [Filter(path, "has", call[2][0][1])]
    return None


def analyze_program(program: str) -> Optional[NativeIR]:
    try:
        ast = parse(program)
    except Exception:
        return None
    # r11: trailing bare ``keys`` / ``keys_unsorted`` at the TOP level
    # (``.a | keys``, ``.[] | keys_unsorted``) — strip the call and
    # record it; the remaining chain analyzes as usual and the call
    # applies to its final value.  Only a strict extension: these
    # programs previously always fell back to the Python tier (the
    # in-projection forms go through _as_keys_chain instead).
    _nodes: list = []
    _pipe_list(ast, _nodes)
    single_call: Optional[str] = None
    if (
        _nodes
        and _nodes[-1][0] == "call"
        and _nodes[-1][1] in ("keys", "keys_unsorted", "length")
        and not _nodes[-1][2]
    ):
        single_call = _nodes[-1][1]
        rest = _nodes[:-1]
        if rest:
            ast = rest[0]
            for n in rest[1:]:
                ast = ("pipe", ast, n)
        else:
            ast = ("identity",)
    return _analyze_ast(ast, single_call)


def _analyze_ast(ast: AST, single_call: Optional[str] = None) -> Optional[NativeIR]:
    stages: list = []
    if not _flatten(ast, stages):
        return None
    ir = NativeIR()
    seen_iterate = False
    post_steps: list = []
    for st in stages:
        kind = st[0]
        if kind == "step":
            # filters record absolute paths at select-time, so steps
            # before/after a select can both extend the base path
            if seen_iterate:
                post_steps.append(st[1])
            else:
                ir.pre_path = ir.pre_path + (st[1],)
        elif kind == "iterate":
            lim = st[1] if len(st) > 1 else None
            if seen_iterate:
                if ir.post_filters:
                    # select BETWEEN iterates — not expressible as a
                    # last-element filter; Python tier handles it
                    return None
                ir.mid_paths.append(tuple(post_steps))
                post_steps = []
            else:
                seen_iterate = True
            ir.iter_limits.append(lim)
        elif kind == "select":
            fl = st[1]

            def rebase(item, base):
                if isinstance(item, OrGroup):
                    return OrGroup([rebase(f, base) for f in item.filters])
                return Filter(base + item.lhs, item.op, item.lit, lhs_expr=item.lhs_expr, fn=item.fn)

            if seen_iterate:
                base = tuple(post_steps)
                ir.post_filters.extend(rebase(f, base) for f in fl)
            else:
                if post_steps:
                    return None
                ir.pre_filters.extend(rebase(f, ir.pre_path) for f in fl)
        elif kind == "project":
            base = tuple(post_steps) if seen_iterate else ir.pre_path
            proj = {}
            for k, v in st[1].items():
                if isinstance(v, tuple) and v and v[0] == "lit":
                    proj[k] = v
                elif isinstance(v, tuple) and v and v[0] == "expr":
                    proj[k] = ("expr", v[1], base)  # paths inside are base-relative
                elif isinstance(v, tuple) and v and v[0] == "fnchain":
                    proj[k] = ("fnchain", tuple(base) + v[1], v[2])
                elif isinstance(v, tuple) and v and v[0] == "alt":
                    proj[k] = ("alt", tuple(base) + v[1], v[2])
                elif isinstance(v, tuple) and v and v[0] == "length":
                    proj[k] = ("length", tuple(base) + v[1])
                elif isinstance(v, tuple) and v and v[0] in (
                    "keyssorted",
                    "keysunsorted",
                ):
                    proj[k] = (v[0], tuple(base) + v[1])
                elif isinstance(v, tuple) and v and v[0] in (
                    "strpred",
                    "arrayfn",
                    "splitidx",
                    "splitarr",
                    "reduce",
                ):
                    proj[k] = (v[0], tuple(base) + v[1]) + v[2:]
                elif isinstance(v, tuple) and v and v[0] in (
                    "slicearr",
                    "capture",
                ):
                    if seen_iterate:
                        # slices/captures under an iterate stay
                        # Python-tier (r13/r14 scope: scalar
                        # projections only)
                        return None
                    proj[k] = (v[0], tuple(base) + v[1]) + v[2:]
                elif isinstance(v, tuple) and v and v[0] in ("strcat", "strinterp"):
                    proj[k] = (
                        v[0],
                        tuple(
                            (pk, tuple(base) + pv) if pk != "lit" else (pk, pv)
                            for pk, pv in v[1]
                        ),
                    )
                elif isinstance(v, tuple) and v and v[0] == "ifelse":
                    _, fl, t_spec, e_spec = v

                    def rebase_f(item, b):
                        if isinstance(item, OrGroup):
                            return OrGroup([rebase_f(f, b) for f in item.filters])
                        return Filter(
                            tuple(b) + item.lhs, item.op, item.lit,
                            lhs_expr=item.lhs_expr, fn=item.fn,
                        )

                    def rebase_b(sp, b):
                        if sp[0] == "path":
                            return ("path", tuple(b) + sp[1])
                        return sp

                    proj[k] = (
                        "ifelse",
                        [rebase_f(f, base) for f in fl],
                        rebase_b(t_spec, base),
                        rebase_b(e_spec, base),
                    )
                else:
                    full = base + v
                    if full and isinstance(full[0], str) and full[0] in _SPEC_KINDS:
                        return None  # field name collides with a spec tag
                    proj[k] = full
            ir.project = proj
            ir.iterate = seen_iterate
            if single_call is not None:
                # keys over a CONSTRUCTED object — Python tier
                return None
            # projection must be final
            return ir if st is stages[-1] else None
    ir.iterate = seen_iterate
    if seen_iterate:
        ir.single_path = tuple(post_steps) if post_steps else ()
    else:
        ir.single_path = ir.pre_path
        ir.pre_path = ()
    ir.single_call = single_call
    return ir


def analyze_program_single_wrap(
    program: str, fname: str
) -> Optional[NativeIR]:
    """r11: bare single-TYPE programs whose TAIL is a projection-value
    shape — the jq1 style ``.a | tostring``, ``.x[] | .a | floor``,
    ``"pfx-\\(.a)"`` — wrap that tail as a synthetic one-field object
    (``{col1: (<tail>)}``) and run the standard project analysis.
    Sound because both tiers marshal a single-TYPE output and a
    project field through the same rules (the bare-vs-named
    differential pins the DISPATCH side; the spec compilers pin the
    value side).  The split point keeps every iterate / select /
    limit stage in the pipe PREFIX, since project values cannot
    contain them; a tail that is itself an object construct is
    rejected (a real user object marshals the WHOLE object into
    col1 — the long-standing exclusion)."""
    try:
        ast = parse(program)
    except Exception:
        return None
    nodes: list = []
    _pipe_list(ast, nodes)

    def _has_iter(n) -> bool:
        if isinstance(n, (list, tuple)):
            if isinstance(n, tuple) and n and n[0] == "iterate_on":
                return True
            return any(_has_iter(x) for x in n)
        return False

    split = 0
    for i, n in enumerate(nodes):
        if _has_iter(n) or (
            isinstance(n, tuple)
            and n
            and n[0] == "call"
            and n[1] in ("select", "limit", "first")
        ):
            split = i + 1
    tail = nodes[split:]
    if not tail:
        return None
    value = tail[0]
    for n in tail[1:]:
        value = ("pipe", value, n)
    if value[0] == "object":
        return None
    wrapped: AST = ("object", [(("literal", fname), value)])
    if split:
        new_ast: AST = nodes[0]
        for n in nodes[1:split]:
            new_ast = ("pipe", new_ast, n)
        new_ast = ("pipe", new_ast, wrapped)
    else:
        new_ast = wrapped
    ir = _analyze_ast(new_ast)
    if ir is None:
        return None
    ir.wrapped_single = True
    return ir


# ---------------------------------------------------------------------------
# IR → Columns
# ---------------------------------------------------------------------------


def _json_path(p: Path) -> str:
    out = "$"
    for s in p:
        if isinstance(s, int):
            out += f"[{s}]"
        else:
            out += f".{s}"
    return out


# Duplicate-key suspect gate (r12, VERDICT r11 #4): the SAME quoted
# key token appears twice in key position anywhere in the document.
# Over-approximate by design — the same key at two different nesting
# levels also matches — which is SAFE: the substituted variant-sourced
# value equals the text-sourced value on any document without true
# duplicates (pinned by test_native_dup_key_gate_false_positive_safe).
# jq parses duplicate keys last-occurrence-wins; get_json_object
# returns the FIRST occurrence, and the variant parser keeps the last
# once spark.sql.variant.allowDuplicateKeys is on (jq_explode sets it
# when applying a native plan), so suspect rows read through the
# variant instead of the raw text.
#
# r13 notes (ADVICE r12): (1) the key tokens compare BYTE-FOR-BYTE,
# so duplicate keys spelled with DIFFERENT JSON escapes ("a" vs
# "\\u0061", the same key to jq) don't match the backreference —
# instead, ANY key containing a \\uXXXX escape marks the document
# suspect (`_DUP_ESC_RE`): the gate may over-approximate freely
# because the substituted variant read equals the text read on any
# document without true duplicates (the false-positive-safety
# property), while the variant parser normalizes escapes exactly
# like jq/json.loads — so escape-variant duplicates now read
# last-wins instead of being a silent first-occurrence residual;
# (2) the inner string-token quantifiers are POSSESSIVE (*+) — the
# alternation's branches are disjoint prefix-free token classes, so
# possessiveness never changes what matches but caps the
# backtracking on large documents (the `(?s:.*)` gap scan remains
# O(doc) per key position, bounded by Java's regex engine; rows
# without a repeated quoted token reject at the backreference
# immediately).
_DUP_KEY_RE = '("(?:[^"\\\\]|\\\\.)*+")[ \\t\\r\\n]*:(?s:.*)\\1[ \\t\\r\\n]*:'
_DUP_ESC_RE = (
    '"(?:[^"\\\\]|\\\\.)*\\\\u[0-9a-fA-F]{4}'
    '(?:[^"\\\\]|\\\\.)*+"[ \\t\\r\\n]*:'
)


# --- doc-level bind-once (r15, guide §1.2 per-task work) -----------------
# A compiled plan's output columns re-derive the SAME two per-document
# values many times per row: the duplicate-key suspect flag (two
# whole-document regex scans per read — ~24 RLIKE occurrences in a
# typical 2-output plan) and the variant parse (~26 parseJson
# occurrences).  Catalyst's CollapseProject re-inlines projected
# aliases into every use, and the variant machinery is CodegenFallback
# (no whole-stage codegen, so no subexpression elimination), so each
# occurrence really evaluates per row — measured ~12-16 us each, the
# dominant per-row cost of the native tier at bench SF.
#
# Fix: NativePlan.apply binds both values ONCE per row in a one-element
# explode (a Generate blocks alias re-inlining — the _pre_filter_recipe
# idiom), and every builder that would re-derive them from the TOP-LEVEL
# doc column references the bound struct field instead.  The rewrite is
# IDENTITY-GATED: a builder's column is substituted only when its SQL
# rendering equals the plan's doc column, so subtree texts, element
# twins and Column-typed docs keep the inline computation — results are
# expression-for-expression identical, just evaluated once.
_DOC_BINDING: "contextvars.ContextVar[tuple[str, str] | None]"
import contextvars

_DOC_BINDING = contextvars.ContextVar("jq_doc_binding", default=None)
_BIND_COL = "__jq_docbind"


def _doc_bound_field(col: Column, field: str) -> Optional[Column]:
    b = _DOC_BINDING.get()
    if b is None:
        return None
    try:
        if col._jc.toString() == b[0]:
            return F.col(b[1])[field]
    except Exception:  # pragma: no cover - defensive (Connect etc.)
        pass
    return None


def _dup_suspect_expr(col: Column) -> Column:
    return F.coalesce(
        col.rlike(_DUP_KEY_RE) | col.rlike(_DUP_ESC_RE), F.lit(False)
    )


def _dup_suspect(col: Column) -> Column:
    bound = _doc_bound_field(col, "s")
    return bound if bound is not None else _dup_suspect_expr(col)


def _parse_doc(col: Column) -> Column:
    """``try_parse_json`` with the doc-level bind-once substitution."""
    bound = _doc_bound_field(col, "v")
    return bound if bound is not None else F.try_parse_json(col)


def _with_doc_binding(df: DataFrame, col: Column) -> DataFrame:
    """Attach the per-row (suspect, variant) struct through a
    one-element explode so downstream projections cannot re-inline
    (and hence re-evaluate) it.  array() is never NULL, so exactly one
    row comes out per input row."""
    return df.withColumn(
        _BIND_COL,
        F.explode(
            F.array(
                F.struct(
                    _dup_suspect_expr(col).alias("s"),
                    F.try_parse_json(col).alias("v"),
                )
            )
        ),
    )


def _dup_fixed_num(col: Column, path: Path) -> Column:
    """Double-typed path read for compiled arithmetic, duplicate-key
    aware (r12 randomized-differential find: expr specs read the
    FIRST occurrence through get_json_object where jq computes with
    the last).  Old-Spark fallback (ADVICE r12): when the variant
    parse is unavailable (no allowDuplicateKeys conf) the substitution
    coalesces back to the raw text — the delta stays first-occurrence,
    never NULL."""
    raw = F.get_json_object(col, _json_path(path))
    v = F.try_variant_get(_parse_doc(col), _json_path(path), "variant")
    return (
        F.when(~_dup_suspect(col), raw)
        .otherwise(_dup_sub(raw, v))
        .try_cast("double")
    )


def _dup_fixed_json_text(col: Column, path: Path) -> Column:
    """Raw JSON text of the value at a path, duplicate-key aware.
    Unlike `_dup_fixed_raw`, COMPOSITES substitute unconditionally:
    the arrayfn / reduce callers from_json the text by position or
    field name, so the variant cast's sorted-key rendering cannot
    change a value, while array element order is preserved.  NULL
    variant (old Spark / unparseable) coalesces back to the raw
    text (ADVICE r12)."""
    raw = F.get_json_object(col, _json_path(path))
    v = F.try_variant_get(_parse_doc(col), _json_path(path), "variant")
    return F.when(~_dup_suspect(col), raw).otherwise(_dup_sub(raw, v))


def _dup_sub(raw: Column, v: Column) -> Column:
    """The suspect-row substitution value: the canonical variant
    render, EXCEPT when the variant itself is missing —
    schema_of_variant NULL means the doc never parsed to a variant
    (older Spark without allowDuplicateKeys, or a doc the variant
    parser rejects) and the substitution keeps the raw text so the
    old-Spark delta stays first-occurrence TEXT, never NULL (ADVICE
    r12).  A genuine JSON null at the path is a VOID variant (vt
    non-NULL) and still renders NULL like get_json_object — the
    r12-pinned null semantics are unchanged."""
    vt = F.schema_of_variant(v)
    return F.when(vt.isNull(), raw).otherwise(v.try_cast("string"))


# r14 (VERDICT r13 #3): nesting levels BELOW the read that the
# document-order rebuild unrolls; deeper still-suspect subtrees fall
# back to the sorted variant render (values exact — the former
# whole-composite residual, now pushed beyond this depth).  2 keeps
# the CASE-gated expression tree (and its codegen) bounded; the
# randomized differential exercises depths 0-2.
_DUP_RENDER_DEPTH = 2


def _let(val: Column, body) -> Column:
    """Catalyst let-binding: evaluate ``val`` once and reference it as
    a LAMBDA VARIABLE inside ``body`` — a single-element transform.
    Column references otherwise re-inline their whole sub-expression
    tree, which makes the recursive dup-key rebuild EXPONENTIAL in
    depth at plan-build/analysis time; with the binding every
    reference is a leaf and the tree stays linear."""
    return F.try_element_at(F.transform(F.array(val), body), F.lit(1))


def _sql_lit(s: str) -> str:
    """A Python string as a Spark SQL single-quoted literal (default
    escapedStringLiterals=false: backslash escapes active)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


# The rebuild is generated as ONE SQL text and parsed JVM-side with a
# single F.expr call: building the same tree through the Column API
# costs thousands of py4j round-trips (~5 s per occurrence, measured),
# while the SQL parse is milliseconds.  Let-bindings are spelled as
# single-element transforms — `try_element_at(transform(array(VAL),
# name -> BODY), 1)` — so every reference of a bound value is a
# lambda-variable leaf and the tree stays linear in rebuild depth.
def _dupsql_suspect(x: str) -> str:
    return (
        f"coalesce((rlike({x}, {_sql_lit(_DUP_KEY_RE)}) or "
        f"rlike({x}, {_sql_lit(_DUP_ESC_RE)})), false)"
    )


def _dupsql_let(val: str, name: str, body: str) -> str:
    return f"try_element_at(transform(array({val}), {name} -> {body}), 1)"


def _dupsql_quote(x: str) -> str:
    """`_json_quote` in SQL text: quoted, Jackson-escaped string token
    via to_json(named_struct(..)) wrapper-stripping; NULL -> 'null'."""
    js = f"to_json(named_struct('s', {x}))"
    return (
        f"(case when {x} is null then 'null' "
        f"else substr({js}, 6, length({js}) - 6) end)"
    )


def _dupsql_entry(sv: str, vv: str, depth: int, n: list) -> str:
    """`_dup_entry_render` in SQL text: strings re-quote with Jackson
    escaping (the string twin and the variant cast both hold the
    DECODED content), null/VOID renders 'null', other scalars take the
    variant's canonical render (the callers' composite canonicalizer
    trims the decimal tails), and composites recurse through
    `_dupsql_node` to `_DUP_RENDER_DEPTH` before falling back to the
    pre-r14 policy (raw text when not suspect, else the sorted variant
    render)."""
    n[0] += 1
    p = f"dp{n[0]}"
    ps, pv = f"{p}.s", f"{p}.v"
    vt = f"schema_of_variant({pv})"
    vstr = f"try_cast({pv} as string)"
    if depth < _DUP_RENDER_DEPTH:
        comp = f"coalesce({_dupsql_node(ps, depth + 1, n)}, {vstr})"
    else:
        susp = _dupsql_suspect(ps)
        comp = (
            f"(case when not {susp} then {ps} "
            f"else coalesce({vstr}, {ps}) end)"
        )
    body = (
        f"(case when {vt} is null or {vt} = 'VOID' then 'null' "
        f"when {vt} = 'STRING' then {_dupsql_quote(vstr)} "
        f"when startswith({vt}, 'ARRAY') or startswith({vt}, 'OBJECT') "
        f"then {comp} "
        f"else coalesce({vstr}, 'null') end)"
    )
    return _dupsql_let(f"named_struct('s', {sv}, 'v', {vv})", p, body)


def _dupsql_node(s: str, depth: int, n: list) -> str:
    """`_dup_node_render` in SQL text: document-order render of a
    (possibly duplicate-key) JSON value raw text — the VERDICT r13 #3
    closure of the ORDER-only residual.

    Objects rebuild first-position/last-value like jq's in-place
    ``jv_object_set`` (and jackson-jq's LinkedHashMap put):
    ``from_json(s, 'map<string,string>')`` preserves duplicate entries
    in DOCUMENT order with order-preserving re-serialized subtree
    texts (verified empirically on Spark 4.1: inner duplicates survive
    too), and a positionally aligned ``map<string,variant>`` twin
    supplies the value types.  Arrays re-render each element so nested
    dup-key objects inside them rebuild too.  A non-suspect node keeps
    its raw text untouched (document order and values already exact).
    NULL on any parse failure — callers coalesce to the sorted variant
    render (the pre-r14 behavior)."""
    n[0] += 1
    sb = f"dn{n[0]}"
    n[0] += 1
    b = f"db{n[0]}"
    es, ev, ks, asv, avv = (
        f"{b}.es",
        f"{b}.ev",
        f"{b}.ks",
        f"{b}.asv",
        f"{b}.avv",
    )
    bound = (
        "named_struct("
        f"'es', map_entries(from_json({sb}, 'map<string,string>')), "
        f"'ev', map_entries(from_json({sb}, 'map<string,variant>')), "
        f"'ks', transform(map_entries(from_json({sb}, "
        "'map<string,string>')), ke -> ke.key), "
        f"'asv', from_json({sb}, 'array<string>'), "
        f"'avv', from_json({sb}, 'array<variant>'))"
    )
    # object: keep first occurrences in position, read the LAST
    # occurrence's value per key (1-based from the front via reverse)
    n[0] += 1
    e = f"de{n[0]}"
    n[0] += 1
    li = f"dl{n[0]}"
    li_val = (
        f"cast(size({ks}) - array_position(reverse({ks}), {e}.key) + 1 "
        "as int)"
    )
    pair = _dupsql_let(
        li_val,
        li,
        f"concat({_dupsql_quote(e + '.key')}, ':', "
        + _dupsql_entry(
            f"try_element_at({es}, {li}).value",
            f"try_element_at({ev}, {li}).value",
            depth,
            n,
        )
        + ")",
    )
    kept = (
        f"filter({es}, ({e}, i{n[0]}) -> "
        f"array_position({ks}, {e}.key) = i{n[0]} + 1)"
    )
    obj = f"concat('{{', array_join(transform({kept}, {e} -> {pair}), ','), '}}')"
    n[0] += 1
    sv = f"ds{n[0]}"
    items = (
        f"transform({asv}, ({sv}, j{n[0]}) -> "
        + _dupsql_entry(
            sv, f"try_element_at({avv}, cast(j{n[0]} + 1 as int))", depth, n
        )
        + ")"
    )
    arr = f"concat('[', array_join({items}, ',', 'null'), ']')"
    first = f"substring(ltrim({sb}), 1, 1)"
    comp = (
        f"(case when {first} = '{{' then {obj} "
        f"when {first} = '[' then {arr} else {sb} end)"
    )
    susp = _dupsql_suspect(sb)
    body = (
        f"(case when not {susp} then {sb} "
        f"else {_dupsql_let(bound, b, comp)} end)"
    )
    return _dupsql_let(s, sb, body)


def _dupsql_entry_shallow(sv: str, vv: str, n: list) -> str:
    """Shallow value render: strings re-quote, null/VOID → 'null',
    everything else keeps its RAW subtree text (number lexemes,
    booleans, and composites — including any inner duplicate keys,
    which the next reader resolves with its own depth budget)."""
    n[0] += 1
    p = f"dq{n[0]}"
    vt = f"schema_of_variant({p}.v)"
    vstr = f"try_cast({p}.v as string)"
    body = (
        f"(case when {vt} is null or {vt} = 'VOID' then 'null' "
        f"when {vt} = 'STRING' then {_dupsql_quote(vstr)} "
        f"else coalesce({p}.s, {vstr}, 'null') end)"
    )
    return _dupsql_let(f"named_struct('s', {sv}, 'v', {vv})", p, body)


def _dupsql_shallow(s: str, n: list) -> str:
    """SHALLOW document-order resolve for the iterate text SOURCE
    (r14): a duplicate-key OBJECT dedups first-position/last-value
    like jq's parse — so object iteration emits jq's row set in jq's
    order — but every VALUE keeps its raw subtree text untouched.
    The deep `_dupsql_node` is wrong here: it spends the rebuild
    depth budget at the source, pre-sorting inner objects before the
    per-element readers (which carry their own budget from the
    element's text twin) ever see them.  Arrays and scalars pass
    through raw (array elements split by position downstream)."""
    n[0] += 1
    sb = f"dh{n[0]}"
    n[0] += 1
    b = f"dg{n[0]}"
    es, ev, ks = f"{b}.es", f"{b}.ev", f"{b}.ks"
    bound = (
        "named_struct("
        f"'es', map_entries(from_json({sb}, 'map<string,string>')), "
        f"'ev', map_entries(from_json({sb}, 'map<string,variant>')), "
        f"'ks', transform(map_entries(from_json({sb}, "
        "'map<string,string>')), kh -> kh.key))"
    )
    n[0] += 1
    e = f"df{n[0]}"
    n[0] += 1
    li = f"dm{n[0]}"
    li_val = (
        f"cast(size({ks}) - array_position(reverse({ks}), {e}.key) + 1 "
        "as int)"
    )
    pair = _dupsql_let(
        li_val,
        li,
        f"concat({_dupsql_quote(e + '.key')}, ':', "
        + _dupsql_entry_shallow(
            f"try_element_at({es}, {li}).value",
            f"try_element_at({ev}, {li}).value",
            n,
        )
        + ")",
    )
    kept = (
        f"filter({es}, ({e}, h{n[0]}) -> "
        f"array_position({ks}, {e}.key) = h{n[0]} + 1)"
    )
    obj = f"concat('{{', array_join(transform({kept}, {e} -> {pair}), ','), '}}')"
    susp = _dupsql_suspect(sb)
    first = f"substring(ltrim({sb}), 1, 1)"
    body = (
        f"(case when not {susp} then {sb} "
        f"when {first} = '{{' then {_dupsql_let(bound, b, obj)} "
        f"else {sb} end)"
    )
    return _dupsql_let(s, sb, body)


def _dup_doc_render(
    colsql: str, path: Path, shallow: bool = False
) -> Column:
    """Last-occurrence path walk + document-order rebuild for a
    TRUE-duplicate composite read (VERDICT r13 #3).  Each object step
    takes the LAST entry whose (decoded) key matches — exactly the
    navigation over jq's parse-resolved document, and the step that
    ``get_json_object`` (first match) cannot express; array steps
    index the string twin.  The walked subtree text then rebuilds in
    document order via `_dupsql_node`.  NULL whenever a step fails to
    parse or match — the caller coalesces to the sorted variant
    render.  ``colsql`` is the doc column as a SQL fragment (threaded
    from ``apply``; Spark 4 Columns expose no SQL render) — the
    generated text is instantiated with ONE F.expr call for py4j
    economy.  ``shallow`` selects the iterate-source resolve
    (`_dupsql_shallow`: top-level dedup only, raw child texts)."""
    cur = colsql
    n = [0]
    for step in path:
        if isinstance(step, int):
            idx = step + 1 if step >= 0 else step
            cur = f"try_element_at(from_json({cur}, 'array<string>'), {idx})"
        else:
            n[0] += 1
            w = f"dw{n[0]}"
            cur = (
                "try_element_at(filter(map_entries(from_json("
                f"{cur}, 'map<string,string>')), {w} -> {w}.key = "
                f"{_sql_lit(step)}), -1).value"
            )
    if shallow:
        return F.expr(_dupsql_shallow(cur, n))
    return F.expr(_dupsql_node(cur, 0, n))


def _dup_fixed_view(
    col: Column,
    raw: Column,
    v: Column,
    path: Path | None,
    view,
    colsql: str | None = None,
    shallow: bool = False,
) -> Column:
    """``view`` applied to the duplicate-key-aware text of the value
    at ``path`` — the composition point that keeps plans SMALL and the
    hot path in whole-stage codegen (r14).

    Views (_m2_string_view, fn chains, interpolation renders)
    reference their text argument 10-15×; applying one directly to
    `_dup_fixed_raw`'s output re-inlines the whole substitution tree
    per reference (a 24 MiB task binary on the tostring chain,
    pre-fix), and each view BUILD costs ~0.4 s of py4j round-trips.
    Branch layout instead:

    1. non-suspect doc → ``view(raw)`` — raw is just get_json_object,
       so the clean-row hot path stays tiny and fully codegen;
    2. suspect → the substitution CASE (kept raw / variant render /
       document-order rebuild, which itself is ONE F.expr) bound once
       with `_let` and ``view`` applied to the lambda variable.  The
       let's higher-order function evaluates interpreted
       (CodegenFallback), but CASE codegen only reaches it on suspect
       rows.  Two view builds total, and every big subtree appears
       exactly once in the plan."""
    vr = v.try_cast("string")
    vt = F.schema_of_variant(v)
    iscomp = vt.startswith("ARRAY") | vt.startswith("OBJECT")
    same = F.equal_null(
        _parse_doc(raw).try_cast("string"),
        _parse_doc(vr).try_cast("string"),
    )
    rendered = (
        _dup_doc_render(colsql, path, shallow=shallow)
        if path is not None and colsql is not None
        else None
    )
    # Tightening `keep` by the raw subtree's own suspicion (the r14
    # subtree-internal-duplicate closure) is only SAFE when the
    # document-order rebuild exists: rebuilding a false positive is
    # content-identity, whereas the vr fallback would SORT a clean
    # value-equal composite (a regression the elem-text growth cases
    # caught).  Without a rebuild (no colsql — element-level reads
    # under iterates) the r13 value-precise gate stands, and the
    # subtree-internal duplicate render stays an r13-documented
    # residual there.
    keep = same & ~_dup_suspect(raw) if rendered is not None else same
    csub = F.coalesce(rendered, vr) if rendered is not None else vr
    sub = F.when(vt.isNull() | (iscomp & keep), raw).otherwise(
        F.when(iscomp, csub).otherwise(vr)
    )
    return F.when(~_dup_suspect(col), view(raw)).otherwise(
        _let(sub, lambda r: view(r))
    )


def _dup_fixed_raw(
    col: Column,
    raw: Column,
    v: Column,
    path: Path | None = None,
    colsql: str | None = None,
    shallow: bool = False,
) -> Column:
    """Raw-text view with duplicate-key suspects read from the variant
    (last-occurrence-wins, like jq).

    r13 (VERDICT r12 #4): suspect COMPOSITES now substitute too, but
    only VALUE-PRECISELY — the raw first-occurrence text is kept when
    it parses to the same value as the last-wins variant (canonical-
    render equality), so the over-approximate document gate's false
    positives (the same key at two different nesting levels — e.g.
    every arrays-of-objects document) keep their document-order raw
    text and pay one extra parse, never a wrong value.  True
    differences substitute the canonical variant render: correct
    last-wins VALUES (the callers' canonicalizer fixes the render's
    number lexemes).  This also fixes type-changing duplicates in
    BOTH directions (composite → scalar kept first-occurrence
    composite text pre-r13).

    r14 (VERDICT r13 #3): when the caller supplies the read ``path``,
    a true-difference COMPOSITE substitutes the DOCUMENT-ORDER rebuild
    (`_dup_doc_render`: last-occurrence path walk + first-position/
    last-value object render) instead of the sorted variant render —
    the former ORDER-only residual.  The sorted render remains the
    coalesce fallback (walk/parse failure, or still-suspect subtrees
    beyond `_DUP_RENDER_DEPTH` nesting levels below the read).

    Old-Spark fallback (ADVICE r12): a MISSING variant
    (schema_of_variant NULL — no allowDuplicateKeys conf, or a doc
    the variant parser rejects) keeps the raw text, so the delta
    stays first-occurrence text, never NULL; a genuine JSON null
    (VOID variant) still renders NULL like get_json_object."""
    # r14 (ADVICE r13 high): the keep-raw equality is LEXEME-insensitive
    # — get_json_object and the variant render preserve decimal scale
    # differently (doc token 1.50E2 -> raw '150.0' but reparse '150'
    # vs variant render '150.0'), so both sides re-render through the
    # same parse+cast before comparing.  r14 (VERDICT r13 #3): keeping
    # the raw text ALSO requires the raw subtree itself not to be
    # dup-suspect — the parse RESOLVES duplicates, so a subtree whose
    # own object carries a true duplicate ({"k":1,"k":3,"z":2}) read
    # value-equal to the variant and kept its duplicate-key raw render
    # (a silent r13 wrong-render, closed by the rebuild).  Branch
    # layout and size discipline live in `_dup_fixed_view`.
    return _dup_fixed_view(
        col, raw, v, path, lambda r: r, colsql=colsql, shallow=shallow
    )


def _scalar_out_col(
    col: Column, path: Path, dt: T.DataType, colsql: str | None = None
) -> Column:
    """Plain-path output at the scalar tier: STRING-declared outputs
    go through the variant-gated M2 normalization (`_m2_string_view`,
    r10), everything else through `_cast_extracted`.  The
    try_parse_json is shared across output columns by codegen
    subexpression elimination.

    Duplicate-key documents (r12): suspect rows substitute the raw
    text — last-occurrence-wins like jq, NULL for missing/JSON-null
    exactly like get_json_object.  The CASE branch keeps the variant
    parse off the clean-row hot path.  r14: true-difference
    STRING-declared composites substitute the document-order rebuild
    via `_dup_fixed_view` (jq key order; module docstring)."""
    jp = _json_path(path)
    raw = F.get_json_object(col, jp)
    v = F.try_variant_get(_parse_doc(col), jp, "variant")
    if isinstance(dt, T.StringType):
        return _dup_fixed_view(
            col,
            raw,
            v,
            path,
            lambda r: _m2_gate(r, _m2_string_view(r, v)),
            colsql=colsql,
        )
    # non-string decls substitute composites too: from_json resolves
    # nested fields BY NAME, so the variant cast's sorted-key text
    # still parses to the right (last-wins) values; a MISSING variant
    # (old Spark / rejected doc) keeps the raw text (ADVICE r12)
    raw2 = F.when(~_dup_suspect(col), raw).otherwise(_dup_sub(raw, v))
    return _cast_extracted(raw2, dt)


def _cast_extracted(raw: Column, dt: T.DataType) -> Column:
    """get_json_object string → declared type.  try_cast, not cast:
    non-coercible garbage must yield NULL (the documented delta vs
    the lenient marshaller), never an ANSI runtime error."""
    if isinstance(dt, T.StringType):
        return raw
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        # via double so "1.5" truncates like the lenient marshaller
        return raw.try_cast("double").try_cast(dt)
    if isinstance(dt, (T.DoubleType, T.FloatType, T.BooleanType)):
        return raw.try_cast(dt)
    # nested declared types: parse the extracted JSON text
    return F.from_json(raw, dt)


def _each_filter(items):
    """Flatten Filter/OrGroup list to its leaf Filters (schema pass)."""
    for it in items:
        if isinstance(it, OrGroup):
            yield from it.filters
        else:
            yield it


def _cond_col(item, leaf_fn) -> Column:
    """Filter or OrGroup → boolean Column (OR of leaf columns)."""
    if isinstance(item, OrGroup):
        col = leaf_fn(item.filters[0])
        for f in item.filters[1:]:
            col = col | leaf_fn(f)
        return col
    return leaf_fn(item)


def _variant_truthy(v: Column) -> Column:
    """jq truthiness on an exact-typed variant value: falsy iff the
    value is missing (SQL NULL variant), JSON null (VOID), or boolean
    false.  Strings — including "false" — and all numbers (even 0)
    are truthy, matching jq; the text view alone cannot express this
    (boolean false and the STRING "false" print identically)."""
    vt = F.schema_of_variant(v)
    is_false = (vt == F.lit("BOOLEAN")) & ~F.try_variant_get(v, "$", "boolean")
    return v.isNotNull() & (vt != F.lit("VOID")) & ~is_false


def _variant_has(v: Column, key) -> Column:
    """jq ``has`` on an exact-typed variant: string key → object-key
    membership, int key → 0 <= key < array length.  jq errors on a
    container/key-type mismatch (has("x") on an array, has(0) on an
    object) and on scalars; here those rows drop (false) — the
    documented NULL-delta class."""
    vt = F.schema_of_variant(v)
    if isinstance(key, str):
        return F.coalesce(
            vt.startswith("OBJECT")
            & F.array_contains(
                F.map_keys(v.try_cast("map<string,variant>")), F.lit(key)
            ),
            F.lit(False),
        )
    return F.coalesce(
        vt.startswith("ARRAY")
        & F.lit(key >= 0)
        & (F.size(v.try_cast("array<variant>")) > F.lit(key)),
        F.lit(False),
    )


def _variant_leaf_filter(v: Column, f: "Filter") -> Column:
    """One select() leaf evaluated directly on a VARIANT value — the
    r12 whole-element predicate route (``.items[] | select(has("k"))``,
    ``select(. > 5)``, ``select(length > 2)`` under an iterate), where
    the typed element struct cannot represent "the element itself"."""
    if f.fn == "length":
        return F.coalesce(
            _CMP_FN[f.op](_variant_length(v), F.lit(float(f.lit))),
            F.lit(False),
        )
    if f.op == "truthy":
        return _variant_truthy(v)
    if f.op == "not_truthy":
        return ~_variant_truthy(v)
    if f.op == "has":
        return _variant_has(v, f.lit)
    if f.op in _STR_PREDS:
        return _string_pred_col(_variant_string_only(v), f.op, f.lit)
    if f.lit is None:
        vt = F.schema_of_variant(v)
        is_null = v.isNull() | (vt == F.lit("VOID"))
        return is_null if f.op == "==" else ~is_null
    return _variant_cmp(v, f.op, f.lit)


def _variant_length(v: Column) -> Column:
    """jq ``length`` on an exact-typed variant: element count for
    arrays, key count for objects, codepoint count for strings, |n|
    for numbers, 0 for null/missing; booleans (a jq error) are the
    NULL-delta class.  Double-typed so one expression serves every
    declared numeric column type."""
    vt = F.schema_of_variant(v)
    return (
        F.when(v.isNull() | (vt == F.lit("VOID")), F.lit(0).cast("double"))
        .when(vt.startswith("ARRAY"), F.size(v.try_cast("array<variant>")).cast("double"))
        .when(vt.startswith("OBJECT"), F.size(v.try_cast("map<string,variant>")).cast("double"))
        .when(vt == F.lit("STRING"), F.length(v.try_cast("string")).cast("double"))
        .when(vt == F.lit("BOOLEAN"), F.lit(None).cast("double"))
        .otherwise(F.abs(v.try_cast("double")))
    )


def _variant_type_name(v: Column) -> Column:
    """jq ``type``: the value's JSON type name from the exact-typed
    variant — null/missing → "null", BIGINT/DOUBLE/DECIMAL →
    "number" (r11)."""
    vt = F.schema_of_variant(v)
    return (
        F.when(v.isNull() | (vt == F.lit("VOID")), F.lit("null"))
        .when(vt == F.lit("BOOLEAN"), F.lit("boolean"))
        .when(vt == F.lit("STRING"), F.lit("string"))
        .when(vt.startswith("ARRAY"), F.lit("array"))
        .when(vt.startswith("OBJECT"), F.lit("object"))
        .otherwise(F.lit("number"))
    )


def _variant_keys(v: Column) -> Column:
    """jq ``keys`` on an exact-typed variant: SORTED key names for
    objects — variant objects store fields sorted by key bytes, which
    is jq's codepoint sort — and "0".."n-1" index strings for arrays
    (downstream try_cast turns them back into the declared element
    type).  Anything else (null/scalars, a jq error) is the NULL
    delta class."""
    vt = F.schema_of_variant(v)
    arr_n = F.size(v.try_cast("array<variant>"))
    idx = F.when(
        arr_n > 0, F.sequence(F.lit(0), arr_n - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return F.when(
        vt.startswith("OBJECT"), F.map_keys(v.try_cast("map<string,variant>"))
    ).when(
        vt.startswith("ARRAY"),
        F.transform(idx, lambda i: i.cast("string")),
    )


def _elem_decl_type(dt: T.DataType) -> T.DataType:
    """Element-schema type for a declared output type: map-typed
    outputs read a VARIANT so the marshaller's M4 rule (object → map,
    null → NULL, any other value → EMPTY map) is expressible; other
    types parse directly."""
    return T.VariantType() if isinstance(dt, T.MapType) else dt


def _elem_out_col(c: Column, dt: T.DataType) -> Column:
    """Declared-type output column from an exploded element field."""
    if isinstance(dt, T.MapType):  # c is a variant (_elem_decl_type)
        vt = F.schema_of_variant(c)
        return (
            F.when(c.isNull() | (vt == F.lit("VOID")), F.lit(None).cast(dt))
            .when(vt.startswith("OBJECT"), c.try_cast(dt))
            .otherwise(F.create_map().cast(dt))  # M4: non-object → {}
        )
    return c.try_cast(dt)


def _scalar_map_col(json_col: Column, path: Path, dt: T.MapType) -> Column:
    """Scalar-tier map-declared output: variant-gated M4 rule
    (object → map, null/missing → NULL, any other value → empty map)."""
    vv = F.try_variant_get(_parse_doc(json_col), _json_path(path), "variant")
    vt = F.schema_of_variant(vv)
    return (
        F.when(vv.isNull() | (vt == F.lit("VOID")), F.lit(None).cast(dt))
        .when(vt.startswith("OBJECT"), vv.try_cast(dt))
        .otherwise(F.create_map().cast(dt))
    )


def _variant_cmp(v: Column, op: str, lit: Any) -> Column:
    """Exact jq total-order comparison of a variant value against a
    scalar literal: null < false < true < numbers < strings < arrays
    < objects.  Missing keys and JSON null therefore compare DEFINED
    (e.g. `.missing < 10` is true), never SQL-NULL-dropped — the same
    contract _cmp_with_null_order gives expression filters."""
    vt = F.schema_of_variant(v)
    val_rank = (
        F.when(v.isNull() | (vt == F.lit("VOID")), 0)
        .when(
            vt == F.lit("BOOLEAN"),
            F.when(F.try_variant_get(v, "$", "boolean"), 2).otherwise(1),
        )
        .when(vt == F.lit("STRING"), 4)
        .when(vt.startswith("ARRAY"), 5)
        .when(vt.startswith("OBJECT"), 6)
        .otherwise(3)  # every numeric variant type
    )
    if isinstance(lit, bool):
        lit_rank = 2 if lit else 1
        # same rank ⇒ same boolean value — the comparison degenerates
        same_val = F.lit(op in ("==", "<=", ">="))
        return F.when(
            val_rank == F.lit(lit_rank), same_val
        ).otherwise(_CMP_FN[op](val_rank, F.lit(lit_rank)))
    if isinstance(lit, (int, float)):
        lit_rank, val_col, lit_col = 3, v.try_cast("double"), F.lit(float(lit))
    else:
        lit_rank, val_col, lit_col = 4, v.try_cast("string"), F.lit(lit)
    return F.when(
        val_rank == F.lit(lit_rank), _CMP_FN[op](val_col, lit_col)
    ).otherwise(_CMP_FN[op](val_rank, F.lit(lit_rank)))


# fnchain HEADS with jq type constraints (r9): jq ERRORS when these
# receive the wrong type, so the compiled form must yield NULL there
# (the documented error-channel delta class) instead of operating on
# the value's JSON serialization (a silent WRONG-VALUE divergence —
# `7 | ascii_downcase` must not emit "7", `"5" | floor` must not
# emit 5).  Exact types come from the variant reader.
_STR_ONLY_HEADS = {"ascii_downcase", "ascii_upcase", "gsub"}
_NUM_ONLY_HEADS = {"floor", "ceil"}


def _num_only_view(raw: Column, v: Column) -> Column:
    """The raw text view when the value IS a JSON number, else NULL."""
    vt = F.schema_of_variant(v)
    isnum = (
        (vt == F.lit("DOUBLE"))
        | vt.startswith("DECIMAL")
        | (vt == F.lit("BIGINT"))
    )
    return F.when(isnum, raw)


# Number-token canonicalization INSIDE composite (object/array) JSON
# text, matching jqlib's recursive canonical_number (values.py): the
# alternation's first branch consumes complete JSON string tokens
# atomically (replaced by themselves via $1), so number tokens inside
# strings are never rewritten; the second branch rewrites a float
# token in a grammar-valid number position.  ≤16 integer digits keeps
# the integral rewrite inside the scalar rule's <1e17 window
# (bigger integral floats print scientific in jq — the documented
# scientific-notation delta class, left untouched).
_JSTR = r'("(?:[^"\\]|\\.)*")'
_NUMEND = r"(?=[\s,}\]]|$)"  # chars that can follow a number token
_CANON_INT_RE = _JSTR + r"|(-?\d{1,15})\.0+" + _NUMEND
_CANON_TRIM_RE = _JSTR + r"|(-?\d{1,16}\.\d*[1-9])0+" + _NUMEND
# jqlib prints -0.0 / -0 as "0" (values.py _canon_num via int());
# the lookbehind keeps exponent tails ("1e-0") and digit runs intact
_CANON_NEGZERO_RE = _JSTR + r"|(?<![eE\d.])-(0)" + _NUMEND
# NOTE the {1,15}-digit bound on the integral rewrite: jqlib
# normalizes through the DOUBLE value (json.loads), so a nested
# "9999999999999999.0" prints as 10000000000000000 (the nearest
# double) — a raw-text rewrite would keep the original digits.
# <= 15 digits are always exactly representable; longer integral
# floats keep their lexeme (the documented precision/scientific
# delta class).  Jackson additionally re-prints parsed doubles
# >= 1e7 in Double.toString scientific form inside composite text
# ("1.23456789012345E14"), which a text rewrite cannot shift back —
# NESTED integral floats >= 1e7 therefore keep the scientific form
# where jqlib prints integer text (same documented class; SCALAR
# values normalize exactly through the variant's double).


# r11 (VERDICT r10 #7): NESTED scientific tokens whose jq form is
# also scientific reformat in place — Jackson "1.5E300"/"2.0E-308"
# → jq/Python "1.5e+300"/"2e-308".  Only the exponent ranges where
# BOTH engines print scientific qualify: e >= 17 (every double with
# e == 16 is integral — doubles >= 2^53 have no fraction — and jqlib
# prints those as integer text, the documented shift class) and
# e <= -5 (jq goes positional at e == -4).  The mantissa drops a
# bare ".0" and keeps significant fractions; single-digit negative
# exponents zero-pad ("e-07") like Python repr.  Tokens needing a
# DIGIT SHIFT (e in [7,16] and e == -4: "1.23456789E7" → jq
# "12345678.9") stay in Jackson form — regexp_replace cannot move a
# decimal point by a captured amount; the SCALAR tier normalizes
# those exactly via _sci_python_text.
#
# MECHANICS: the string-token-safe alternation only works with
# captures-only replacements ("$1$2") — any literal text would also
# be inserted where the string-token branch matched.  The rewrite
# therefore goes through control-char MARKERS: pass 1 turns the "E"
# of a qualifying token into \x01/\x02/\x03 (one per exponent
# class); the cleanup passes then run WITHOUT the alternation —
# safe, because re-serialized JSON text escapes control characters
# as \uXXXX, so a raw marker can only be one this pass inserted
# (string tokens collect a trailing marker from the alternation
# branch; the final pass strips any marker not consumed by a
# cleanup, and a string token is never directly followed by a digit
# in valid JSON, so cleanups cannot misfire on them).
# mantissa: one digit, optional significant fraction, then any
# trailing zeros (Double.toString never emits them, but nested
# BigDecimal re-prints preserve scale: "1.50E-7", "1.00E+22");
# positive exponents may carry BigDecimal's explicit "+".
# r13 (ADVICE r12 high): a LEFT BOUNDARY lookbehind — without it the
# mantissa matched at an INTERIOR digit of a multi-digit-integer-part
# token ("21.5E-1" matched at "1.5E-1", leaving the "2" behind →
# silently wrong values), and the bare trailing-zero swallow ate
# INTEGER-part zeros ("20E3" → mantissa "2", losing a power of ten).
# The swallow is now conditional on a fraction actually preceding it
# (bounded-length lookbehind — Java regex, used by rlike/
# regexp_replace, supports it), so it only ever drops value-neutral
# trailing FRACTION zeros.
_SCI_MANT = r"(?<![\d.])(-?\d(?:\.\d*[1-9])?)(?:\.0+|(?<=\.\d{1,330})0+)?"
_CANON_SCI_POS_RE = (
    _JSTR + "|" + _SCI_MANT + r"E\+?(1[7-9]|[2-9]\d|[1-9]\d{2})" + _NUMEND
)
_CANON_SCI_NEG1_RE = _JSTR + "|" + _SCI_MANT + r"E-([5-9])" + _NUMEND
_CANON_SCI_NEG2_RE = _JSTR + "|" + _SCI_MANT + r"E-([1-9]\d{1,2})" + _NUMEND

# r12 (VERDICT r11 #4): NESTED tokens needing a DIGIT SHIFT — the
# exponent ranges where jq prints POSITIONAL text (0 <= e <= 16,
# -4 <= e <= -1; Jackson/Spark's to_json emits scientific from e >= 7
# and e <= -4, user-written docs can carry any of them).
# regexp_replace cannot move a decimal point by a captured amount, so
# these rewrite through the same marker trick (\x04 non-negative
# exponent, \x05 negative) and then a tokenize → per-token transform
# → reassemble pass (`_shift_rebuild`) — still pure codegen, and the
# rebuild only evaluates on rows that actually carry a marked token.
#
# r13 (ADVICE r12 high): the shift class is GENERALIZED.  The
# mantissa now admits a MULTI-DIGIT integer part (JSON-valid, so it
# starts [1-9]; capped at 17 digits — beyond double precision the
# token stays raw, the documented ≥18-significant-digit class) and a
# lowercase exponent marker, and the written exponent may be any 1–2
# digit value: the REBUILD computes the true decimal exponent
# t = e + len(intpart) − 1 per token and picks the jq output form
# (positional 0 ≤ t ≤ 16, leading-zero positional −4 ≤ t ≤ −1, or
# jq/Python scientific otherwise — with k ≤ 17 and e ≤ 99, |t| ≤ 115
# never overflows a double's exponent range).  This makes formerly
# mis-shifted user tokens ("21.5E-1" → 2.15, "20E3" → 20000,
# "-31.5E-2" → -0.315) EXACT, and is idempotent on this module's own
# lowercase outputs ("1.5e+20" re-marks and rebuilds to itself).
# Remaining residuals: zero integer-part scientific ("0.5E3") and
# 3-digit exponents on multi-digit-intpart or lowercase tokens pass
# through raw (formatting-only); mantissas with ≥18 significant
# digits shift with ALL their digits kept ("1.23456789012345678E5"
# → "123456.789012345678" where jq rounds through the double to
# "123456.78901234567") — the documented digit-precision class, a
# text rewrite cannot round through the double.
_SHIFT_MANT = (
    r"(?<![\d.])(-?[1-9]\d{0,16}(?:\.\d*[1-9])?)"
    r"(?:\.0+|(?<=\.\d{1,330})0+)?"
)
_CANON_SHIFT_POS_RE = _JSTR + "|" + _SHIFT_MANT + r"[eE]\+?(\d{1,2})" + _NUMEND
_CANON_SHIFT_NEG_RE = _JSTR + "|" + _SHIFT_MANT + r"[eE]-(\d{1,2})" + _NUMEND
_SHIFT_TOK_RE = "-?[1-9]\\d{0,16}(?:\\.\\d+)?[\x04\x05]\\d{1,2}"


def _shift_rebuild(c: Column) -> Column:
    """Reassemble composite text whose digit-shift tokens were marked:
    split on the marked-token shape, transform each token by actually
    shifting the decimal point (integral results print as integer
    text, like jqlib's canonical_number), and interleave the pieces
    back.  Stray markers (the alternation appends one after every
    string token) never match the token shape — a digit must
    immediately precede the marker — and are stripped by the caller's
    final cleanup pass."""
    parts = F.split(c, _SHIFT_TOK_RE)
    toks = F.regexp_extract_all(c, F.lit(_SHIFT_TOK_RE), F.lit(0))

    def shift(t: Column) -> Column:
        sign = F.when(t.startswith("-"), F.lit("-")).otherwise(F.lit(""))
        ipart = F.regexp_extract(t, r"^-?(\d+)", 1)
        fr = F.regexp_extract(t, r"\.(\d+)", 1)
        digits = F.concat(ipart, fr)
        e = F.regexp_extract(t, "[\x04\x05](\\d+)$", 1).try_cast("int")
        # true decimal exponent: value = 0.digits × 10^(td+1), i.e.
        # first significant digit sits at decimal position td
        # (digits never start with 0 — the mantissa regex is [1-9]-led)
        td = F.when(t.rlike("\x05"), F.length(ipart) - 1 - e).otherwise(
            F.length(ipart) - 1 + e
        )
        # positional, 0 <= td <= 16 (jq prints integral doubles < 1e17
        # as integer text; trailing fraction zeros are insignificant)
        pad = F.repeat(
            F.lit("0"), F.greatest(td + F.lit(1) - F.length(digits), F.lit(0))
        )
        dp = F.concat(digits, pad)
        ip = dp.substr(F.lit(1), td + F.lit(1))
        fp = F.regexp_replace(
            dp.substr(td + F.lit(2), F.lit(400)), "0+$", ""
        )
        pos = F.when(fp == F.lit(""), F.concat(sign, ip)).otherwise(
            F.concat(sign, ip, F.lit("."), fp)
        )
        # leading-zero positional, -4 <= td <= -1
        stripped = F.regexp_replace(digits, "0+$", "")
        neg = F.concat(
            sign, F.lit("0."), F.repeat(F.lit("0"), -td - F.lit(1)), stripped
        )
        # both-scientific regime (td >= 17 or td <= -5): jq/Python text
        rest = stripped.substr(F.lit(2), F.lit(400))
        mant = F.when(
            rest == F.lit(""), F.concat(sign, stripped.substr(1, 1))
        ).otherwise(
            F.concat(sign, stripped.substr(1, 1), F.lit("."), rest)
        )
        esig = F.when(td < 0, F.lit("-")).otherwise(F.lit("+"))
        # r14 (ADVICE r13 medium): NO lpad — Spark's lpad TRUNCATES
        # strings longer than the target length (the module's own
        # _sci_python_text note), and the r13-generalized mantissa
        # lets |td| reach 3 digits ("12E99" → td=100), which lpad
        # silently rendered as "1.2e+10".  Pad conditionally instead.
        tdabs = F.abs(td).cast("string")
        tdpad = F.when(
            F.length(tdabs) < 2, F.concat(F.lit("0"), tdabs)
        ).otherwise(tdabs)
        sci = F.concat(mant, F.lit("e"), esig, tdpad)
        return F.when((td >= 0) & (td <= 16), pos).otherwise(
            F.when((td >= -4) & (td < 0), neg).otherwise(sci)
        )

    head = F.zip_with(
        F.slice(parts, F.lit(1), F.size(toks)),
        F.transform(toks, shift),
        lambda p, t: F.concat(p, t),
    )
    return F.concat(F.array_join(head, ""), F.element_at(parts, F.lit(-1)))


def _canon_composite_text(raw: Column) -> Column:
    c = F.regexp_replace(raw, _CANON_INT_RE, "$1$2")
    c = F.regexp_replace(c, _CANON_TRIM_RE, "$1$2")
    c = F.regexp_replace(c, _CANON_NEGZERO_RE, "$1$2")
    c = F.regexp_replace(c, _CANON_SCI_POS_RE, "$1$2\x01$3")
    c = F.regexp_replace(c, _CANON_SCI_NEG1_RE, "$1$2\x02$3")
    c = F.regexp_replace(c, _CANON_SCI_NEG2_RE, "$1$2\x03$3")
    c = F.regexp_replace(c, "\x01(\\d+)", "e+$1")
    c = F.regexp_replace(c, "\x02(\\d)", "e-0$1")
    c = F.regexp_replace(c, "\x03(\\d+)", "e-$1")
    c = F.regexp_replace(c, _CANON_SHIFT_POS_RE, "$1$2\x04$3")
    c = F.regexp_replace(c, _CANON_SHIFT_NEG_RE, "$1$2\x05$3")
    c = F.when(c.rlike("\\d[\x04\x05]"), _shift_rebuild(c)).otherwise(c)
    return F.regexp_replace(c, "[\x01\x02\x03\x04\x05]", "")


# SCALAR scientific-token normalization (r11, VERDICT r10 #7): a
# Jackson Double.toString / BigDecimal science-form token → the exact
# jq/Python float text.  Jackson prints scientific for |value| >= 1e7
# or < 1e-3 while jq/Python switch at >= 1e16 / < 1e-4, so the
# conversion has three regimes (exponent from the token itself):
#   e >= 17 or e <= -5 → both scientific: trim the mantissa's bare
#     ".0", exponent always signed and >= 2 digits ("1e+20",
#     "1.5e-07", "2e-308");
#   7 <= e <= 16      → jq positional: shift the digits ("1.23456789E7"
#     → "12345678.9"); values here with e == 16 are integral doubles
#     and never reach this view (the intish branch precedes it);
#   e == -4           → jq positional small: "1.5E-4" → "0.00015".
# Pure Column expressions — regexp_extract + substr arithmetic.
#
# Residual DIGIT-level delta (not formatting): JDK 17's
# Double.toString emits non-shortest digits for a ~0.1% sliver of
# doubles — measured by a 60k random-bit fuzz: 63 hits, all integral
# values in |v| ∈ [1e17, 1e19) ("1.70338826681018035E18" where
# Python prints '1.7033882668101804e+18') plus deep subnormals
# (5e-324 → "4.9E-324") — JDK-4511638, fixed in JDK 19+.  The digits
# themselves differ there, beyond any text transform's reach.
# exponent may carry BigDecimal's explicit "+" (DECIMAL-typed
# variants re-print through BigDecimal: "1.00E+22"); int cast
# accepts the sign
_SCI_TOKEN_RE = r"^-?\d\.\d+E[+-]?\d+$"
_SCI_PARTS_RE = r"^(-?)(\d)\.(\d+)E([+-]?\d+)$"


def _sci_python_text(raw: Column) -> Column:
    sign = F.regexp_extract(raw, _SCI_PARTS_RE, 1)
    d = F.regexp_extract(raw, _SCI_PARTS_RE, 2)
    fr = F.regexp_replace(
        F.regexp_extract(raw, _SCI_PARTS_RE, 3), "0+$", ""
    )
    e = F.regexp_extract(raw, _SCI_PARTS_RE, 4).cast("int")
    digits = F.concat(d, fr)
    mant = F.when(fr == F.lit(""), d).otherwise(
        F.concat(d, F.lit("."), fr)
    )
    esign = F.when(e < 0, F.lit("-")).otherwise(F.lit("+"))
    # NOTE no lpad: Spark's lpad TRUNCATES to the target length, so a
    # 3-digit exponent would lose its last digit — pad conditionally
    eabs = F.abs(e).cast("string")
    epad = F.when(
        F.length(eabs) < 2, F.concat(F.lit("0"), eabs)
    ).otherwise(eabs)
    sci = F.concat(sign, mant, F.lit("e"), esign, epad)
    # positional expansion: pad digits out to the decimal point, then
    # split (defensive "0" fraction keeps the shape for integral-ish
    # inputs, though intish catches those upstream)
    pad = F.repeat(
        F.lit("0"), F.greatest(e + F.lit(1) - F.length(digits), F.lit(0))
    )
    digits_p = F.concat(digits, pad)
    ipart = digits_p.substr(F.lit(1), e + F.lit(1))
    fpart0 = digits_p.substr(e + F.lit(2), F.lit(330))
    fpart = F.when(fpart0 == F.lit(""), F.lit("0")).otherwise(fpart0)
    pos_big = F.concat(sign, ipart, F.lit("."), fpart)
    pos_small = F.concat(sign, F.lit("0.000"), digits)
    return (
        F.when((e >= 17) | (e <= -5), sci)
        .when(e >= 7, pos_big)
        .when(e == F.lit(-4), pos_small)
        .otherwise(raw)
    )


def _tostring_view(raw: Column, v: Column) -> Column:
    """jq ``tostring`` of the value at a path: the raw text view with
    NUMBER normalization matching jqlib — integral floats below 1e17
    print without the fraction (1.0 → "1", 1e2 → "100", -0.0 → "0";
    values.py::_canon_num).  The variant supplies the exact JSON type
    so a STRING "1.0" is never normalized (r9 fix: the bare text view
    emitted "1.0" where jq prints "1" — a live auto-mode divergence).
    Composite values (OBJECT/ARRAY) canonicalize their NESTED number
    tokens too (r10 fix: ``"p-\\(.v)"`` on ``{"v":{"x":1.0}}`` emitted
    'p-{"x":1.0}' where jq prints 'p-{"x":1}').  r11 closes the
    scalar scientific-notation class exactly (``_sci_python_text``:
    "1.0E20" → "1e+20", "1.23456789E7" → "12345678.9", "1.5E-4" →
    "0.00015") and the nested both-engines-scientific subclass
    (e >= 17 / e <= -5 reformat in `_canon_composite_text`); residual
    documented delta: NESTED tokens needing a digit shift (Jackson
    scientific, jq positional/integer — e in [7,16], e == -4) keep
    the Jackson form."""
    vt = F.schema_of_variant(v)
    num = F.try_variant_get(v, "$", "double")
    isnum = (vt == F.lit("DOUBLE")) | vt.startswith("DECIMAL")
    intish = (
        isnum
        & num.isNotNull()
        & (num == F.floor(num))
        & (F.abs(num) < F.lit(1e17))
    )
    issci = isnum & raw.rlike(_SCI_TOKEN_RE)
    iscomp = vt.startswith("ARRAY") | vt.startswith("OBJECT")
    return (
        F.when(intish, num.cast("bigint").cast("string"))
        .when(issci, _sci_python_text(raw))
        .when(iscomp, _canon_composite_text(raw))
        .otherwise(F.coalesce(raw, F.lit("null")))
    )


# texts that may need M2 normalization: an integral-float lexeme, a
# Double.toString SCIENTIFIC form (Jackson re-prints parsed doubles
# >= 1e7 as "1.23456789012345E14" — the variant path turns integral
# ones back into integer text like jqlib), or a composite (which may
# hold nested float tokens).  Everything else (ordinary strings,
# integers, bools, plain non-integral decimals) passes through
# without touching the variant — the when() short-circuits the parse
# per row
_M2_SUSPECT_RE = r"^-?[0-9]{1,17}\.0+$|^-?[0-9](\.[0-9]+)?E[+-]?[0-9]{1,3}$"


def _m2_gate(raw: Column, view: Column) -> Column:
    suspect = (
        raw.rlike(_M2_SUSPECT_RE)
        | raw.startswith("[")
        | raw.startswith("{")
    )
    return F.when(raw.isNull() | ~suspect, raw).otherwise(view)


def _m2_string_view(raw: Column, v: Column) -> Column:
    """M2 stringify of a plain-path value for a STRING-declared
    output: strings pass through, numbers normalize like jqlib's
    tojson (marshal.py::_as_string — integral floats print without
    the fraction), composites canonicalize their nested number
    tokens; null/missing stays NULL (M2 maps missing → NULL, unlike
    tostring's "null").  r10 deep-fuzz find: the bare text view
    emitted "1.0" / '{"k":1.0}' where the Python tier prints "1" /
    '{"k":1}' — the r9 tostring-normalization class on the M2
    route.  r11: scalar scientific tokens normalize exactly
    (_sci_python_text), same as _tostring_view."""
    vt = F.schema_of_variant(v)
    num = F.try_variant_get(v, "$", "double")
    isnum = (vt == F.lit("DOUBLE")) | vt.startswith("DECIMAL")
    intish = (
        isnum
        & num.isNotNull()
        & (num == F.floor(num))
        & (F.abs(num) < F.lit(1e17))
    )
    issci = isnum & raw.rlike(_SCI_TOKEN_RE)
    iscomp = vt.startswith("ARRAY") | vt.startswith("OBJECT")
    return (
        F.when(intish, num.cast("bigint").cast("string"))
        .when(issci, _sci_python_text(raw))
        .when(iscomp, _canon_composite_text(raw))
        .otherwise(raw)
    )


def _json_quote(c: Column) -> Column:
    """A string Column → its JSON string-token form (quoted, Jackson
    escaping via to_json(struct) wrapper-stripping); NULL → "null"
    (jq tojson(null))."""
    js = F.to_json(F.struct(c.alias("s")))
    return F.when(c.isNull(), F.lit("null")).otherwise(
        js.substr(F.lit(6), F.length(js) - 6)
    )


def _b64_view(c: Column) -> Column:
    """jq ``@base64`` of a tostring view: utf-8 base64 with Spark's
    76-char \\r\\n chunking stripped (RFC 4648 unchunked, matching
    Python's base64.b64encode)."""
    return F.regexp_replace(F.base64(F.encode(c, "utf-8")), "\r\n", "")


def _tojson_view(raw: Column, v: Column) -> Column:
    """jq ``tojson`` / ``@json`` rendering of the value: like
    `_tostring_view` but STRINGS come back QUOTED with JSON escaping.
    The escaping rides Jackson: ``to_json(struct(s))`` emits
    ``{"s":"<escaped>"}`` and the wrapper is stripped — codegen-only,
    handles quotes/backslashes/control chars exactly like jqlib's
    json.dumps (both use the \\n/\\t/\\r/\\uXXXX shortcuts and leave
    non-ASCII unescaped)."""
    vt = F.schema_of_variant(v)
    s = F.try_variant_get(v, "$", "string")
    js = F.to_json(F.struct(s.alias("s")))
    quoted = js.substr(F.lit(6), F.length(js) - 6)
    num = F.try_variant_get(v, "$", "double")
    isnum = (vt == F.lit("DOUBLE")) | vt.startswith("DECIMAL")
    intish = (
        isnum
        & num.isNotNull()
        & (num == F.floor(num))
        & (F.abs(num) < F.lit(1e17))
    )
    issci = isnum & raw.rlike(_SCI_TOKEN_RE)
    iscomp = vt.startswith("ARRAY") | vt.startswith("OBJECT")
    return (
        F.when(vt == F.lit("STRING"), quoted)
        .when(intish, num.cast("bigint").cast("string"))
        .when(issci, _sci_python_text(raw))
        .when(iscomp, _canon_composite_text(raw))
        .otherwise(F.coalesce(raw, F.lit("null")))
    )


def _keys_unsorted_col(
    raw: Column,
    v: Column,
    doc: Column | None = None,
    path: Path | None = None,
    colsql: str | None = None,
) -> Column:
    """jq ``keys_unsorted``: object keys in DOCUMENT order —
    ``json_object_keys`` over the raw text preserves field order,
    where variants sort keys (r10); arrays yield index strings like
    ``keys``.  Anything else is the NULL delta class.  array_distinct
    (r12): duplicate-key objects list each key once at its FIRST
    position — jq's jv_object_set updates an existing key in place,
    so insertion order is first-occurrence order; identity on clean
    documents.

    r13 (VERDICT r12 #4): when the enclosing document (``doc``) is
    supplied, the text twin goes through the value-precise dup-key
    substitution — a DUPLICATED ANCESTOR path no longer lists the
    FIRST occurrence's keys (a wrong key SET pre-r13).  r14 (VERDICT
    r13 #3): with the read ``path`` supplied too, the substitution is
    the DOCUMENT-ORDER rebuild, so the listed keys come back in the
    last occurrence's document order exactly like jq (``keys`` proper
    is exact — it reads `_variant_keys`)."""
    if doc is not None:
        raw = _dup_fixed_raw(doc, raw, v, path=path, colsql=colsql)
    vt = F.schema_of_variant(v)
    arr_n = F.size(v.try_cast("array<variant>"))
    idx = F.when(
        arr_n > 0, F.sequence(F.lit(0), arr_n - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    return F.when(
        vt.startswith("OBJECT"), F.array_distinct(F.json_object_keys(raw))
    ).when(
        vt.startswith("ARRAY"),
        F.transform(idx, lambda i: i.cast("string")),
    )


def _variant_string_only(v: Column) -> Column:
    """The variant's string value when it IS a JSON string, else NULL
    — so string predicates see NULL (→ false) for arrays / objects /
    numbers / booleans instead of their JSON serialization."""
    return F.when(
        F.schema_of_variant(v) == F.lit("STRING"),
        F.try_variant_get(v, "$", "string"),
    )


def _string_pred_col(c: Column, op: str, pat: str) -> Column:
    """startswith/endswith/test on the string view.  NULL (missing /
    null / non-string — callers pre-gate via _variant_string_only) →
    false, dropping the row — jq instead errors on non-string input,
    the documented NULL-delta class."""
    c = c.try_cast("string")
    if op == "startswith":
        r = c.startswith(pat)
    elif op == "endswith":
        r = c.endswith(pat)
    elif op == "contains":
        # r12 growth: string containment (jq's contains on two
        # strings; non-string inputs are the null->false delta like
        # the other predicates — jq errors there)
        r = c.contains(pat)
    else:  # test — pattern portability pre-checked in _parse_filters
        r = c.rlike(pat)
    return F.coalesce(r, F.lit(False))


def _nav_step(c: Column, s) -> Column:
    """One navigation step on a typed column: field access for string
    steps, NULL-tolerant element access for int steps (ANSI getItem
    throws on out-of-bounds; jq yields null — try_element_at is
    1-based and supports jq's negative-from-end indices)."""
    if isinstance(s, int):
        return F.try_element_at(c, F.lit(s + 1 if s >= 0 else s))
    return c.getField(s)


def _filter_col(json_col: Column, f: Filter) -> Column:
    if f.fn == "length":
        # jq length of the path's value vs a numeric literal; length
        # of null/missing is 0 (jq), booleans (jq error) take the
        # NULL→false delta like every native-tier abort class
        jp = _json_path(f.lhs) if f.lhs else "$"
        v = F.try_variant_get(_parse_doc(json_col), jp, "variant")
        return F.coalesce(
            _CMP_FN[f.op](_variant_length(v), F.lit(float(f.lit))),
            F.lit(False),
        )
    if f.lhs_expr is not None:
        c = _compile_expr(
            f.lhs_expr,
            lambda p: _dup_fixed_num(json_col, f.lhs + p),
        )
        return _cmp_with_null_order(c, f.op, f.lit)
    if f.op == "truthy":
        # exact JSON type via the variant reader (same technique as the
        # `//` projection below): get_json_object strips quotes, so the
        # STRING "false" would otherwise be confused with boolean false
        v = F.try_variant_get(
            _parse_doc(json_col), _json_path(f.lhs), "variant"
        )
        return _variant_truthy(v)
    if f.op in ("not_truthy", "has"):
        v = F.try_variant_get(
            _parse_doc(json_col), _json_path(f.lhs), "variant"
        )
        if f.op == "not_truthy":
            return ~_variant_truthy(v)
        return _variant_has(v, f.lit)
    if f.op in _STR_PREDS:
        # gate on the exact JSON type: get_json_object's text view
        # would serialize arrays/objects/numbers and substring-match
        # the serialization (".tags | test(..)" on an array must be
        # the null→false delta, not a match against '["..."]')
        v = F.try_variant_get(
            _parse_doc(json_col), _json_path(f.lhs), "variant"
        )
        return _string_pred_col(_variant_string_only(v), f.op, f.lit)
    if f.lit is None:
        # `== null` is true for both JSON null and missing (jq).
        # Read the exact-typed variant, not the raw text (r12: the
        # raw view sees the FIRST occurrence on duplicate-key docs
        # where jq tests the last; corrupt docs are NULL either way)
        v = F.try_variant_get(
            _parse_doc(json_col), _json_path(f.lhs), "variant"
        )
        is_null = v.isNull() | (F.schema_of_variant(v) == F.lit("VOID"))
        return is_null if f.op == "==" else ~is_null
    # exact jq total-order comparison (null/missing and cross-type
    # values compare DEFINED, per the type ranking) via the variant
    # reader — the text view cannot type its value
    v = F.try_variant_get(_parse_doc(json_col), _json_path(f.lhs), "variant")
    return _variant_cmp(v, f.op, f.lit)


_CMP_FN = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _cmp_with_null_order(c: Column, op: str, lit: Any) -> Column:
    """jq's total order places null below every number, so a null
    path value has a DEFINED comparison result, not SQL NULL."""
    return F.coalesce(_CMP_FN[op](c, F.lit(lit)), F.lit(_NULL_CMP[op]))


def _struct_filter_col(struct_col: Column, f: Filter) -> Column:
    if f.fn == "length":
        # element schema types length-filter paths VARIANT
        c = struct_col
        for s in f.lhs:
            c = _nav_step(c, s)
        return F.coalesce(
            _CMP_FN[f.op](_variant_length(c), F.lit(float(f.lit))),
            F.lit(False),
        )
    if f.lhs_expr is not None:
        def nav(p, _f=f):
            c = struct_col
            for s in _f.lhs + p:
                c = _nav_step(c, s)
            return c.try_cast("double")

        return _cmp_with_null_order(_compile_expr(f.lhs_expr, nav), f.op, f.lit)
    c = struct_col
    for s in f.lhs:
        c = _nav_step(c, s)
    if f.op == "truthy":
        # the element schema types truthy-filter paths as VARIANT
        # (_elem_schema), so the exact JSON type is available here;
        # comparing a STRING-typed view to lit(False) would ANSI-crash
        # on truthy strings like "hello"
        return _variant_truthy(c)
    if f.op in ("not_truthy", "has"):
        # element schema types these paths VARIANT (same else branch
        # as truthy/comparisons in _elem_schema)
        return ~_variant_truthy(c) if f.op == "not_truthy" else _variant_has(c, f.lit)
    if f.op in _STR_PREDS:
        # element schema types strpred paths VARIANT so the non-string
        # gate is decidable here (a StringType element field would
        # capture the raw JSON serialization of arrays/objects)
        return _string_pred_col(_variant_string_only(c), f.op, f.lit)
    # the element schema types every plain comparison-filter path
    # VARIANT (exact jq total order incl. null/missing and cross-type
    # values — see _variant_cmp)
    if f.lit is None:
        vt = F.schema_of_variant(c)
        is_null = c.isNull() | (vt == F.lit("VOID"))
        return is_null if f.op == "==" else ~is_null
    return _variant_cmp(c, f.op, f.lit)


def _leaf_needs_variant(f: Filter) -> bool:
    """Whether _filter_col would route this leaf through the variant
    reader (exact JSON type needed): jq truthiness, has(), and plain
    comparisons with a non-null literal (jq total order)."""
    if f.lhs_expr is not None:
        return False
    if f.fn == "length":
        return True
    if f.op in ("truthy", "not_truthy", "has"):
        return True
    if f.op in _STR_PREDS:
        return False
    return f.lit is not None


def _group_all_variant(item) -> bool:
    fs = item.filters if isinstance(item, OrGroup) else [item]
    return all(_leaf_needs_variant(f) for f in fs)


def _variant_paths_schema(groups) -> Optional[T.StructType]:
    """from_json schema typing every leaf path of the given filter
    groups as VARIANT.  Returns None when the paths can't be laid out
    in one struct (int steps, whole-document filters, or a leaf/struct
    prefix conflict) — callers fall back to per-leaf evaluation."""
    needed: dict = {}

    def add(path) -> bool:
        if not path or not all(isinstance(s, str) for s in path):
            return False
        cur = needed
        for s in path[:-1]:
            nxt = cur.setdefault(s, {})
            if not isinstance(nxt, dict):
                return False
            cur = nxt
        if isinstance(cur.get(path[-1]), dict):
            return False
        cur[path[-1]] = T.VariantType()
        return True

    for g in groups:
        for f in g.filters if isinstance(g, OrGroup) else [g]:
            if not add(tuple(f.lhs)):
                return None

    def to_struct(d) -> T.StructType:
        return T.StructType(
            [
                T.StructField(k, to_struct(v) if isinstance(v, dict) else v)
                for k, v in d.items()
            ]
        )

    return to_struct(needed)


def _pre_filter_recipe(
    col: Column, pre_filters
) -> tuple[list[Column], Optional[Column], list[Column]]:
    """Build the select()-filter conditions that precede any iterate,
    as a replayable recipe (r14 opt: all Column construction is cached
    per (context, column, outer) in NativePlan.apply — building these
    trees costs hundreds of py4j round trips, replaying them on a
    DataFrame costs a handful).

    Variant-needing groups are evaluated against ONE from_json parse
    routed through a one-element explode: FilterExec has no
    subexpression elimination and Catalyst's predicate pushdown
    re-inlines projected aliases into the condition, so a naive
    `withColumn(parse) → where` re-parses the JSON once per leaf
    (measured 7× parseJson per row on a two-leaf and/or condition).
    A Generate blocks pushdown of conditions on its output, pinning
    the single parse below the filter."""
    var_groups = [f for f in pre_filters if _group_all_variant(f)]
    text_groups = [f for f in pre_filters if not _group_all_variant(f)]
    text_conds = [
        _cond_col(f, lambda ff: _filter_col(col, ff)) for f in text_groups
    ]
    if not var_groups:
        return (text_conds, None, [])
    schema = _variant_paths_schema(var_groups)
    if schema is None:
        text_conds += [
            _cond_col(f, lambda ff: _filter_col(col, ff)) for f in var_groups
        ]
        return (text_conds, None, [])
    pc = F.col("__jq_prefilter")
    var_gen = F.explode(F.array(F.from_json(col, schema)))
    var_conds = [
        _cond_col(f, lambda ff: _struct_filter_col(pc, ff))
        for f in var_groups
    ]
    return (text_conds, var_gen, var_conds)


def _run_pre_filters(df: DataFrame, recipe) -> DataFrame:
    """Replay a _pre_filter_recipe on a real DataFrame (same op order
    as the pre-r14 inline version: text wheres, then the one-parse
    Generate + variant wheres + original-column reselect)."""
    text_conds, var_gen, var_conds = recipe
    for c in text_conds:
        df = df.where(c)
    if var_gen is None:
        return df
    orig = df.columns
    df = df.withColumn("__jq_prefilter", var_gen)
    for c in var_conds:
        df = df.where(c)
    return df.select(*orig)


def _java_quote(s: str) -> str:
    """Literal string as a Java regex (\\Q...\\E quoting)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


_NUMERIC_TYPES = (T.IntegerType, T.LongType, T.DoubleType, T.FloatType, T.ShortType)


def _slice_idx(idx, n: Column, default: Column) -> Column:
    """jq slice index → effective 0-based offset Column: negatives
    count from the end, the result clamps to [0, n]."""
    if idx is None:
        return default
    i = F.lit(idx)
    eff = F.when(i < 0, n + i).otherwise(i)
    return F.greatest(F.least(eff, n), F.lit(0))


def _slice_col(
    json_col: Column, path: Path, lo, hi, out_dt: T.DataType
) -> Column:
    """jq ``.path[lo:hi]`` at the scalar tier (r13 growth, VERDICT r12
    #5).  Exact-typed variant gate: ARRAY values slice under an ARRAY
    decl (from_json with the declared element type — same strict parse
    as a plain-path read — then clamped index arithmetic, negatives
    from the end); STRING values substring by CODEPOINTS under a
    STRING decl (Spark length/substr count characters, matching
    Python/jq).  Cross-type and OBJECT inputs are NULL — jq errors on
    objects and slices the type the decl didn't ask for, the
    documented NULL-delta class.  Duplicate-key docs read last-wins
    (`_dup_fixed_json_text`)."""
    raw = _dup_fixed_json_text(json_col, path)
    v = F.try_variant_get(
        _parse_doc(json_col), _json_path(path), "variant"
    )
    vt = F.schema_of_variant(v)
    if isinstance(out_dt, T.ArrayType):
        arr = F.from_json(raw, out_dt)
        n = F.size(arr)
        lo_c = _slice_idx(lo, n, F.lit(0))
        hi_c = _slice_idx(hi, n, n)
        cnt = F.greatest(hi_c - lo_c, F.lit(0))
        # r14 (ADVICE r13 low): a MISSING variant (old Spark without
        # the allowDuplicateKeys conf, or a doc the variant parser
        # rejects) must not NULL the whole slice — fall back to gating
        # on the raw-text from_json parse succeeding, mirroring the
        # _dup_sub missing-variant policy (delta stays first-occurrence
        # text semantics, never NULL).
        is_arr = F.coalesce(vt.startswith("ARRAY"), arr.isNotNull())
        return F.when(is_arr, F.slice(arr, lo_c + F.lit(1), cnt))
    # string slice: missing variant falls back to the raw text view
    # (get_json_object already unquotes string values); the cross-type
    # ambiguity (a number would slice as its text) only exists on the
    # no-variant fallback path and keeps the never-NULL policy.
    s = F.when(vt.isNull(), raw).otherwise(_variant_string_only(v))
    n = F.length(s)
    lo_c = _slice_idx(lo, n, F.lit(0))
    hi_c = _slice_idx(hi, n, n)
    cnt = F.greatest(hi_c - lo_c, F.lit(0))
    return s.substr(lo_c + F.lit(1), cnt)


def _arrayfn_col(json_col: Column, path: Path, fn: str, args, out_dt: T.DataType) -> Column:
    """Array-function projection over the scalar (non-iterate) tier.

    The array is parsed ONCE via from_json with the element type taken
    from the declared output, then the function is a builtin Catalyst
    expression (array_max / reverse / sort_array / slice / transform /
    array_join) or an aggregate() fold for add.  jq deltas are the
    documented cast-garbage class: jq aborts on wrong-typed input,
    this tier yields NULL."""
    # dup-key aware (r12): same last-occurrence substitution as the
    # plain-path reads (array order survives the variant cast; nested
    # object keys re-sort, harmless to the positional/number folds)
    raw = _dup_fixed_json_text(json_col, path)

    def lenient(dt: T.DataType) -> T.DataType:
        # integral decls parse as double then truncate, matching the
        # lenient marshaller (strict from_json nulls 2.5 → int)
        if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
            return T.DoubleType()
        return dt

    if fn in ("add", "max", "min", "first", "last"):
        et = lenient(out_dt)
        arr = F.from_json(raw, T.ArrayType(et))
        if fn == "add":
            # jq: [] | add == null; null elements are identity for +
            return F.aggregate(
                arr,
                F.lit(None).cast(et),
                lambda acc, x: F.when(x.isNull(), acc)
                .when(acc.isNull(), x)
                .otherwise(acc + x),
            )
        if fn == "max":
            # jq's total order puts null BELOW everything, so null
            # elements never win max — matching array_max's null skip
            return F.array_max(arr)
        if fn == "min":
            # ...but a null element IS the minimum in jq
            return F.when(
                F.exists(arr, lambda x: x.isNull()), F.lit(None).cast(et)
            ).otherwise(F.array_min(arr))
        if fn == "first":
            return F.try_element_at(arr, F.lit(1))
        return F.try_element_at(arr, F.lit(-1))
    if fn == "join":
        arr = F.from_json(raw, T.ArrayType(T.StringType()))
        # jq join: null elements render as ""
        return F.array_join(arr, args[0], "")
    if fn == "map":
        mp = args[0]
        leaf = lenient(out_dt.elementType)
        et: T.DataType = leaf
        for s in reversed(mp):
            et = T.StructType([T.StructField(s, et)])
        arr = F.from_json(raw, T.ArrayType(et))

        leaf_decl = out_dt.elementType

        def extract(e):
            # single-arg signature: transform would otherwise pass the
            # element INDEX into a second parameter (even a defaulted one)
            c = e
            for s in mp:
                c = c.getField(s)
            return c.try_cast(leaf_decl)

        return F.transform(arr, extract)
    # element-wise ops: parse leniently, truncate back to the decl after
    elem = out_dt.elementType
    parsed_t = T.ArrayType(lenient(elem))
    arr = F.from_json(raw, parsed_t)
    if fn == "reverse":
        # jq: reverse(null/missing) == [] (its length-based definition)
        out = F.coalesce(F.reverse(arr), F.lit([]).cast(parsed_t))
    elif fn == "sort":
        # sort_array places nulls FIRST — jq's total order (null lowest)
        out = F.sort_array(arr)
    elif fn == "unique":
        out = F.sort_array(F.array_distinct(arr))
    else:
        raise AssertionError(fn)
    if parsed_t.elementType != elem:
        out = F.transform(out, lambda x: x.try_cast(elem))
    return out


def _validate_new_specs(project: Optional[dict], schema: T.StructType) -> None:
    """Reject (fn, declared-type) combos the scalar compiler cannot
    honor, so `auto` mode falls back to the Python tier instead of
    mis-executing (raises _SchemaConflict, caught in compile_native)."""
    if not project:
        return
    types = {f.name: f.dataType for f in schema.fields}
    for name, spec in project.items():
        if not (isinstance(spec, tuple) and spec):
            continue
        dt = types.get(name)
        if dt is None:
            continue
        if spec[0] in ("strcat", "strinterp") and not isinstance(dt, T.StringType):
            # concat/interpolation results are strings; numeric
            # declared targets would need Jackson-lenient coercion —
            # Python tier
            raise _SchemaConflict(spec)
        if spec[0] == "slicearr" and not isinstance(
            dt, (T.ArrayType, T.StringType)
        ):
            # a slice yields an array or a string; other declared
            # targets would need lenient coercion — Python tier
            raise _SchemaConflict(spec)
        if spec[0] == "arrayfn":
            _, _path, fn, _args = spec
            if fn == "add" and not isinstance(dt, _NUMERIC_TYPES):
                raise _SchemaConflict(spec)  # string/array concat → Python
            if fn in ("max", "min", "first", "last", "add") and isinstance(
                dt, (T.ArrayType, T.MapType, T.StructType)
            ):
                raise _SchemaConflict(spec)
            if fn in ("reverse", "sort", "unique", "map") and not isinstance(
                dt, T.ArrayType
            ):
                raise _SchemaConflict(spec)
            if fn == "join" and not isinstance(dt, T.StringType):
                raise _SchemaConflict(spec)
            if fn in ("sort", "unique") and isinstance(
                getattr(dt, "elementType", None),
                (T.ArrayType, T.MapType, T.StructType),
            ):
                # Spark's sort_array orders nested arrays/structs by
                # JVM ordering, which diverges from jq's cross-type
                # total order — refuse native so the Python tier keeps
                # jq semantics (VERDICT r4 #2: this gate was dead code
                # behind the reduce raise).
                raise _SchemaConflict(spec)
        if spec[0] == "reduce" and not isinstance(dt, _NUMERIC_TYPES):
            raise _SchemaConflict(spec)  # numeric fold only
        elif spec[0] == "strpred" and not isinstance(dt, T.BooleanType):
            raise _SchemaConflict(spec)
        elif spec[0] == "capture":
            # capture yields an object of named-group STRINGS; the
            # declared struct must resolve by name to a subset of the
            # pattern's groups (extra object keys are ignored by the
            # marshaller, missing ones can't be extracted) — anything
            # else needs lenient coercion, Python tier
            _, _path, _pat, names = spec
            if not isinstance(dt, T.StructType) or not dt.fields:
                raise _SchemaConflict(spec)
            for f in dt.fields:
                if not isinstance(f.dataType, T.StringType):
                    raise _SchemaConflict(spec)
                if f.name not in names:
                    raise _SchemaConflict(spec)
        elif spec[0] == "splitidx" and not isinstance(dt, T.StringType):
            raise _SchemaConflict(spec)
        elif spec[0] == "splitarr" and not (
            isinstance(dt, T.ArrayType)
            and isinstance(dt.elementType, T.StringType)
        ):
            # split always yields array<string>; other declared types
            # would need per-element Jackson-lenient coercion — Python
            raise _SchemaConflict(spec)


class _SchemaConflict(Exception):
    """Element-schema conflict: program falls back to the Python tier."""


class NativePlan:
    """Executable plan: apply(df, column, alias, outer) → DataFrame
    with the same shape jq_explode produces."""

    _colsql: str | None = None  # set per-apply; None → no dup rebuild

    def __init__(self, ir: NativeIR, decls: tuple[str, ...]):
        self.ir = ir
        self.decls = decls
        self.schema, self.single = parse_output_schema(list(decls))
        _validate_new_specs(ir.project, self.schema)
        if ir.iterate:
            self._elem_schema()  # raises _SchemaConflict on mixed shapes
        # recipe cache: (applicationId, colsql, outer) → built Columns
        # (see apply); the lock serializes builds so the transient
        # self._colsql handoff is race-free under concurrent sessions
        self._recipes: dict = {}
        import threading

        self._build_lock = threading.Lock()

    # -- scalar (no explode) path --------------------------------------
    def _build_scalar(self, col: Column) -> tuple:
        """Build the scalar-path recipe: (pre_filter_recipe, out_cols).
        Pure Column construction — no DataFrame access — so the result
        is cacheable and replayable (NativePlan.apply)."""
        ir = self.ir
        pre = _pre_filter_recipe(col, ir.pre_filters)
        out_cols = []
        if ir.single_call is not None:
            # ``.path | keys`` / ``| keys_unsorted`` as the WHOLE
            # program (r11): keys of the path's value into the one
            # declared column.  Gate on the exact-typed variant;
            # keys_unsorted reads the raw text for document order.
            fdt = self.schema.fields[0]
            path = ir.single_path or ()
            jp = _json_path(path) if path else "$"
            v = F.try_variant_get(_parse_doc(col), jp, "variant")
            if ir.single_call == "keys":
                kc = _variant_keys(v)
            elif ir.single_call == "length":
                kc = _variant_length(v)
            else:
                raw = F.get_json_object(col, jp) if path else col
                kc = _keys_unsorted_col(
                    raw, v, doc=col, path=tuple(path), colsql=self._colsql
                )
            out_cols.append(kc.try_cast(fdt.dataType).alias(fdt.name))
        elif self.single and ir.project is None:
            # (wrapped_single projects fall through to the project
            # branch below — the synthetic {col1: <tail>} form)
            fdt = self.schema.fields[0]
            src = ir.single_path
            if isinstance(fdt.dataType, T.MapType):
                out_cols.append(
                    _scalar_map_col(col, src or (), fdt.dataType).alias(fdt.name)
                )
            else:
                out_cols.append(
                    _scalar_out_col(
                        col, src or (), fdt.dataType, colsql=self._colsql
                    ).alias(fdt.name)
                )
        elif ir.project is not None:
            for fdt in self.schema.fields:
                spec = ir.project.get(fdt.name)
                if spec is None:
                    out_cols.append(F.lit(None).cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "lit":
                    out_cols.append(F.lit(spec[1]).cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "expr":
                    _, ast, base = spec
                    c = _compile_expr(
                        ast,
                        lambda p: _dup_fixed_num(col, tuple(base) + p),
                    )
                    out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "fnchain":
                    _, path, fns = spec
                    raw0 = F.get_json_object(col, _json_path(path))
                    # duplicate-key suspects read the LAST occurrence
                    # (r12; r14 document-order rebuild) — the fn-chain
                    # views below otherwise see the first occurrence's
                    # text.  Composed through _dup_fixed_view so the
                    # chain's many text references don't re-inline the
                    # rebuild tree (r14 task-binary discipline).
                    dupv = F.try_variant_get(
                        _parse_doc(col), _json_path(path), "variant"
                    )

                    def _dupfix(view_fn, _p=tuple(path), _v=dupv):
                        return _dup_fixed_view(
                            col, raw0, _v, _p, view_fn, colsql=self._colsql
                        )

                    if fns[0][0] == "type":
                        # r11: type name from the exact-typed variant;
                        # corrupt docs poison to NULL like the sibling
                        # heads (tostring/tojson gate)
                        v = F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                        first = F.when(
                            _parse_doc(col).isNotNull(),
                            _variant_type_name(v),
                        )
                        c = (
                            _apply_fnchain(first, fns[1:])
                            if len(fns) > 1
                            else first
                        )
                        out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                        continue
                    if fns[0][0] in ("tostring", "tojson"):
                        # leading tostring/tojson: number-normalized
                        # view (variant type gate — see _tostring_view
                        # / _tojson_view; tojson additionally quotes
                        # strings).  Corrupt (unparseable) docs must
                        # yield NULL like every other spec — without
                        # the gate the missing-path → "null" identity
                        # would fabricate a value where the Python
                        # tier errors the row (r10, ADVICE class)
                        v = F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                        view = (
                            _tojson_view
                            if fns[0][0] == "tojson"
                            else _tostring_view
                        )

                        def _ts_view(r, _v=v, _view=view, _fns=fns):
                            first = F.when(
                                _parse_doc(col).isNotNull(),
                                _view(r, _v),
                            )
                            return (
                                _apply_fnchain(first, _fns[1:])
                                if len(_fns) > 1
                                else first
                            )

                        c = _dupfix(_ts_view)
                        out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                        continue
                    if fns[0][0] in _STR_ONLY_HEADS | _NUM_ONLY_HEADS:
                        # exact-type gate: wrong-typed values yield
                        # NULL where jq aborts, never a value computed
                        # from their serialization
                        v = F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                        if fns[0][0] in _STR_ONLY_HEADS:
                            c = _apply_fnchain(_variant_string_only(v), fns)
                        else:
                            c = _dupfix(
                                lambda r, _v=v, _fns=fns: _apply_fnchain(
                                    _num_only_view(r, _v), _fns
                                )
                            )
                        out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                        continue

                    def _chain_view(r, _fns=fns, _p=path):
                        c = _apply_fnchain(r, _fns)
                        if _fns[0][0] in ("ltrimstr", "rtrimstr"):
                            # jq passes NON-string values through these
                            # unchanged (no abort) — gate on exact type
                            vt = F.schema_of_variant(
                                F.try_variant_get(
                                    _parse_doc(col),
                                    _json_path(_p),
                                    "variant",
                                )
                            )
                            rest = (
                                _apply_fnchain(r, _fns[1:])
                                if len(_fns) > 1
                                else r
                            )
                            c = F.when(vt == F.lit("STRING"), c).otherwise(rest)
                        return c

                    out_cols.append(
                        _dupfix(_chain_view).cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "alt":
                    _, path, dflt = spec
                    # jq // substitutes when the value is null/missing
                    # OR boolean false — exactly NOT jq-truthy, read
                    # from the exact-typed variant (r12: the old
                    # raw-text null test saw the FIRST occurrence on
                    # duplicate-key docs where jq substitutes on the
                    # last).  Both branches pre-cast to the declared
                    # type so when() type unification can't introduce
                    # a stricter common type (ANSI cast crash).
                    v = F.try_variant_get(
                        _parse_doc(col), _json_path(path), "variant"
                    )
                    c = F.when(
                        ~_variant_truthy(v),
                        F.lit(dflt).try_cast(fdt.dataType),
                    ).otherwise(
                        _scalar_out_col(
                            col, path, fdt.dataType, colsql=self._colsql
                        )
                    )
                    out_cols.append(c.alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "strcat":
                    # doc-validity gate: a corrupt doc parses to a
                    # NULL variant at every path, which the '' +
                    # identity would turn into a literals-only value
                    # ("L-") where the Python tier errors the row —
                    # poison the whole result to NULL instead (r10,
                    # ADVICE fix)
                    c = F.when(
                        _parse_doc(col).isNotNull(),
                        _strcat_col(
                            spec[1],
                            lambda p: F.try_variant_get(
                                _parse_doc(col), _json_path(p), "variant"
                            ),
                        ),
                    )
                    out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "strinterp":
                    def _interp_seg(kind, val, _col=col):
                        v = F.try_variant_get(
                            _parse_doc(_col),
                            _json_path(val),
                            "variant",
                        )

                        # duplicate-key suspects interpolate the LAST
                        # occurrence (r12; r14 document-order rebuild),
                        # composed via _dup_fixed_view so the render's
                        # text references don't re-inline the rebuild
                        def _seg_view(r, _v=v, _kind=kind):
                            view = (
                                _tojson_view
                                if _kind == "pathjson"
                                else _tostring_view
                            )(r, _v)
                            return (
                                _b64_view(view) if _kind == "pathb64" else view
                            )

                        return _dup_fixed_view(
                            _col,
                            F.get_json_object(_col, _json_path(val)),
                            v,
                            tuple(val),
                            _seg_view,
                            colsql=self._colsql,
                        )

                    segs = [
                        F.lit(val) if kind == "lit" else _interp_seg(kind, val)
                        for kind, val in spec[1]
                    ]
                    # same corrupt-doc gate as strcat: interpolation's
                    # null → "null" identity would otherwise fabricate
                    # literals+"null" text for unparseable docs
                    out_cols.append(
                        F.when(
                            _parse_doc(col).isNotNull(),
                            F.concat(*segs),
                        )
                        .cast(fdt.dataType)
                        .alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "length":
                    vv = F.try_variant_get(
                        _parse_doc(col), _json_path(spec[1]), "variant"
                    )
                    out_cols.append(
                        _variant_length(vv).try_cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "keyssorted":
                    vv = F.try_variant_get(
                        _parse_doc(col), _json_path(spec[1]), "variant"
                    )
                    out_cols.append(
                        _variant_keys(vv).try_cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "keysunsorted":
                    vv = F.try_variant_get(
                        _parse_doc(col), _json_path(spec[1]), "variant"
                    )
                    out_cols.append(
                        _keys_unsorted_col(
                            F.get_json_object(col, _json_path(spec[1])),
                            vv,
                            doc=col,
                            path=tuple(spec[1]),
                            colsql=self._colsql,
                        )
                        .try_cast(fdt.dataType)
                        .alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "strpred":
                    _, path, pname, plit = spec
                    # exact-type gate: non-string values project the
                    # null→false delta instead of substring-matching
                    # their JSON serialization
                    s = _variant_string_only(
                        F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                    )
                    if pname == "contains":
                        c = F.coalesce(s.contains(plit), F.lit(False))
                    else:
                        c = _string_pred_col(s, pname, plit)
                    out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "capture":
                    # r14 growth (VERDICT r13 #4): one regexp_extract
                    # per declared named group (group index = order of
                    # appearance — the gate admits ONLY named capturing
                    # groups).  Non-matching / non-string / missing
                    # values yield a NULL struct (jq errors the row —
                    # the documented NULL-delta class); rlike and
                    # regexp_extract both java.util.regex-search
                    # unanchored, like jq's capture.
                    _, path, pat, names = spec
                    s = _variant_string_only(
                        F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                    )
                    fields = [
                        F.regexp_extract(s, pat, names.index(f.name) + 1).alias(
                            f.name
                        )
                        for f in fdt.dataType.fields
                    ]
                    c = F.when(s.rlike(pat), F.struct(*fields))
                    out_cols.append(c.alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "arrayfn":
                    _, path, fn, fargs = spec
                    c = _arrayfn_col(col, path, fn, fargs, fdt.dataType)
                    out_cols.append(c.try_cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "slicearr":
                    _, path, lo, hi = spec
                    c = _slice_col(col, path, lo, hi, fdt.dataType)
                    out_cols.append(c.try_cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "reduce":
                    _, path, init, upd, _var = spec
                    c = _reduce_col(col, path, init, upd)
                    out_cols.append(c.try_cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "splitidx":
                    _, path, sep, idx = spec
                    # split is string-only in jq: non-strings gate to
                    # NULL (jq aborts) instead of splitting their
                    # serialization (r9)
                    s = _variant_string_only(
                        F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                    )
                    parts = F.split(s, _java_quote(sep), -1)
                    c = F.try_element_at(parts, F.lit(idx + 1))
                    out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "splitarr":
                    # r12 growth: the FULL split array (split is
                    # string-only in jq — non-strings gate to NULL
                    # where jq aborts, like splitidx; limit -1 keeps
                    # trailing empty fields, matching jq)
                    _, path, sep = spec
                    s = _variant_string_only(
                        F.try_variant_get(
                            _parse_doc(col), _json_path(path), "variant"
                        )
                    )
                    c = F.split(s, _java_quote(sep), -1)
                    out_cols.append(c.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "ifelse":
                    _, filters, t_spec, e_spec = spec
                    cond = None
                    for item in filters:
                        cc = _cond_col(item, lambda ff: _filter_col(col, ff))
                        cond = cc if cond is None else (cond & cc)

                    def _branch(sp, _dt=fdt.dataType):
                        if sp[0] == "lit":
                            return F.lit(sp[1]).try_cast(_dt)
                        return _scalar_out_col(
                            col, sp[1], _dt, colsql=self._colsql
                        )

                    c = F.when(cond, _branch(t_spec)).otherwise(_branch(e_spec))
                    out_cols.append(c.alias(fdt.name))
                elif isinstance(fdt.dataType, T.MapType):
                    out_cols.append(
                        _scalar_map_col(col, spec, fdt.dataType).alias(fdt.name)
                    )
                else:
                    out_cols.append(
                        _scalar_out_col(
                            col, spec, fdt.dataType, colsql=self._colsql
                        ).alias(fdt.name)
                    )
        else:
            # bare path + NAME:TYPE decls → destructure result object
            base = ir.single_path or ()
            for fdt in self.schema.fields:
                if isinstance(fdt.dataType, T.MapType):
                    out_cols.append(
                        _scalar_map_col(col, base + (fdt.name,), fdt.dataType).alias(
                            fdt.name
                        )
                    )
                    continue
                out_cols.append(
                    _scalar_out_col(
                        col,
                        base + (fdt.name,),
                        fdt.dataType,
                        colsql=self._colsql,
                    ).alias(
                        fdt.name
                    )
                )
        return pre, out_cols

    # -- explode path ---------------------------------------------------
    def _elem_schema(self) -> T.DataType:
        """Schema of one iterated element for from_json."""
        ir = self.ir
        needed: dict = {}
        whole_elem: Optional[T.DataType] = None

        def add(path: Path, dt: T.DataType):
            cur = needed
            for s in path[:-1]:
                cur = cur.setdefault(s, {})
                if not isinstance(cur, dict):
                    # a leaf already claimed this prefix with a scalar
                    # type — mixed-shape access is not representable in
                    # one from_json schema
                    raise _SchemaConflict(path)
            if path:
                prev = cur.get(path[-1])
                if isinstance(prev, dict):
                    raise _SchemaConflict(path)  # leaf vs struct
                if prev is not None and prev != dt:
                    if isinstance(prev, T.VariantType) or isinstance(dt, T.VariantType):
                        # a truthy filter needs the exact JSON type;
                        # variant also casts cleanly to every scalar
                        # consumer type, so variant wins the conflict
                        cur[path[-1]] = T.VariantType()
                    else:
                        # two specs want different scalar types for the
                        # same path: read the string view and let each
                        # consumer cast (string → numeric casts are safe
                        # for clean data; garbage is the documented
                        # delta class)
                        cur[path[-1]] = T.StringType()
                else:
                    cur[path[-1]] = dt

        if ir.single_call is not None:
            # keys/keys_unsorted of the element (or a path under it):
            # the element schema only carries the exact-typed VARIANT
            # for the object/array gate; keys_unsorted's document
            # order additionally reads the raw-text twin at apply time
            if not ir.single_path:
                if ir.post_filters:
                    # bare-variant element can't also carry the
                    # filters' struct fields
                    raise _SchemaConflict(())
                return T.VariantType()
            add(ir.single_path, T.VariantType())
        elif self.single and ir.project is None:
            if not ir.single_path:
                if isinstance(self.schema.fields[0].dataType, T.MapType):
                    # whole-element map needs a variant element — not
                    # representable as the bare element type
                    raise _SchemaConflict(())
                # scalar elements (filters unsupported; guarded in compile)
                return self.schema.fields[0].dataType
            add(ir.single_path, _elem_decl_type(self.schema.fields[0].dataType))
        elif ir.project is not None:
            for fdt in self.schema.fields:
                spec = ir.project.get(fdt.name)
                if spec is None or (isinstance(spec, tuple) and spec and spec[0] == "lit"):
                    continue
                if isinstance(spec, tuple) and spec and spec[0] == "expr":
                    _, ast, base = spec
                    refs: list = []
                    _expr_paths(ast, refs)
                    for p in refs:
                        add(tuple(base) + p, T.DoubleType())
                elif isinstance(spec, tuple) and spec and spec[0] == "fnchain":
                    if spec[2][0][0] in ("ltrimstr", "rtrimstr", "type"):
                        # leading trims gate on the exact JSON type
                        # (jq passes NON-strings through unchanged);
                        # `type` reads the type name from the exact-
                        # typed variant (r11)
                        if not spec[1]:
                            raise _SchemaConflict(spec)
                        add(spec[1], T.VariantType())
                    else:
                        if not spec[1]:
                            # whole-element fn chain ({v: (.|tojson)}):
                            # add(()) is a no-op, which silently typed
                            # the element STRUCT<> and mis-executed
                            # (r12 find) — Python tier
                            raise _SchemaConflict(spec)
                        add(spec[1], T.StringType())  # string view
                elif isinstance(spec, tuple) and spec and spec[0] == "alt":
                    # `//` substitutes on null/missing OR boolean false —
                    # needs the exact JSON type, so read a variant
                    if not spec[1]:
                        raise _SchemaConflict(spec)
                    add(spec[1], T.VariantType())
                elif isinstance(spec, tuple) and spec and spec[0] == "strcat":
                    # each path part gates on the exact JSON type
                    for pk, pv in spec[1]:
                        if pk == "path":
                            if not pv:
                                raise _SchemaConflict(spec)
                            add(pv, T.VariantType())
                elif isinstance(spec, tuple) and spec and spec[0] == "strinterp":
                    # raw text view for the value (document order for
                    # objects); the type gate reads the element
                    # variant (elem_var) instead.  @json interpolants
                    # ("pathjson") read the same views — the quoted
                    # string renders from the variant's string value
                    for pk, pv in spec[1]:
                        if pk != "lit":
                            if not pv:
                                raise _SchemaConflict(spec)
                            add(pv, T.StringType())
                elif isinstance(spec, tuple) and spec and spec[0] in (
                    "length",
                    "keyssorted",
                    # r11: keys_unsorted compiles under iterates too —
                    # the variant here is only the type gate; document
                    # order comes from the element's raw-text twin
                    # (mid-path ``ex`` or the posexplode-indexed text
                    # array in _apply_explode)
                    "keysunsorted",
                ):
                    if not spec[1]:
                        raise _SchemaConflict(spec)  # of the element itself
                    add(spec[1], T.VariantType())
                elif isinstance(spec, tuple) and spec and spec[0] in (
                    "arrayfn",
                    "strpred",
                    "ifelse",
                    "splitidx",
                    "splitarr",
                    "reduce",
                ):
                    # scalar-tier-only spec kinds: under an iterate the
                    # program falls back to the Python tier
                    raise _SchemaConflict(spec)
                else:
                    if spec == ():
                        # whole-element projection ({v: .}): the
                        # element IS the value — representable only
                        # when nothing else needs struct fields
                        # (checked below); add() on an empty path
                        # would silently type the element STRUCT<>
                        # and crash at apply (r12 find)
                        whole_elem = _elem_decl_type(fdt.dataType)
                        continue
                    add(spec, _elem_decl_type(fdt.dataType))
        else:
            for fdt in self.schema.fields:
                add(ir.single_path + (fdt.name,), _elem_decl_type(fdt.dataType))
        for f in _each_filter(ir.post_filters):
            if f.lhs_expr is not None:
                refs: list = []
                _expr_paths(f.lhs_expr, refs)
                for p in refs:
                    add(tuple(f.lhs) + p, T.DoubleType())
            elif not f.lhs:
                # predicate over the element itself (select(has("k")),
                # select(. > 5), select(length > 2), ...): r12 — reads
                # the element's VARIANT twin (elem_var) at apply time,
                # so the from_json schema carries nothing for it
                # (needs_ev picks these up)
                continue
            elif f.op in _STR_PREDS:
                # variant, not string: a StringType field would capture
                # the raw serialization of non-string values and the
                # predicate could falsely match it (see
                # _variant_string_only)
                add(f.lhs, T.VariantType())
            else:
                # truthy and plain comparisons both need the exact JSON
                # type (jq truthiness / total-order ranking) — variant
                add(f.lhs, T.VariantType())

        def to_struct(d: dict) -> T.DataType:
            if d and all(isinstance(k, int) for k in d):
                # integer steps ([0], [2]) → the level is an ARRAY; the
                # element type is the merge of every index's needs
                ets = [to_struct(v) if isinstance(v, dict) else v for v in d.values()]
                et = ets[0]
                for other in ets[1:]:
                    if other != et:
                        if isinstance(et, T.VariantType) or isinstance(
                            other, T.VariantType
                        ):
                            et = T.VariantType()
                        elif isinstance(et, T.StructType) or isinstance(
                            other, T.StructType
                        ):
                            raise _SchemaConflict(tuple(d))
                        else:
                            et = T.StringType()  # consumers re-cast
                return T.ArrayType(et)
            if any(isinstance(k, int) for k in d):
                # mixed array-index and field access of one level
                raise _SchemaConflict(tuple(d))
            fields = []
            for k, v in d.items():
                fields.append(T.StructField(str(k), to_struct(v) if isinstance(v, dict) else v))
            return T.StructType(fields)

        if whole_elem is not None:
            if needed:
                # the element cannot be a scalar AND carry struct
                # fields for other specs/filters — Python tier
                raise _SchemaConflict(())
            return whole_elem
        return to_struct(needed)

    def _build_explode(self, col: Column, outer: bool) -> tuple:
        """Build the explode-path recipe:
        (pre_filter_recipe, gens, post_conds, out_cols) where gens is
        a list of (generated_column_name, generator Column) — name
        None marks the posexplode select("*", gen) form.  Pure Column
        construction, cacheable (NativePlan.apply)."""
        ir = self.ir

        def wrap_steps(steps: Path, inner: T.DataType) -> T.DataType:
            for s in reversed(steps):
                if isinstance(s, int):
                    inner = T.ArrayType(inner)
                else:
                    inner = T.StructType([T.StructField(s, inner)])
            return inner

        pre = _pre_filter_recipe(col, ir.pre_filters)
        elem = self._elem_schema()
        # wrap the LAST element's schema in each iterate level's array
        # + the steps leading to it, innermost-out, then the pre-path
        lvl0: T.DataType = T.ArrayType(elem)
        for mid in reversed(ir.mid_paths):
            lvl0 = T.ArrayType(wrap_steps(mid, lvl0))
        arr_t = wrap_steps(ir.pre_path, lvl0)
        parsed = F.from_json(col, arr_t)
        nav = parsed
        for s in ir.pre_path:
            nav = _nav_step(nav, s)
        # from_json nulls the WHOLE typed array when any element
        # mismatches the element schema (a scalar where a struct is
        # declared, a string in a numeric array, ...), which would DROP
        # rows the reference marshals as null-field rows (M1/M3: field
        # of a non-object → NULL).  Rebuild through an array<variant>
        # parse: each element keeps its exact JSON type, so well-typed
        # elements still yield their values (try_variant_get casts
        # support nested struct/array targets) while mismatched
        # elements yield NULLs — including strings whose CONTENT looks
        # like JSON (the text view cannot tell those apart; the
        # variant gate can).  Applies to EVERY element shape: struct
        # elements (flat or nested — an earlier revision fabricated
        # all-NULL rows for nested/mid-path element schemas, nulling
        # valid object elements) and bare scalar elements (which
        # previously had no fallback at all, dropping every row of a
        # mixed array).  Garbage-value casts (non-numeric string into
        # a numeric field → NULL here vs Jackson-lenient 0 in the
        # Python tier) remain the documented cast-leniency delta.
        jsonpath = _json_path(ir.pre_path) if ir.pre_path else "$"
        # r13 (VERDICT r12 #4): the text source feeding the object-
        # iterate route and the text twins is duplicate-key aware,
        # value-precisely — a DUPLICATED ANCESTOR path no longer
        # iterates the FIRST occurrence's values (the typed from_json
        # nav was already last-wins, so this also re-aligns the
        # text/variant twins on dup docs).  False positives keep the
        # raw text, preserving document key order for object
        # iteration; true duplicates substitute the DOCUMENT-ORDER
        # rebuild (r14, VERDICT r13 #3) — last-wins values, object
        # values iterating in the last occurrence's document order
        # like jq (sorted-render fallback only beyond the rebuild
        # depth or on walk failure).
        src_raw = (
            F.get_json_object(col, _json_path(ir.pre_path))
            if ir.pre_path
            else col
        )
        src = _dup_fixed_raw(
            col,
            src_raw,
            F.try_variant_get(_parse_doc(col), jsonpath, "variant"),
            path=tuple(ir.pre_path or ()),
            colsql=self._colsql,
            shallow=True,
        )
        # only rebuild when the value at the path IS a JSON array —
        # get_json_object strips quotes from string values, so a
        # string "[1,2]" would otherwise fabricate rows
        is_array = F.schema_of_variant(
            F.try_variant_get(_parse_doc(col), jsonpath, "variant")
        ).startswith("ARRAY")
        et = lvl0.elementType

        def _rebuild(e, t=et):
            if isinstance(t, T.StructType):
                cols = []
                for f in t.fields:
                    fp = _json_path((f.name,))
                    if isinstance(f.dataType, T.VariantType):
                        cols.append(
                            F.try_variant_get(e, fp, "variant").alias(f.name)
                        )
                    else:
                        cols.append(
                            F.try_variant_get(
                                e, fp, f.dataType.simpleString()
                            ).alias(f.name)
                        )
                return F.struct(*cols)
            if isinstance(t, T.VariantType):
                return e
            return F.try_variant_get(e, "$", t.simpleString())

        fallback = F.transform(
            F.from_json(src, T.ArrayType(T.VariantType())),
            lambda e: _rebuild(e),
        )
        # `.[]` over an OBJECT iterates its VALUES (jq semantics; the
        # Python tier has always done this — the native tier used to
        # silently drop such rows).  The values come from a from_json
        # map parse, which preserves the document's key insertion
        # order exactly like the Python tier; the variant route would
        # NOT (variant objects sort their keys), so it is only used
        # for the is-object gate.  Mid-level iterates get the same
        # document-order treatment from the raw-text twin threaded
        # through the chained explodes below (r9).
        is_object = F.schema_of_variant(
            F.try_variant_get(_parse_doc(col), jsonpath, "variant")
        ).startswith("OBJECT")
        obj_vals = F.map_values(
            F.from_json(src, T.MapType(T.StringType(), T.VariantType()))
        )
        obj_fallback = F.transform(obj_vals, lambda e: _rebuild(e))
        # the is_object branch must PRE-empt the typed parse: Jackson
        # reads a JSON object where array<struct> is declared as a
        # single-element array (its lenient convenience), which would
        # emit the object itself as one row instead of iterating its
        # values.  A null/false is_object (array, scalar, corrupt)
        # keeps the pre-r8 behavior bit-for-bit.
        nav = F.when(is_object, obj_fallback).otherwise(
            F.coalesce(nav, F.when(is_array, fallback))
        )
        lims = ir.iter_limits or []
        if lims and lims[0] is not None:
            # limit(n; .[]) — jq's lazy "first n outputs" is a slice
            # BEFORE the explode: the dropped elements never become rows
            nav = F.slice(nav, F.lit(1), F.lit(lims[0]))
        gen = F.explode_outer if outer else F.explode
        # leading-tostring fnchains need the element's VARIANT for the
        # number-normalization type gate (_tostring_view); multi-level
        # programs already thread a variant twin, single-level ones
        # switch to posexplode and index the doc-level variant array
        gated_heads = {"tostring", "tojson"} | _STR_ONLY_HEADS | _NUM_ONLY_HEADS

        def _is_plain_path(s) -> bool:
            return isinstance(s, tuple) and not (
                s and isinstance(s[0], str) and s[0] in _SPEC_KINDS
            )

        _str_decls = {
            f.name
            for f in self.schema.fields
            if isinstance(f.dataType, T.StringType)
        }
        needs_ev = (
            ir.project is not None
            and any(
                isinstance(s, tuple)
                and s
                and (
                    (s[0] == "fnchain" and s[2][0][0] in gated_heads)
                    or s[0] == "strinterp"
                )
                for s in ir.project.values()
            )
        ) or (
            # r10: STRING-declared plain-path outputs read the element
            # variant for the M2 number normalization — without it the
            # raw capture emits "1.0"/'{"k":1.0}' where the Python
            # tier's marshaller prints "1"/'{"k":1}' (deep-fuzz find;
            # the r9 tostring class on the M2 route)
            ir.project is not None
            and any(
                _is_plain_path(s) and k in _str_decls
                for k, s in ir.project.items()
            )
        ) or (ir.project is None and ir.single_call is None and bool(_str_decls)) or any(
            # r12: whole-element predicates (select(has("k")) /
            # select(. > 5) under an iterate) read the element's
            # variant twin instead of a from_json field
            f.lhs_expr is None and not f.lhs
            for f in _each_filter(ir.post_filters)
        )
        # r11: keys_unsorted under an iterate needs the element's RAW
        # text (document key order — variants sort object keys).  The
        # mid-path route already threads a text twin (``ex``); the
        # single-level route builds a posexplode-indexed text array.
        needs_ex = ir.single_call == "keys_unsorted" or (
            ir.project is not None
            and any(
                isinstance(s, tuple) and s and s[0] == "keysunsorted"
                for s in ir.project.values()
            )
        )
        elem_var = None
        elem_txt = None
        # SQL fragment for elem_txt where one exists (r14): mid-path
        # explode levels materialize the text twin as a real struct
        # field, so element-level dup-key reads can take the
        # document-order rebuild; the posexplode twin is a derived
        # expression with no SQL name -> no rebuild there (sorted
        # fallback, documented residual)
        elem_txt_sql = None
        if ir.mid_paths:
            # chained explode for multi-iterate programs (.a[].b[]).
            # from_json nulls the DEEPEST mismatching node (an inner
            # array with one off-type element nulls just that array,
            # keeping the outer parse), so the level-0 coalesce above
            # cannot see inner losses.  Thread a variant twin through
            # every explode level via arrays_zip: each level re-derives
            # its array from the element's variant (per-element-lenient
            # nested cast) when the typed navigation lost it.
            #
            # r9: ALSO thread a raw-TEXT twin.  Inner-level `.[]` over
            # an OBJECT must iterate its values in DOCUMENT key order
            # (jq semantics; the Python tier does), and variants sort
            # object keys — the only order-preserving route is a
            # from_json map parse of the element's raw JSON text.
            # get_json_object preserves object field order in the
            # extracted text, and from_json to array<string> /
            # map<string,string> captures each element's raw text, so
            # the text twin stays index-aligned with the typed and
            # variant twins (all three parse the same JSON).  The
            # object gate reads the VARIANT's type, never the text
            # (get_json_object strips quotes from string leaves, so a
            # string whose content looks like "{...}" would fool a
            # text sniff).
            lvl_types = [T.ArrayType(elem)]
            for mid in reversed(ir.mid_paths):
                lvl_types.append(T.ArrayType(wrap_steps(mid, lvl_types[-1])))
            lvl_types.reverse()  # lvl_types[lvl] = array type exploded at lvl
            null_var = F.lit(None).cast(T.VariantType())
            null_txt = F.lit(None).cast(T.StringType())
            txt_arr_t = T.ArrayType(T.StringType())
            txt_map_t = T.MapType(T.StringType(), T.StringType())
            var_map_t = T.MapType(T.StringType(), T.VariantType())
            var0 = F.try_variant_get(
                _parse_doc(col), jsonpath, "array<variant>"
            )
            # object-iterated level 0: the variant twin must come from
            # the SAME from_json parse as nav so the zip stays
            # index-aligned (variant object access would re-order)
            var0 = F.coalesce(
                var0,
                F.when(is_object, obj_vals),
                F.array_repeat(null_var, F.size(nav)),
            )
            txt0 = F.coalesce(
                F.when(is_object, F.map_values(F.from_json(src, txt_map_t))).otherwise(
                    F.from_json(src, txt_arr_t)
                ),
                F.array_repeat(null_txt, F.size(nav)),
            )
            if lims and lims[0] is not None:
                # keep the twins aligned with the sliced nav
                var0 = F.slice(var0, F.lit(1), F.lit(lims[0]))
                txt0 = F.slice(txt0, F.lit(1), F.lit(lims[0]))
            zipped = F.when(
                nav.isNotNull(),
                F.arrays_zip(nav.alias("t"), var0.alias("v"), txt0.alias("x")),
            )
            gens = [("__jq_elem0", gen(zipped))]
            ec = F.col("__jq_elem0").getField("t")
            ev = F.col("__jq_elem0").getField("v")
            ex = F.col("__jq_elem0").getField("x")
            for lvl, mid in enumerate(ir.mid_paths, start=1):
                c2 = ec
                for s in mid:
                    c2 = _nav_step(c2, s)
                vpath = _json_path(mid)
                v2 = F.try_variant_get(ev, vpath, "array<variant>")
                tx2 = F.get_json_object(ex, vpath)
                is_obj2 = F.schema_of_variant(
                    F.try_variant_get(ev, vpath, "variant")
                ).startswith("OBJECT")
                v_obj = F.map_values(F.from_json(tx2, var_map_t))
                lvl_et = lvl_types[lvl].elementType
                c2 = F.coalesce(
                    c2,
                    F.when(
                        v2.isNotNull(),
                        F.try_variant_get(
                            ev, vpath, lvl_types[lvl].simpleString()
                        ),
                    ),
                    F.when(
                        is_obj2,
                        # NOTE: F.transform dispatches on lambda arity
                        # (2 params = element,index), so bind the level
                        # type via closure, not a defaulted parameter
                        F.transform(v_obj, (lambda _t: lambda e: _rebuild(e, _t))(lvl_et)),
                    ),
                )
                v2 = F.coalesce(
                    v2,
                    F.when(is_obj2, v_obj),
                    F.array_repeat(null_var, F.size(c2)),
                )
                x2 = F.coalesce(
                    F.when(
                        is_obj2, F.map_values(F.from_json(tx2, txt_map_t))
                    ).otherwise(F.from_json(tx2, txt_arr_t)),
                    F.array_repeat(null_txt, F.size(c2)),
                )
                limn = lims[lvl] if lvl < len(lims) else None
                if limn is not None:
                    c2 = F.slice(c2, F.lit(1), F.lit(limn))
                    v2 = F.slice(v2, F.lit(1), F.lit(limn))
                    x2 = F.slice(x2, F.lit(1), F.lit(limn))
                zipped = F.when(
                    c2.isNotNull(),
                    F.arrays_zip(c2.alias("t"), v2.alias("v"), x2.alias("x")),
                )
                gens.append((f"__jq_elem{lvl}", gen(zipped)))
                ec = F.col(f"__jq_elem{lvl}").getField("t")
                ev = F.col(f"__jq_elem{lvl}").getField("v")
                ex = F.col(f"__jq_elem{lvl}").getField("x")
            elem_var = ev  # last level's variant twin
            elem_txt = ex  # last level's raw-text twin
            elem_txt_sql = f"`__jq_elem{lvl}`.x"
        elif needs_ev or needs_ex:
            # posexplode keeps the element index so the element's
            # variant can be read from the doc-level variant array
            # (object-iterated level 0 uses the SAME map-parse value
            # array the nav branch used, keeping index alignment)
            var_arr = F.coalesce(
                F.try_variant_get(
                    _parse_doc(col), jsonpath, "array<variant>"
                ),
                F.when(is_object, obj_vals),
            )
            if lims and lims[0] is not None:
                var_arr = F.slice(var_arr, F.lit(1), F.lit(lims[0]))
            txt_arr = None
            if needs_ex:
                # raw element text, index-aligned with nav: objects
                # via a map parse (from_json preserves document key
                # order), arrays via array<string> (each element's
                # raw JSON text)
                txt_arr = F.when(
                    is_object,
                    F.map_values(
                        F.from_json(
                            src, T.MapType(T.StringType(), T.StringType())
                        )
                    ),
                ).otherwise(F.from_json(src, T.ArrayType(T.StringType())))
                if lims and lims[0] is not None:
                    txt_arr = F.slice(txt_arr, F.lit(1), F.lit(lims[0]))
            pgen = F.posexplode_outer if outer else F.posexplode
            gens = [(None, pgen(nav).alias("__jq_pos0", "__jq_elem0"))]
            ec = F.col("__jq_elem0")
            elem_var = F.try_element_at(var_arr, F.col("__jq_pos0") + 1)
            if txt_arr is not None:
                elem_txt = F.try_element_at(txt_arr, F.col("__jq_pos0") + 1)
        else:
            gens = [("__jq_elem0", gen(nav))]
            ec = F.col("__jq_elem0")
        def _elem_leaf(ff: Filter) -> Column:
            # r12: whole-element predicates read the variant twin —
            # the typed element (ec) cannot carry "the element itself"
            # alongside the projection struct in one from_json schema
            if ff.lhs_expr is None and not ff.lhs and elem_var is not None:
                return _variant_leaf_filter(elem_var, ff)
            return _struct_filter_col(ec, ff)

        post_conds = [
            _cond_col(f, _elem_leaf) for f in ir.post_filters
        ]

        def _ev_at(path: Path):
            if elem_var is None:  # pragma: no cover - needs_ev guards
                return F.lit(None).cast(T.VariantType())
            if path:
                return F.try_variant_get(elem_var, _json_path(path), "variant")
            return elem_var

        def _plain_out(c: Column, path: Path, dt: T.DataType) -> Column:
            # r10: M2 number normalization for string-declared plain
            # paths (the scalar tier's _scalar_out_col, element-side)
            if isinstance(dt, T.StringType) and elem_var is not None:
                s = c.try_cast("string")
                return _m2_gate(s, _m2_string_view(s, _ev_at(path)))
            return _elem_out_col(c, dt)

        out_cols = []
        if ir.single_call is not None:
            # ``.[] ... | keys`` / ``| keys_unsorted`` — keys of the
            # element (or a path under it).  The typed parse carries
            # the exact-typed variant for the object/array gate;
            # document order for keys_unsorted comes from elem_txt.
            fdt0 = self.schema.fields[0]
            c = ec
            for s in ir.single_path:
                c = _nav_step(c, s)
            if ir.single_call == "keys":
                kc = _variant_keys(c)
            elif ir.single_call == "length":
                kc = _variant_length(c)
            else:
                if elem_txt is None:  # pragma: no cover - needs_ex guards
                    raw = F.lit(None).cast(T.StringType())
                elif ir.single_path:
                    raw = F.get_json_object(
                        elem_txt, _json_path(ir.single_path)
                    )
                else:
                    raw = elem_txt
                kc = _keys_unsorted_col(
                    raw,
                    c,
                    doc=elem_txt,
                    path=tuple(ir.single_path or ()),
                    colsql=elem_txt_sql,
                )
            out_cols.append(kc.try_cast(fdt0.dataType).alias(fdt0.name))
        elif self.single and ir.project is None:
            c = ec
            for s in ir.single_path:
                c = _nav_step(c, s)
            out_cols.append(
                _plain_out(
                    c, ir.single_path, self.schema.fields[0].dataType
                ).alias(self.schema.fields[0].name)
            )
        elif ir.project is not None:
            for fdt in self.schema.fields:
                spec = ir.project.get(fdt.name)
                if spec is None:
                    out_cols.append(F.lit(None).cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "lit":
                    out_cols.append(F.lit(spec[1]).cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "expr":
                    _, ast, base = spec

                    def nav(p, _base=tuple(base)):
                        c = ec
                        for s in _base + p:
                            c = _nav_step(c, s)
                        return c.try_cast("double")

                    out_cols.append(
                        _compile_expr(ast, nav).cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "fnchain":
                    _, path, fns = spec
                    c = ec
                    for st in path:
                        c = _nav_step(c, st)
                    if fns[0][0] == "type":
                        # element schema typed this path VARIANT (r11)
                        first = _variant_type_name(c)
                        cc = (
                            _apply_fnchain(first, fns[1:])
                            if len(fns) > 1
                            else first
                        )
                        out_cols.append(cc.cast(fdt.dataType).alias(fdt.name))
                        continue
                    if fns[0][0] in ("tostring", "tojson") and elem_var is not None:
                        # leading tostring/tojson: number-normalized
                        # view via the element's variant
                        v = (
                            F.try_variant_get(
                                elem_var, _json_path(path), "variant"
                            )
                            if path
                            else elem_var
                        )
                        view = (
                            _tojson_view
                            if fns[0][0] == "tojson"
                            else _tostring_view
                        )
                        first = view(c.try_cast("string"), v)
                        cc = (
                            _apply_fnchain(first, fns[1:])
                            if len(fns) > 1
                            else first
                        )
                        out_cols.append(cc.cast(fdt.dataType).alias(fdt.name))
                        continue
                    if (
                        fns[0][0] in _STR_ONLY_HEADS | _NUM_ONLY_HEADS
                        and elem_var is not None
                    ):
                        v = (
                            F.try_variant_get(
                                elem_var, _json_path(path), "variant"
                            )
                            if path
                            else elem_var
                        )
                        first = (
                            _variant_string_only(v)
                            if fns[0][0] in _STR_ONLY_HEADS
                            else _num_only_view(c.try_cast("string"), v)
                        )
                        cc = _apply_fnchain(first, fns)
                        out_cols.append(cc.cast(fdt.dataType).alias(fdt.name))
                        continue
                    if fns[0][0] in ("ltrimstr", "rtrimstr"):
                        # the element schema typed this path VARIANT:
                        # jq passes NON-strings through trims unchanged
                        vt = F.schema_of_variant(c)
                        s = c.try_cast("string")
                        full_c = _apply_fnchain(s, fns)
                        rest = _apply_fnchain(s, fns[1:]) if len(fns) > 1 else s
                        cc = F.when(vt == F.lit("STRING"), full_c).otherwise(rest)
                    else:
                        # try_cast("string") first: a truthy filter on
                        # the same path retypes it VARIANT; for a
                        # string column this is a no-op
                        cc = _apply_fnchain(c.try_cast("string"), fns)
                    out_cols.append(cc.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "alt":
                    # path typed VARIANT by the element schema — exact
                    # type gates the boolean-false substitution
                    _, path, dflt = spec
                    c = ec
                    for st in path:
                        c = _nav_step(c, st)
                    vt = F.schema_of_variant(c)
                    is_false = (vt == F.lit("BOOLEAN")) & ~F.try_variant_get(
                        c, "$", "boolean"
                    )
                    out_cols.append(
                        F.when(
                            c.isNull() | (vt == F.lit("VOID")) | is_false,
                            F.lit(dflt).try_cast(fdt.dataType),
                        )
                        .otherwise(c.try_cast(fdt.dataType))
                        .alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "strcat":
                    def _var_of(p, _ec=ec):
                        c2 = _ec
                        for st in p:
                            c2 = _nav_step(c2, st)
                        return c2

                    cc = _strcat_col(spec[1], _var_of)
                    out_cols.append(cc.cast(fdt.dataType).alias(fdt.name))
                elif isinstance(spec, tuple) and spec and spec[0] == "strinterp":
                    segs = []
                    for kind, val in spec[1]:
                        if kind == "lit":
                            segs.append(F.lit(val))
                            continue
                        c2 = ec
                        for st in val:
                            c2 = _nav_step(c2, st)
                        if elem_var is not None:
                            v2 = (
                                F.try_variant_get(
                                    elem_var, _json_path(val), "variant"
                                )
                                if val
                                else elem_var
                            )
                        else:  # pragma: no cover - needs_ev guards this
                            v2 = F.lit(None).cast(T.VariantType())
                        view = (
                            _tojson_view if kind == "pathjson" else _tostring_view
                        )(c2.try_cast("string"), v2)
                        segs.append(
                            _b64_view(view) if kind == "pathb64" else view
                        )
                    out_cols.append(
                        F.concat(*segs).cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "length":
                    _, path = spec
                    c = ec
                    for st in path:
                        c = _nav_step(c, st)
                    out_cols.append(
                        _variant_length(c).try_cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "keyssorted":
                    _, path = spec
                    c = ec
                    for st in path:
                        c = _nav_step(c, st)
                    out_cols.append(
                        _variant_keys(c).try_cast(fdt.dataType).alias(fdt.name)
                    )
                elif isinstance(spec, tuple) and spec and spec[0] == "keysunsorted":
                    # r11: document-order keys under an iterate — the
                    # raw text of the path comes from the element's
                    # text twin, the gate from the typed variant
                    _, path = spec
                    c = ec
                    for st in path:
                        c = _nav_step(c, st)
                    raw = (
                        F.get_json_object(elem_txt, _json_path(path))
                        if elem_txt is not None
                        else F.lit(None).cast(T.StringType())
                    )
                    out_cols.append(
                        _keys_unsorted_col(
                            raw,
                            c,
                            doc=elem_txt,
                            path=tuple(path),
                            colsql=elem_txt_sql,
                        )
                        .try_cast(fdt.dataType)
                        .alias(fdt.name)
                    )
                else:
                    c = ec
                    for s in spec:
                        c = _nav_step(c, s)
                    out_cols.append(_plain_out(c, spec, fdt.dataType).alias(fdt.name))
        else:
            for fdt in self.schema.fields:
                c = ec
                for s in ir.single_path + (fdt.name,):
                    c = _nav_step(c, s)
                out_cols.append(
                    _plain_out(
                        c, ir.single_path + (fdt.name,), fdt.dataType
                    ).alias(fdt.name)
                )
        return pre, gens, post_conds, out_cols

    def apply(self, df: DataFrame, column: str | Column, outer: bool = False) -> DataFrame:
        """Apply the plan to a DataFrame.

        r14 optimization (guide §1.2 "per-task work", driver-side):
        every Column the plan needs is built ONCE per (Spark context,
        column name, outer) and cached on the plan instance — building
        the tree costs hundreds of py4j round trips (~0.5–2 s of
        driver latency per jq_explode, measured), replaying the cached
        recipe on a DataFrame costs a handful of where/withColumn/
        select calls.  Nothing data-dependent is cached: recipes are
        unresolved expression trees, the same objects a fresh build
        would produce, so plans, results, and explain output are
        bit-identical.  Keyed by applicationId so a restarted context
        (new JVM) never sees another JVM's py4j handles; Column-typed
        doc inputs (no stable SQL identity) skip the cache."""
        col = F.col(column) if isinstance(column, str) else column
        # SQL fragment for the doc column (r14): the document-order
        # dup-key rebuild is generated as ONE SQL text for py4j
        # economy, which needs the doc as SQL; a Column-typed doc has
        # no SQL render on Spark 4 → no rebuild (sorted fallback).
        colsql = (
            "`%s`" % column.replace("`", "``")
            if isinstance(column, str)
            else None
        )
        key = None
        if colsql is not None:
            try:
                appid = df.sparkSession.sparkContext.applicationId
            except Exception:  # pragma: no cover - defensive
                appid = None
            if appid is not None:
                key = (appid, colsql, outer)
        with self._build_lock:
            recipe = self._recipes.get(key) if key is not None else None
            if recipe is None:
                self._colsql = colsql
                # doc-level bind-once (r15): while building, reads of
                # the top-level doc column reference the per-row
                # (suspect, variant) binding that replay injects below
                token = None
                if colsql is not None:
                    try:
                        doc_sql = col._jc.toString()
                    except Exception:  # pragma: no cover - defensive
                        doc_sql = None
                    if doc_sql is not None:
                        token = _DOC_BINDING.set((doc_sql, _BIND_COL))
                try:
                    if self.ir.iterate:
                        recipe = (
                            "explode",
                            self._build_explode(col, outer),
                            token is not None,
                        )
                    else:
                        recipe = (
                            "scalar",
                            self._build_scalar(col),
                            token is not None,
                        )
                finally:
                    if token is not None:
                        _DOC_BINDING.reset(token)
                if key is not None:
                    if len(self._recipes) > 64:  # stale-context bound
                        self._recipes.clear()
                    self._recipes[key] = recipe
        kind, parts, bound = recipe
        src = _with_doc_binding(df, col) if bound else df
        if kind == "scalar":
            pre, out_cols = parts
            out = _run_pre_filters(src, pre)
            if bound:
                return out.select(
                    *[c for c in out.columns if c != _BIND_COL], *out_cols
                )
            return out.select("*", *out_cols)
        pre, gens, post_conds, out_cols = parts
        out = _run_pre_filters(src, pre)
        keep = [c for c in out.columns if c != _BIND_COL]
        for name, gcol in gens:
            if name is None:
                out = out.select("*", gcol)
            else:
                out = out.withColumn(name, gcol)
        for c in post_conds:
            out = out.where(c)
        return out.select(*keep, *out_cols)


_PLAN_CACHE: dict[tuple[str, tuple[str, ...]], Optional[NativePlan]] = {}


def compile_native(program: str, decls: tuple[str, ...]) -> Optional[NativePlan]:
    """Try to compile a jq program + declarations to a native plan.

    Returns None when the program falls outside the simple-path
    subset (the caller falls back to the Python UDTF tier).

    Memoized (r14 opt): plans are pure functions of (program, decls)
    and hold no data or session state, so repeated jq_explode calls —
    the bench re-runs every query several times, a production driver
    re-plans per micro-batch — share one plan instance, whose apply()
    additionally caches its built Column recipe (the expensive part).
    Mirrors the Python tier's _QUERY_CACHE in udtf.py."""
    key = (program, tuple(decls))
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    plan = _compile_native_uncached(program, decls)
    if len(_PLAN_CACHE) > 4096:  # runaway-workload bound
        _PLAN_CACHE.clear()
    _PLAN_CACHE[key] = plan
    return plan


def _compile_native_uncached(
    program: str, decls: tuple[str, ...]
) -> Optional[NativePlan]:
    try:
        schema, single = parse_output_schema(list(decls))
    except Exception:
        return None
    ir = analyze_program(program)
    if ir is None and single and not isinstance(
        schema.fields[0].dataType, T.MapType
    ):
        # r11 jq1-style widening: bare single-TYPE programs with a
        # projection-value tail compile through a synthetic one-field
        # wrap.  Map decls stay Python-tier: M4 maps non-objects to
        # the EMPTY map, which the project spec compilers don't model
        ir = analyze_program_single_wrap(program, schema.fields[0].name)
    if ir is None:
        return None
    # single-TYPE form with a USER object construct would marshal the
    # whole object into col1 — not covered by this tier (the synthetic
    # wrapped_single project is the deliberate exception)
    if single and ir.project is not None and not ir.wrapped_single:
        return None
    if ir.single_call is not None and (
        # keys/length output is a non-object value, which the
        # marshaller routes into a column only in the single-TYPE
        # decl form — NAMED decls are object-key lookups and yield
        # NULL for it (pinned by the bare-vs-named differential in
        # test_native).  keys compile only into array-typed decls (a
        # string decl would take Spark's cast text where the Python
        # tier marshals jq's text); length only into numeric ones.
        not single
        or not isinstance(
            schema.fields[0].dataType,
            _NUMERIC_TYPES if ir.single_call == "length" else T.ArrayType,
        )
    ):
        return None
    # guard: scalar-element explode with post filters/steps is fine,
    # but filters on a *scalar* element (no struct) aren't expressible
    if ir.iterate and single and ir.project is None and not ir.single_path and ir.post_filters:
        return None
    try:
        return NativePlan(ir, tuple(decls))
    except _SchemaConflict:
        # mixed leaf/struct access of the same path — not representable
        # in one from_json schema; the Python tier handles it
        return None
