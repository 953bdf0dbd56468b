"""Recursive-descent parser for jq producing a tuple-based AST.

Precedence ladder follows the public jq grammar (lowest → highest):
``|``  →  ``,``  →  ``//``  →  assignments (``= |= += -= *= /= %= //=``,
non-assoc)  →  ``or``  →  ``and``  →  comparisons (non-assoc)  →
``+ -``  →  ``* / %``  →  unary ``-``  →  postfix (``.f`` ``[...]``
``?``)  →  primary.

AST nodes are plain tuples; see evaluator.py for the node list.
"""

from __future__ import annotations

from typing import Any

from .errors import JQSyntaxError
from .lexer import Token, lex

AST = tuple


class Parser:
    def __init__(self, toks: list[Token]):
        self.toks = toks
        self.i = 0

    # --- token helpers -------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.value in ops

    def at_kw(self, kw: str) -> bool:
        return self.peek().kind == kw

    def expect_op(self, op: str) -> Token:
        t = self.next()
        if t.kind != "op" or t.value != op:
            raise JQSyntaxError(f"expected {op!r}, got {t.kind}:{t.value!r} at {t.pos}")
        return t

    def expect_kind(self, kind: str) -> Token:
        t = self.next()
        if t.kind != kind:
            raise JQSyntaxError(f"expected {kind}, got {t.kind}:{t.value!r} at {t.pos}")
        return t

    # --- entry ---------------------------------------------------------
    def parse_program(self) -> AST:
        node = self.parse_pipe()
        t = self.peek()
        if t.kind != "eof":
            raise JQSyntaxError(f"unexpected trailing {t.kind}:{t.value!r} at {t.pos}")
        return node

    # --- pipe level (also: def / label / as-bindings) ------------------
    def parse_pipe(self, no_comma: bool = False) -> AST:
        if self.at_kw("def"):
            return self.parse_funcdef(no_comma)
        if self.at_kw("label"):
            self.next()
            name = self.expect_kind("var").value
            self.expect_op("|")
            return ("label", name, self.parse_pipe(no_comma))
        if self.at_kw("import") or self.at_kw("include"):
            raise JQSyntaxError("module imports are not supported")
        lhs = self.parse_comma(no_comma)
        if self.at_kw("as"):
            self.next()
            patterns = [self.parse_pattern()]
            while self.at_op("?//"):
                self.next()
                patterns.append(self.parse_pattern())
            self.expect_op("|")
            body = self.parse_pipe(no_comma)
            return ("as", lhs, patterns, body)
        if self.at_op("|"):
            self.next()
            return ("pipe", lhs, self.parse_pipe(no_comma))
        return lhs

    def parse_funcdef(self, no_comma: bool = False) -> AST:
        self.expect_kind("def")
        name = self.expect_kind("ident").value
        params: list[str] = []
        if self.at_op("("):
            self.next()
            while True:
                t = self.next()
                if t.kind == "var":
                    params.append("$" + t.value)
                elif t.kind == "ident":
                    params.append(t.value)
                else:
                    raise JQSyntaxError(f"bad parameter at {t.pos}")
                if self.at_op(";"):
                    self.next()
                    continue
                break
            self.expect_op(")")
        self.expect_op(":")
        body = self.parse_pipe()
        self.expect_op(";")
        rest = self.parse_pipe(no_comma)
        return ("funcdef", name, params, body, rest)

    # --- comma ---------------------------------------------------------
    def parse_comma(self, no_comma: bool = False) -> AST:
        node = self.parse_alt()
        if no_comma:
            return node
        while self.at_op(","):
            self.next()
            node = ("comma", node, self.parse_alt())
        return node

    # --- // (right-assoc) ----------------------------------------------
    def parse_alt(self) -> AST:
        node = self.parse_assign()
        if self.at_op("//"):
            self.next()
            return ("alt", node, self.parse_alt())
        return node

    # --- assignment (non-assoc) ----------------------------------------
    _ASSIGN_OPS = ("=", "|=", "+=", "-=", "*=", "/=", "%=", "//=")

    def parse_assign(self) -> AST:
        node = self.parse_or()
        if self.at_op(*self._ASSIGN_OPS):
            op = self.next().value
            rhs = self.parse_or()
            return ("assign", op, node, rhs)
        return node

    # --- boolean -------------------------------------------------------
    def parse_or(self) -> AST:
        node = self.parse_and()
        while self.at_kw("or"):
            self.next()
            node = ("or", node, self.parse_and())
        return node

    def parse_and(self) -> AST:
        node = self.parse_cmp()
        while self.at_kw("and"):
            self.next()
            node = ("and", node, self.parse_cmp())
        return node

    # --- comparison (non-assoc) ----------------------------------------
    def parse_cmp(self) -> AST:
        node = self.parse_add()
        if self.at_op("==", "!=", "<", "<=", ">", ">="):
            op = self.next().value
            return ("binop", op, node, self.parse_add())
        return node

    # --- arithmetic ----------------------------------------------------
    def parse_add(self) -> AST:
        node = self.parse_mul()
        while self.at_op("+", "-"):
            op = self.next().value
            node = ("binop", op, node, self.parse_mul())
        return node

    def parse_mul(self) -> AST:
        node = self.parse_unary()
        while self.at_op("*", "/", "%"):
            op = self.next().value
            node = ("binop", op, node, self.parse_unary())
        return node

    def parse_unary(self) -> AST:
        if self.at_op("-"):
            self.next()
            return ("neg", self.parse_postfix())
        return self.parse_postfix()

    # --- postfix -------------------------------------------------------
    def parse_postfix(self) -> AST:
        node = self.parse_primary()
        while True:
            t = self.peek()
            if t.kind == "field":
                self.next()
                node = self._chain(node, ("field", t.value))
            elif t.kind == "fieldstr":
                self.next()
                node = ("index_on", node, self.string_node(t.value))
            elif t.kind == "op" and t.value == "[":
                # NOTE: index/slice expressions evaluate against the
                # *input* of the whole access chain (jq: `.a[.b]` reads
                # `.b` from the original input), hence index_on nodes
                # rather than pipes.
                self.next()
                if self.at_op("]"):
                    self.next()
                    node = ("iterate_on", node)
                elif self.at_op(":"):
                    self.next()
                    hi = self.parse_pipe()
                    self.expect_op("]")
                    node = ("slice_on", node, None, hi)
                else:
                    idx = self.parse_pipe()
                    if self.at_op(":"):
                        self.next()
                        if self.at_op("]"):
                            self.next()
                            node = ("slice_on", node, idx, None)
                        else:
                            hi = self.parse_pipe()
                            self.expect_op("]")
                            node = ("slice_on", node, idx, hi)
                    else:
                        self.expect_op("]")
                        node = ("index_on", node, idx)
            elif t.kind == "op" and t.value == "?":
                self.next()
                node = ("try", node, None)
            elif t.kind == "op" and t.value == ".":
                # e.g. `.a.b` already handled by field tokens; a bare
                # `.` after an expression is not valid jq
                break
            else:
                break
        return node

    @staticmethod
    def _chain(target: AST, access: AST) -> AST:
        """Apply an access to a target expression (``$x.foo`` etc.)."""
        if target == ("identity",):
            return access
        return ("pipe", target, access)

    # --- primary -------------------------------------------------------
    def parse_primary(self) -> AST:
        t = self.peek()
        if t.kind == "op":
            if t.value == ".":
                self.next()
                return ("identity",)
            if t.value == "..":
                self.next()
                return ("call", "recurse", [])
            if t.value == "(":
                self.next()
                node = self.parse_pipe()
                self.expect_op(")")
                return node
            if t.value == "[":
                self.next()
                if self.at_op("]"):
                    self.next()
                    return ("array", None)
                body = self.parse_pipe()
                self.expect_op("]")
                return ("array", body)
            if t.value == "{":
                self.next()
                return self.parse_object()
            raise JQSyntaxError(f"unexpected {t.value!r} at {t.pos}")
        if t.kind == "field":
            self.next()
            return ("field", t.value)
        if t.kind == "fieldstr":
            self.next()
            return ("index_on", ("identity",), self.string_node(t.value))
        if t.kind == "number":
            self.next()
            return ("literal", t.value)
        if t.kind == "literal":
            self.next()
            return ("literal", t.value)
        if t.kind == "string":
            self.next()
            return self.string_node(t.value)
        if t.kind == "format":
            self.next()
            if self.peek().kind == "string":
                s = self.next()
                return self.string_node(s.value, fmt=t.value)
            return ("format", t.value)
        if t.kind == "var":
            self.next()
            return ("var", t.value)
        if t.kind == "__loc__":
            self.next()
            return ("literal", {"file": "<stdin>", "line": 1})
        if t.kind == "if":
            return self.parse_if()
        if t.kind == "try":
            self.next()
            body = self.parse_postfix()
            if self.at_kw("catch"):
                self.next()
                return ("try", body, self.parse_postfix())
            return ("try", body, None)
        if t.kind == "reduce":
            self.next()
            src = self.parse_postfix()
            self.expect_kind("as")
            pat = self.parse_pattern()
            self.expect_op("(")
            init = self.parse_pipe()
            self.expect_op(";")
            update = self.parse_pipe()
            self.expect_op(")")
            return ("reduce", src, pat, init, update)
        if t.kind == "foreach":
            self.next()
            src = self.parse_postfix()
            self.expect_kind("as")
            pat = self.parse_pattern()
            self.expect_op("(")
            init = self.parse_pipe()
            self.expect_op(";")
            update = self.parse_pipe()
            extract = None
            if self.at_op(";"):
                self.next()
                extract = self.parse_pipe()
            self.expect_op(")")
            return ("foreach", src, pat, init, update, extract)
        if t.kind == "def":
            return self.parse_funcdef()
        if t.kind == "ident":
            self.next()
            name = t.value
            if name == "break" and self.peek().kind == "var":
                return ("break", self.next().value)
            args: list[AST] = []
            if self.at_op("("):
                self.next()
                args.append(self.parse_pipe())
                while self.at_op(";"):
                    self.next()
                    args.append(self.parse_pipe())
                self.expect_op(")")
            return ("call", name, args)
        raise JQSyntaxError(f"unexpected {t.kind}:{t.value!r} at {t.pos}")

    # --- if ------------------------------------------------------------
    def parse_if(self) -> AST:
        self.expect_kind("if")
        branches = []
        cond = self.parse_pipe()
        self.expect_kind("then")
        branches.append((cond, self.parse_pipe()))
        while self.at_kw("elif"):
            self.next()
            c = self.parse_pipe()
            self.expect_kind("then")
            branches.append((c, self.parse_pipe()))
        els = None
        if self.at_kw("else"):
            self.next()
            els = self.parse_pipe()
        self.expect_kind("end")
        return ("if", branches, els)

    # --- object construction -------------------------------------------
    def parse_object(self) -> AST:
        entries: list[tuple[AST, AST]] = []
        if self.at_op("}"):
            self.next()
            return ("object", entries)
        while True:
            entries.append(self.parse_object_entry())
            if self.at_op(","):
                self.next()
                continue
            break
        self.expect_op("}")
        return ("object", entries)

    def parse_object_entry(self) -> tuple[AST, AST]:
        t = self.next()
        if t.kind == "var":
            # {$x} shorthand
            return (("literal", t.value), ("var", t.value))
        if t.kind in ("ident",) or t.kind in (
            "if",
            "then",
            "elif",
            "else",
            "end",
            "as",
            "def",
            "reduce",
            "foreach",
            "try",
            "catch",
            "label",
            "and",
            "or",
        ):
            key: AST = ("literal", t.value)
            if self.at_op(":"):
                self.next()
                return (key, self.parse_objval())
            return (key, ("field", t.value))
        if t.kind == "literal" and isinstance(t.value, bool):
            key = ("literal", "true" if t.value else "false")
            if self.at_op(":"):
                self.next()
                return (key, self.parse_objval())
            return (key, ("field", key[1]))
        if t.kind == "literal" and t.value is None:
            key = ("literal", "null")
            if self.at_op(":"):
                self.next()
                return (key, self.parse_objval())
            return (key, ("field", "null"))
        if t.kind == "string":
            key = self.string_node(t.value)
            if self.at_op(":"):
                self.next()
                return (key, self.parse_objval())
            # {"a"} shorthand → {"a": .a}; only valid for literal keys
            if key[0] == "literal":
                return (key, ("field", key[1]))
            return (key, ("index_on", ("identity",), key))
        if t.kind == "format":
            # {@base64: ...} — format applied to the value? rare; treat
            # the format name as a literal key requiring a value
            self.expect_op(":")
            return (("literal", t.value), self.parse_objval())
        if t.kind == "op" and t.value == "(":
            key = self.parse_pipe()
            self.expect_op(")")
            self.expect_op(":")
            return (key, self.parse_objval())
        raise JQSyntaxError(f"bad object key {t.kind}:{t.value!r} at {t.pos}")

    def parse_objval(self) -> AST:
        # object values: pipes allowed, commas not
        return self.parse_pipe(no_comma=True)

    # --- destructuring patterns ----------------------------------------
    def parse_pattern(self) -> AST:
        t = self.peek()
        if t.kind == "var":
            self.next()
            return ("pvar", t.value)
        if t.kind == "op" and t.value == "[":
            self.next()
            pats = [self.parse_pattern()]
            while self.at_op(","):
                self.next()
                pats.append(self.parse_pattern())
            self.expect_op("]")
            return ("parray", pats)
        if t.kind == "op" and t.value == "{":
            self.next()
            entries: list[tuple[AST, AST]] = []
            while True:
                et = self.next()
                if et.kind == "var":
                    entries.append((("literal", et.value), ("pvar", et.value)))
                elif et.kind == "ident":
                    self.expect_op(":")
                    entries.append((("literal", et.value), self.parse_pattern()))
                elif et.kind == "string":
                    self.expect_op(":")
                    entries.append((self.string_node(et.value), self.parse_pattern()))
                elif et.kind == "op" and et.value == "(":
                    key = self.parse_pipe()
                    self.expect_op(")")
                    self.expect_op(":")
                    entries.append((key, self.parse_pattern()))
                else:
                    raise JQSyntaxError(f"bad pattern key at {et.pos}")
                if self.at_op(","):
                    self.next()
                    continue
                break
            self.expect_op("}")
            return ("pobject", entries)
        raise JQSyntaxError(f"bad pattern at {t.pos}")

    # --- strings --------------------------------------------------------
    def string_node(self, parts: list[Any], fmt: str | None = None) -> AST:
        """Build an AST for a (possibly interpolated) string literal."""
        if not parts:
            return ("literal", "")
        if len(parts) == 1 and isinstance(parts[0], str) and fmt is None:
            return ("literal", parts[0])
        compiled: list[Any] = []
        for p in parts:
            if isinstance(p, str):
                compiled.append(p)
            else:  # ("interp", src)
                compiled.append(parse(p[1]))
        return ("string", compiled, fmt)


def parse(src: str) -> AST:
    """Parse a jq program into an AST."""
    return Parser(lex(src)).parse_program()
