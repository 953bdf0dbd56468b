"""Lexer for the jq language (jq-1.5 surface, as embedded by the
reference via jackson-jq 0.0.7 — SURVEY §2.2).

Produces a flat token list.  String literals lex into a list of parts
(literal str / raw interpolation source) so the parser can compile
``"\\(expr)"`` interpolations; the interpolation body is re-lexed by
the parser.
"""

from __future__ import annotations

from typing import Any, NamedTuple

from .errors import JQSyntaxError


class Token(NamedTuple):
    kind: str
    value: Any
    pos: int


KEYWORDS = {
    "def",
    "if",
    "then",
    "elif",
    "else",
    "end",
    "as",
    "reduce",
    "foreach",
    "try",
    "catch",
    "label",
    "and",
    "or",
    "import",
    "include",
    "__loc__",
}

# longest-first multi-char operators
_OPS3 = ("?//", "//=")
_OPS2 = ("==", "!=", "<=", ">=", "//", "|=", "+=", "-=", "*=", "/=", "%=", "..")
_OPS1 = "|,:;()[]{}+-*/%<>=?."

_IDENT_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_IDENT_CONT = _IDENT_START | set("0123456789")
_DIGITS = set("0123456789")

_ESCAPES = {
    '"': '"',
    "\\": "\\",
    "/": "/",
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
}


def _lex_string(src: str, i: int) -> tuple[list[Any], int]:
    """Lex a double-quoted string starting after the opening quote.

    Returns (parts, next_index); parts are str literals or
    ("interp", raw_source) tuples for ``\\(...)`` interpolations.
    """
    parts: list[Any] = []
    buf: list[str] = []
    n = len(src)
    while True:
        if i >= n:
            raise JQSyntaxError("unterminated string literal")
        c = src[i]
        if c == '"':
            if buf:
                parts.append("".join(buf))
            return parts, i + 1
        if c == "\\":
            if i + 1 >= n:
                raise JQSyntaxError("unterminated escape in string")
            e = src[i + 1]
            if e in _ESCAPES:
                buf.append(_ESCAPES[e])
                i += 2
            elif e == "u":
                if i + 6 > n:
                    raise JQSyntaxError("bad \\u escape")
                code = int(src[i + 2 : i + 6], 16)
                i += 6
                # surrogate pair handling
                if 0xD800 <= code <= 0xDBFF and src[i : i + 2] == "\\u":
                    low = int(src[i + 2 : i + 6], 16)
                    if 0xDC00 <= low <= 0xDFFF:
                        code = 0x10000 + ((code - 0xD800) << 10) + (low - 0xDC00)
                        i += 6
                buf.append(chr(code))
            elif e == "(":
                # interpolation: scan to the matching close paren
                if buf:
                    parts.append("".join(buf))
                    buf = []
                depth = 1
                j = i + 2
                while j < n and depth:
                    cj = src[j]
                    if cj == '"':
                        # skip nested string (with escapes)
                        j += 1
                        while j < n and src[j] != '"':
                            j += 2 if src[j] == "\\" else 1
                        if j >= n:
                            raise JQSyntaxError("unterminated string in interpolation")
                    elif cj == "(":
                        depth += 1
                    elif cj == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    j += 1
                if depth:
                    raise JQSyntaxError("unterminated interpolation")
                parts.append(("interp", src[i + 2 : j]))
                i = j + 1
            else:
                raise JQSyntaxError(f"invalid escape \\{e}")
        else:
            buf.append(c)
            i += 1


def lex(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":
            while i < n and src[i] != "\n":
                i += 1
            continue
        start = i
        three, two = src[i : i + 3], src[i : i + 2]
        if three in _OPS3:
            toks.append(Token("op", three, start))
            i += 3
            continue
        if two in _OPS2:
            toks.append(Token("op", two, start))
            i += 2
            continue
        if c == '"':
            parts, i = _lex_string(src, i + 1)
            toks.append(Token("string", parts, start))
            continue
        if c in _DIGITS or (c == "." and i + 1 < n and src[i + 1] in _DIGITS):
            j = i
            while j < n and src[j] in _DIGITS:
                j += 1
            isf = False
            if j < n and src[j] == "." and j + 1 < n and src[j + 1] in _DIGITS:
                isf = True
                j += 1
                while j < n and src[j] in _DIGITS:
                    j += 1
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k] in _DIGITS:
                    isf = True
                    j = k
                    while j < n and src[j] in _DIGITS:
                        j += 1
            text = src[i:j]
            toks.append(Token("number", float(text) if isf else int(text), start))
            i = j
            continue
        if c == ".":
            # .ident  |  ."quoted"  |  plain .
            if i + 1 < n and src[i + 1] in _IDENT_START:
                j = i + 1
                while j < n and src[j] in _IDENT_CONT:
                    j += 1
                toks.append(Token("field", src[i + 1 : j], start))
                i = j
                continue
            if i + 1 < n and src[i + 1] == '"':
                parts, i2 = _lex_string(src, i + 2)
                toks.append(Token("fieldstr", parts, start))
                i = i2
                continue
            toks.append(Token("op", ".", start))
            i += 1
            continue
        if c == "$":
            j = i + 1
            if j < n and src[j] in _IDENT_START:
                while j < n and src[j] in _IDENT_CONT:
                    j += 1
                toks.append(Token("var", src[i + 1 : j], start))
                i = j
                continue
            raise JQSyntaxError(f"bad variable at {i}")
        if c == "@":
            j = i + 1
            while j < n and src[j] in _IDENT_CONT:
                j += 1
            toks.append(Token("format", src[i:j], start))
            i = j
            continue
        if c in _IDENT_START:
            j = i
            while j < n and src[j] in _IDENT_CONT:
                j += 1
            # allow namespaced idents like a::b (module syntax) — rare; skip
            word = src[i:j]
            if word in KEYWORDS:
                toks.append(Token(word, word, start))
            elif word == "true":
                toks.append(Token("literal", True, start))
            elif word == "false":
                toks.append(Token("literal", False, start))
            elif word == "null":
                toks.append(Token("literal", None, start))
            else:
                toks.append(Token("ident", word, start))
            i = j
            continue
        if c in _OPS1:
            toks.append(Token("op", c, start))
            i += 1
            continue
        raise JQSyntaxError(f"unexpected character {c!r} at {i}")
    toks.append(Token("eof", None, n))
    return toks
