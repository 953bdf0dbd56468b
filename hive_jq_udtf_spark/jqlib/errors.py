"""Error types for the jq engine.

Mirrors the error model of the reference's embedded jq engine
(jackson-jq, see /root/reference SURVEY §1.1 D5/D8): a jq runtime
error carries an arbitrary JSON value (usually a string) and can be
caught by ``try``/``?``, or propagates to the host as a query abort
(reference: JsonQueryUDTF.java:100-102).
"""

from __future__ import annotations

from typing import Any


class JQSyntaxError(ValueError):
    """Raised at compile time for an invalid jq program.

    Reference analog: UDFArgumentException on bad program
    (JsonQueryUDTF.java:54-55).
    """


class JQError(Exception):
    """A jq runtime error carrying a JSON value payload (``error(v)``)."""

    def __init__(self, value: Any):
        self.value = value
        super().__init__(self._message())

    def _message(self) -> str:
        v = self.value
        if isinstance(v, str):
            return v
        from .values import tojson

        return tojson(v)


class JQHalt(Exception):
    """``halt`` / ``halt_error`` — terminates the whole jq program.

    Deliberately NOT a ``JQError`` subclass: real jq's halt family is
    not catchable by ``try``/``catch``/``?`` (it exits the process),
    so no jq-level handler may see it.  In an embedded engine the
    'process' is the host query — the UDTF layer converts this to a
    hard query abort carrying the exit code (the D8 channel), never
    the per-row ``$error`` channel.
    """

    def __init__(self, value: Any, code: int):
        self.value = value
        self.code = code
        if value is None:
            msg = f"halted with exit code {code}"
        elif isinstance(value, str):
            msg = value
        else:
            from .values import tojson

            msg = tojson(value)
        super().__init__(msg)


class JQBreak(Exception):
    """Internal control-flow for ``label $l | ... break $l``."""

    def __init__(self, name: str):
        self.name = name
        super().__init__(f"break ${name}")
