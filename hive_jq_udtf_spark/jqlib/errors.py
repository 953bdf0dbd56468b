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


class JQBreak(Exception):
    """Internal control-flow for ``label $l | ... break $l``."""

    def __init__(self, name: str):
        self.name = name
        super().__init__(f"break ${name}")
