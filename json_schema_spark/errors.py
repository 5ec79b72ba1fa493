"""Error types for schema parsing and validation.

Semantics mirror the reference's error model (reference:
lib/json_schema/error.rb:1-85): ``SchemaError`` for schema-compile problems,
``ValidationError`` for data violations (with JSON-pointer ``path``,
``error_type`` symbol and optional ``sub_errors`` for combinators), plus the
Oxford-comma "a/an" list formatter used by type-error messages
(error.rb:61-84).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


class JsonSchemaError(RuntimeError):
    """Base class for all engine errors."""


class AggregateError(JsonSchemaError):
    """Raised by the ``parse!``/``validate!`` style APIs; wraps many errors.

    Reference: lib/json_schema/error.rb:5-15.
    """

    def __init__(self, errors: list["SchemaError"]):
        self.errors = errors
        super().__init__(self.__str__())

    def __str__(self) -> str:
        return " ".join(str(e) for e in self.errors)


@dataclass
class SchemaError:
    """A problem found while parsing/expanding a schema document.

    Reference: lib/json_schema/error.rb:17-37.
    """

    schema: Any  # SchemaNode | None
    message: str
    error_type: str

    def __str__(self) -> str:
        if self.schema is not None and self.schema.pointer:
            return f"{self.schema.pointer}: {self.message}"
        return self.message


@dataclass
class ValidationError(SchemaError):
    """A data violation. ``path`` is the list of JSON-pointer segments of the
    offending data location (joined with "/" for display).

    Reference: lib/json_schema/error.rb:39-59.
    """

    path: list = field(default_factory=list)
    data: Any = None
    sub_errors: Optional[list] = None

    @property
    def pointer(self) -> str:
        return "/".join(str(p) for p in self.path)

    def __str__(self) -> str:
        schema_pointer = self.schema.pointer if self.schema is not None else ""
        return f"{self.pointer}: failed schema {schema_pointer}: {self.message}"


def to_list(items: list) -> str:
    """Humanized "a foo, bar, or baz" list used in type-error messages.

    Byte-compatible with the reference's ErrorFormatter.to_list
    (error.rb:61-84): ", " connector, " or " for two, ", or " before the
    last, and an "a"/"an" prefix chosen by the first item's leading vowel.
    """
    n = len(items)
    if n == 1:
        joined = items[0]
    elif n == 2:
        joined = f"{items[0]} or {items[1]}"
    else:
        joined = f"{', '.join(items[:-1])}, or {items[-1]}"
    article = "an" if joined[:1] in ("a", "e", "i", "o", "u") else "a"
    return f"{article} {joined}"
