"""Tiny SQL-text codegen helpers.

The compiler emits Spark SQL expression *strings* rather than Column objects:
building a scaffold-sized constraint tree through the Column API costs ~10k
Py4J round-trips (~10s); one ``F.expr(text)`` parse on the JVM is
milliseconds. The strings also make compiled constraints printable,
hashable and serializable for the run manifest.
"""

from __future__ import annotations

from typing import Iterable


def sql_str(s: str) -> str:
    """A Spark SQL string literal (default parser: backslash escapes)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def iff(cond: str, then: str, otherwise: str) -> str:
    return f"(CASE WHEN {cond} THEN {then} ELSE {otherwise} END)"


def and_all(parts: Iterable[str]) -> str:
    parts = list(parts)
    if not parts:
        return "true"
    if len(parts) == 1:
        return parts[0]
    return "(" + " AND ".join(parts) + ")"


def or_all(parts: Iterable[str]) -> str:
    parts = list(parts)
    if not parts:
        return "false"
    if len(parts) == 1:
        return parts[0]
    return "(" + " OR ".join(parts) + ")"


def concat(*parts: str) -> str:
    if len(parts) == 1:
        return parts[0]
    return f"concat({', '.join(parts)})"


def fn(name: str, *args: str) -> str:
    return f"{name}({', '.join(args)})"
