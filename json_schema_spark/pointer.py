"""RFC-6901 JSON Pointer evaluation over plain dict/list data or SchemaNodes.

Semantics match the reference's JsonPointer::Evaluator
(lib/json_pointer/evaluator.rb:12-78): optional leading "#", empty pointer
returns the document, "~1"→"/" then "~0"→"~" unescaping, array keys must be
digits, missing keys / nil data propagate None.
"""

from __future__ import annotations

from typing import Any


def evaluate(data: Any, original_path: str) -> Any:
    path = original_path
    if path[:1] == "#":
        path = path[1:]
    if path == "":
        return data
    if path[:1] != "/":
        raise ValueError(f'Path must begin with a leading "/": {original_path}.')
    # split keeping blank segments; drop the leading blank from the leading "/"
    parts = path.split("/")[1:]
    return _segment(data, parts)


def _segment(data: Any, parts: list) -> Any:
    if not parts:
        return data
    if data is None:
        # spec doesn't define this case; propagate None like the reference
        return None
    key = _transform_key(parts[0])
    rest = parts[1:]
    if isinstance(data, list):
        if not key.isdigit():
            raise ValueError(f'Key operating on an array must be a digit or "-": {key}.')
        idx = int(key)
        return _segment(data[idx] if idx < len(data) else None, rest)
    if isinstance(data, dict):
        return _segment(data.get(key), rest)
    # SchemaNode-style access: allow attribute containers exposing __getitem__
    try:
        return _segment(data[key], rest)
    except (KeyError, IndexError, TypeError):
        return None


def _transform_key(key: str) -> str:
    return key.replace("~1", "/").replace("~0", "~")
