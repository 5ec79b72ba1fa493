"""Driver-side oracle validator for randomized cross-checks.

A clean-room Python implementation of the reference's documented validation
semantics (validator.rb keyword dispatch; see SURVEY.md §2.1). Used ONLY as
a test oracle — the engine under test never executes per-row Python.
Returns (valid, [(error_type, path)]) — messages are pinned separately by
the byte-parity suite.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

from json_schema_spark.compile.formats import format_check_python
from json_schema_spark.regex_translate import translate_regex
from json_schema_spark.schema import SchemaNode


def ruby_eq(a: Any, b: Any) -> bool:
    """Ruby ==: numerics compare across int/float; bool is not a number."""
    if isinstance(a, bool) or isinstance(b, bool):
        return type(a) is type(b) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if type(a) is not type(b):
        return False
    if isinstance(a, list):
        return len(a) == len(b) and all(ruby_eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict):
        return a.keys() == b.keys() and all(ruby_eq(a[k], b[k]) for k in a)
    return a == b


def _json_type(data: Any) -> str:
    if data is None:
        return "null"
    if isinstance(data, bool):
        return "boolean"
    if isinstance(data, int):
        return "integer"
    if isinstance(data, float):
        return "number"
    if isinstance(data, str):
        return "string"
    if isinstance(data, list):
        return "array"
    return "object"


def _type_ok(t: str, data: Any) -> bool:
    jt = _json_type(data)
    if t == "any":
        return True
    if t == "number":
        return jt in ("integer", "number")
    return jt == t


def _search(pattern: str, s: str) -> bool:
    ok, java = translate_regex(pattern)
    if not ok:
        return True
    return re.search(java, s) is not None


class OracleValidator:
    def __init__(self, schema: SchemaNode):
        self.schema = schema

    def validate(self, data: Any) -> Tuple[bool, List[Tuple[str, str]]]:
        errors: List[Tuple[str, str]] = []
        self._node(self.schema, data, errors, ["#"], set())
        return (not errors, errors)

    # -- mirrors validate_data dispatch (validator.rb:82-133) ------------

    def _node(self, s: SchemaNode, data: Any, errors: list, path: list,
              seen: frozenset = frozenset()) -> bool:
        valid = True

        def add(error_type: str) -> None:
            nonlocal valid
            valid = False
            errors.append((error_type, "/".join(str(p) for p in path)))

        # any
        if s.all_of:
            child_ok = all(self._node(c, data, errors, path) for c in s.all_of)
            if not child_ok:
                add("all_of_failed")
        if s.any_of:
            if not any(self._node(c, data, [], path) for c in s.any_of):
                add("any_of_failed")
        if s.enum is not None:
            if not any(ruby_eq(data, e) for e in s.enum):
                add("invalid_type")
        if s.one_of:
            n = sum(1 for c in s.one_of if self._node(c, data, [], path))
            if n != 1:
                add("one_of_failed")
        if s.not_ is not None:
            if self._node(s.not_, data, [], path):
                add("not_failed")
        if s.type:
            if not any(_type_ok(t, data) for t in s.type):
                add("invalid_type")

        if isinstance(data, list):
            if s.tuple_items is not None:
                n = len(s.tuple_items)
                if len(data) < n:
                    add("min_items_failed")
                elif len(data) > n and s.additional_items is False:
                    add("max_items_failed")
                else:
                    if len(data) > n and isinstance(s.additional_items, SchemaNode):
                        for i in range(n, len(data)):
                            if not self._node(s.additional_items, data[i], errors, path + [i]):
                                valid = False
                    for i, sub in enumerate(s.tuple_items):
                        if i < len(data) and not self._node(sub, data[i], errors, path + [i]):
                            valid = False
            elif s.items is not None:
                for i, v in enumerate(data):
                    if not self._node(s.items, v, errors, path + [i]):
                        valid = False
            if s.max_items is not None and len(data) > s.max_items:
                add("max_items_failed")
            if s.min_items is not None and len(data) < s.min_items:
                add("min_items_failed")
            if s.unique_items:
                canon = [repr(x) for x in data]  # type-aware (1 vs 1.0 distinct)
                if len(set(canon)) != len(canon):
                    add("unique_items_failed")

        if isinstance(data, (int, float)) and not isinstance(data, bool):
            if s.max is not None:
                ok = data < s.max if s.max_exclusive else data <= s.max
                if not ok:
                    add("max_failed")
            if s.min is not None:
                ok = data > s.min if s.min_exclusive else data >= s.min
                if not ok:
                    add("min_failed")
            if s.multiple_of is not None:
                import math

                if math.fmod(data, s.multiple_of) != 0:
                    add("multiple_of_failed")

        if isinstance(data, dict):
            extra = [k for k in data if k not in (s.properties or {})]
            for pattern in (s.pattern_properties or {}):
                extra = [k for k in extra if not _search(pattern, k)]
            if isinstance(s.additional_properties, SchemaNode):
                for k in extra:
                    if not self._node(s.additional_properties, data[k], errors, path + [k]):
                        valid = False
            elif s.additional_properties is False and extra:
                add("invalid_keys")
            for key, dep in (s.dependencies or {}).items():
                if key not in data or not data[key]:
                    # reference uses truthiness: `next true unless data[key]`
                    continue
                if isinstance(dep, SchemaNode):
                    if not self._node(dep, data, errors, path):
                        valid = False
                elif isinstance(dep, list):
                    if any(d not in data for d in dep):
                        add("required_failed")
            if s.max_properties is not None and len(data) > s.max_properties:
                add("max_properties_failed")
            if s.min_properties is not None and len(data) < s.min_properties:
                add("min_properties_failed")
            for pattern, sub in (s.pattern_properties or {}).items():
                for k, v in data.items():
                    if _search(pattern, k):
                        if not self._node(sub, v, errors, path + [k]):
                            valid = False
            for key, sub in (s.properties or {}).items():
                if isinstance(sub, SchemaNode) and key in data:
                    if not self._node(sub, data[key], errors, path + [key]):
                        valid = False
            if s.required and any(k not in data for k in s.required):
                add("required_failed")
            if s.strict_properties:
                if extra:
                    add("invalid_keys")
                if any(k not in data for k in (s.properties or {})):
                    add("required_failed")

        if isinstance(data, str):
            if s.format is not None:
                ok = format_check_python(s.format, data)
                if ok is False:
                    add("invalid_format")
            if s.max_length is not None and len(data) > s.max_length:
                add("max_length_failed")
            if s.min_length is not None and len(data) < s.min_length:
                add("min_length_failed")
            if s.pattern is not None and not _search(s.pattern, data):
                add("pattern_failed")

        return valid
