"""Schema-document parsing: raw JSON dict → SchemaNode AST.

Reimplements the *semantics* of the reference parser
(lib/json_schema/parser.rb:28-385): per-keyword value-type validation with
accumulated SchemaErrors, URI scoping from ``id`` (parser.rb:51-75), ``$ref``
nodes kept as reference stubs (parser.rb:128-144), tuple vs list ``items``,
dependency normalization (String → [String]), link parsing, and format-name
validation. Runs once on the driver at compile time.
"""

from __future__ import annotations

from typing import Any, Optional
from urllib.parse import urlparse

from .config import configuration
from .errors import AggregateError, SchemaError
from .messages import ruby_inspect
from .reference import Reference
from .regex_translate import translate_regex
from .schema import ALLOWED_TYPES, Link, Media, SchemaNode

BOOLEAN = (bool,)
# value-class expectations per keyword; names match FRIENDLY_TYPES output
_FRIENDLY = {
    bool: "boolean",
    float: "number",
    dict: "object",
    int: "integer",
    type(None): "null",
    str: "string",
    list: "array",
}

DEFAULT_FORMATS = [
    "date", "date-time", "email", "hostname", "ipv4", "ipv6",
    "regex", "uri", "uri-reference", "uuid",
]


class Parser:
    def __init__(self):
        self.errors: list = []

    def parse(self, data: Any, parent: Optional[SchemaNode] = None) -> Optional[SchemaNode]:
        self.errors = []
        schema = self._parse_data(data, parent, "#")
        return schema if not self.errors else None

    def parse_bang(self, data: Any, parent: Optional[SchemaNode] = None) -> SchemaNode:
        schema = self.parse(data, parent)
        if schema is None:
            raise AggregateError(self.errors)
        return schema

    # ------------------------------------------------------------------

    def _parse_data(self, data: Any, parent, fragment: str) -> Optional[SchemaNode]:
        if not isinstance(data, dict):
            message = f"{ruby_inspect(data)} is not a valid schema."
            self.errors.append(SchemaError(parent, message, "schema_not_found"))
            return None
        if "$ref" in data and data["$ref"] is not None:
            schema = SchemaNode(fragment, parent)
            schema.reference = Reference(data["$ref"])
            schema.data = data
            return schema
        return self._parse_schema(data, parent, fragment)

    def _parse_schema(self, data: dict, parent, fragment: str) -> SchemaNode:
        s = SchemaNode(fragment, parent)
        s.data = data
        s.id = self._validate_type(s, (str,), "id")
        s.expanded = True
        s.uri = build_uri(s.id, parent.uri if parent else None)

        s.title = self._validate_type(s, (str,), "title")
        s.description = self._validate_type(s, (str,), "description")
        s.default = data.get("default")

        # validation: any
        s.all_of = self._validate_type(s, (list,), "allOf") or []
        s.any_of = self._validate_type(s, (list,), "anyOf") or []
        s.definitions = self._validate_type(s, (dict,), "definitions") or {}
        s.enum = self._validate_type(s, (list,), "enum")
        s.one_of = self._validate_type(s, (list,), "oneOf") or []
        s.not_ = self._validate_type(s, (dict,), "not")
        type_value = self._validate_type(s, (list, str), "type")
        s.type = [type_value] if isinstance(type_value, str) else type_value
        self._validate_known_type(s)

        # validation: array
        s.additional_items = self._validate_type(s, BOOLEAN + (dict,), "additionalItems")
        raw_items = self._validate_type(s, (list, dict), "items")
        s.max_items = self._validate_int(s, "maxItems")
        s.min_items = self._validate_int(s, "minItems")
        s.unique_items = self._validate_type(s, BOOLEAN, "uniqueItems")

        # validation: number/integer
        s.max = self._validate_number(s, "maximum")
        s.max_exclusive = self._validate_type(s, BOOLEAN, "exclusiveMaximum")
        s.min = self._validate_number(s, "minimum")
        s.min_exclusive = self._validate_type(s, BOOLEAN, "exclusiveMinimum")
        s.multiple_of = self._validate_number(s, "multipleOf")

        # validation: object
        s.additional_properties = self._validate_type(s, BOOLEAN + (dict,), "additionalProperties")
        s.dependencies = self._validate_type(s, (dict,), "dependencies") or {}
        s.max_properties = self._validate_int(s, "maxProperties")
        s.min_properties = self._validate_int(s, "minProperties")
        s.pattern_properties = self._validate_type(s, (dict,), "patternProperties") or {}
        s.properties = self._validate_type(s, (dict,), "properties") or {}
        s.required = self._validate_type(s, (list,), "required")
        s.strict_properties = self._validate_type(s, BOOLEAN, "strictProperties")

        # validation: string
        s.format = self._validate_type(s, (str,), "format")
        s.max_length = self._validate_int(s, "maxLength")
        s.min_length = self._validate_int(s, "minLength")
        s.pattern = self._validate_type(s, (str,), "pattern")
        if s.pattern is not None:
            self._check_regex(s, s.pattern)
        if s.format is not None:
            self._validate_format(s, s.format)

        # hyper-schema
        links = self._validate_type(s, (list,), "links")
        media = self._validate_type(s, (dict,), "media")
        s.path_start = self._validate_type(s, (str,), "pathStart")
        s.read_only = self._validate_type(s, BOOLEAN, "readOnly")

        # recurse
        if isinstance(s.additional_items, dict):
            s.additional_items = self._parse_data(s.additional_items, s, "additionalItems")
        if isinstance(s.additional_properties, dict):
            s.additional_properties = self._parse_data(s.additional_properties, s, "additionalProperties")
        s.all_of = [self._parse_data(x, s, f"allOf/{i}") for i, x in enumerate(s.all_of)]
        s.any_of = [self._parse_data(x, s, f"anyOf/{i}") for i, x in enumerate(s.any_of)]
        s.one_of = [self._parse_data(x, s, f"oneOf/{i}") for i, x in enumerate(s.one_of)]
        s.definitions = {
            k: self._parse_data(v, s, f"definitions/{k}") for k, v in s.definitions.items()
        }
        deps: dict = {}
        for k, v in s.dependencies.items():
            if isinstance(v, dict):
                deps[k] = self._parse_data(v, s, "dependencies")
            elif isinstance(v, str):
                deps[k] = [v]
            else:
                deps[k] = v
        s.dependencies = deps
        if raw_items is not None:
            if isinstance(raw_items, list):
                s.tuple_items = [
                    self._parse_data(x, s, f"items/{i}") for i, x in enumerate(raw_items)
                ]
            else:
                s.items = self._parse_data(raw_items, s, "items")
        if links:
            s.links = [self._parse_link(l, s, i) for i, l in enumerate(links)]
        if media:
            s.media = Media(binary_encoding=media.get("binaryEncoding"), type=media.get("type"))
        if s.not_ is not None:
            s.not_ = self._parse_data(s.not_, s, "not")
        if s.pattern_properties:
            pp = {}
            for k, v in s.pattern_properties.items():
                self._check_regex(s, k)
                pp[k] = self._parse_data(v, s, f"patternProperties/{k}")
            s.pattern_properties = pp
        if s.properties and isinstance(s.properties, dict):
            s.properties = {
                k: self._parse_data(v, s, f"properties/{k}") for k, v in s.properties.items()
            }
        return s

    def _parse_link(self, l: dict, parent: SchemaNode, i: int) -> Link:
        link = Link(f"links/{i}", parent)
        link.data = l
        link.expanded = True
        link.uri = None
        link.description = l.get("description")
        link.enc_type = l.get("encType")
        link.href = l.get("href")
        link.method = l.get("method", "").lower() or None if l.get("method") else None
        link.rel = l.get("rel")
        link.title = l.get("title")
        link.media_type = l.get("mediaType")
        if l.get("schema"):
            link.schema = self._parse_data(l["schema"], parent, f"links/{i}/schema")
        if l.get("targetSchema"):
            link.target_schema = self._parse_data(l["targetSchema"], parent, f"links/{i}/targetSchema")
        return link

    # ------------------------------------------------------------------

    def _check_regex(self, schema: SchemaNode, source: str) -> None:
        """Compile-check a pattern. Unlike the reference (which compiles to a
        Ruby Regexp at parser.rb:248-257), we validate that the pattern is
        translatable to the Java dialect `rlike` uses, and optionally run the
        ECMA-262 check when configured."""
        ok, msg = translate_regex(source, check_only=True)
        if not ok:
            message = f"{ruby_inspect(source)} is not an ECMA-262 regular expression."
            self.errors.append(SchemaError(schema, message, "regex_failed"))
        elif configuration().validate_regex_with == "ecma-re-validator":
            from .regex_translate import is_ecma262

            if not is_ecma262(source):
                message = f"{ruby_inspect(source)} is not an ECMA-262 regular expression."
                self.errors.append(SchemaError(schema, message, "regex_failed"))

    def _validate_known_type(self, schema: SchemaNode) -> None:
        if schema.type is not None:
            bad = [t for t in schema.type if t not in ALLOWED_TYPES]
            if bad:
                message = f"Unknown types: {', '.join(sorted(bad))}."
                self.errors.append(SchemaError(schema, message, "unknown_type"))

    def _validate_type(self, schema: SchemaNode, types: tuple, field: str):
        value = schema.data.get(field)
        if value is None:
            return None
        # Python bool is an int subclass; JSON booleans must not satisfy
        # integer/number keyword slots (Ruby classes are disjoint)
        ok = any(
            isinstance(value, t) and not (t in (int, float) and isinstance(value, bool))
            for t in types
        )
        if not ok:
            friendly = "/".join(sorted({_FRIENDLY.get(t, str(t)) for t in types}))
            message = f'{ruby_inspect(value)} is not a valid "{field}", must be a {friendly}.'
            self.errors.append(SchemaError(schema, message, "invalid_type"))
            return None
        return value

    def _validate_int(self, schema: SchemaNode, field: str) -> Optional[int]:
        return self._validate_type(schema, (int,), field)

    def _validate_number(self, schema: SchemaNode, field: str):
        return self._validate_type(schema, (float, int), field)

    def _validate_format(self, schema: SchemaNode, fmt: str) -> None:
        valid = DEFAULT_FORMATS + list(configuration().custom_formats.keys())
        if fmt not in valid:
            message = (
                f"{ruby_inspect(fmt)} is not a valid format, must be one of {', '.join(valid)}."
            )
            self.errors.append(SchemaError(schema, message, "unknown_format"))


def build_uri(id_value: Optional[str], parent_uri: Optional[str]) -> str:
    """URI scoping from ``id`` (parser.rb:51-75)."""
    if id_value:
        parsed = urlparse(id_value)
        # strip any fragment
        no_frag = id_value.split("#", 1)[0]
        if parsed.scheme or no_frag.startswith("/"):
            return no_frag.rstrip("/") if no_frag != "/" else "/"
        if parent_uri:
            return parent_uri.rstrip("/") + "/" + no_frag
        return "/"
    return parent_uri if parent_uri else "/"


def parse(data: Any) -> tuple:
    """Module-level convenience (json_schema.rb:16-26): returns (schema|None, errors)."""
    parser = Parser()
    schema = parser.parse(data)
    return schema, parser.errors


def parse_bang(data: Any) -> SchemaNode:
    return Parser().parse_bang(data)
