"""``$ref`` expansion: turn a parsed schema into a (possibly cyclic) graph.

Reimplements the semantics of the reference's ReferenceExpander
(lib/json_schema/reference_expander.rb:8-362): pointer maps per URI
(including the "alternate tree" for custom ``id`` URIs), chained-reference
dereferencing with a cycle stack, URI routing (http only when pre-registered
in the store, absolute paths, bare pointers against the root), clone-set
rehydration after traversal, and a final unresolved-ref sweep. Runs entirely
on the driver.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urlparse

from . import pointer as json_pointer
from .document_store import DocumentStore
from .errors import AggregateError, SchemaError
from .reference import Reference
from .schema import Link, SchemaNode


def _is_absolute(uri: str) -> bool:
    return bool(urlparse(uri).scheme)


def _uri_host(uri: Optional[str]) -> Optional[str]:
    return urlparse(uri).netloc or None if uri else None


class ReferenceExpander:
    def __init__(self):
        self.errors: list = []
        self.store: Optional[DocumentStore] = None

    def expand(self, schema: SchemaNode, store: Optional[DocumentStore] = None) -> bool:
        self.errors = []
        self._local_store = DocumentStore()
        self._schema = schema
        self._schema_paths: dict = {}
        self.store = store or DocumentStore()

        # a bare `$ref` document short-circuits (reference_expander.rb:18-20)
        if schema.reference and not schema.expanded:
            return self._dereference(schema, [])

        for uri, store_schema in self.store:
            self._build_schema_paths(uri, store_schema)
        # the reference keys the root under to_s(nil) == ""
        self._build_schema_paths("", schema)

        self._traverse_schema(schema)

        refs = sorted(set(self._unresolved_refs(schema)), key=str)
        if refs:
            message = f"Couldn't resolve references: {', '.join(str(r) for r in refs)}."
            self.errors.append(SchemaError(schema, message, "unresolved_references"))
        return not self.errors

    def expand_bang(self, schema: SchemaNode, store: Optional[DocumentStore] = None) -> bool:
        if not self.expand(schema, store=store):
            raise AggregateError(self.errors)
        return True

    # ------------------------------------------------------------------

    def _add_reference(self, schema: SchemaNode) -> None:
        uri = schema.uri
        stored = self._lookup_reference(uri)
        if stored is not None and len(stored.pointer) < len(schema.pointer):
            return
        if _is_absolute(uri):
            self.store.add_schema(schema)
        else:
            self._local_store.add_schema(schema)

    def _build_schema_paths(self, uri: str, schema: SchemaNode) -> None:
        if schema.reference:
            return
        paths = self._schema_paths.setdefault(uri, {})
        paths[schema.pointer] = schema
        for sub in schema_children(schema):
            self._build_schema_paths(uri, sub)
        # alternate tree for the schema's own custom URI
        # (reference_expander.rb:77-84, "O(crazy)")
        if schema.uri != uri:
            fragment, parent = schema.fragment, schema.parent
            schema.fragment, schema.parent = "#", None
            self._build_schema_paths(schema.uri, schema)
            schema.fragment, schema.parent = fragment, parent

    def _dereference(self, ref_schema: SchemaNode, ref_stack: list, parent_ref=None) -> bool:
        ref = ref_schema.reference

        if not ref:
            # no reference but maybe referencing children (rb:91-106)
            for sub in schema_children(ref_schema):
                if not sub.reference:
                    continue
                if parent_ref is not None and ref_schema.uri == str(parent_ref.uri):
                    continue
                if not sub.reference.uri and parent_ref is not None:
                    sub.reference = Reference(f"{parent_ref.uri}{sub.reference.pointer}")
                self._dereference(sub, ref_stack)
            return True

        if ref in ref_stack:
            message = f"Reference loop detected: {', '.join(str(r) for r in sorted(ref_stack, key=str))}."
            self.errors.append(SchemaError(ref_schema, message, "loop_detected"))
            return False

        new_schema = self._resolve_reference(ref_schema)
        if new_schema is None:
            return False

        # chained references (rb:119-123)
        if new_schema.reference and not new_schema.expanded:
            if not self._dereference(new_schema, ref_stack + [ref]):
                return False

        # global (URI'd) references need nested refs expanded manually
        # (rb:128-166)
        if ref.uri:
            for sub in schema_children(new_schema):
                if ref_schema is sub:
                    continue
                if sub.reference:
                    if sub.expanded:
                        continue
                    if not sub.reference.uri:
                        sub.reference = Reference(f"{ref.uri}{sub.reference.pointer}")
                if sub.items is not None and sub.items.reference:
                    if not sub.expanded:
                        if not sub.items.reference.uri:
                            sub.items.reference = Reference(f"{ref.uri}{sub.items.reference.pointer}")
                self._dereference(sub, ref_stack, parent_ref=ref)

        # copy target into the ref node, preserving parent (rb:168-183)
        parent = ref_schema.parent
        ref_schema.copy_from(new_schema)
        ref_schema.parent = parent

        if ref_schema.original():
            for sub in schema_children(ref_schema):
                sub.parent = ref_schema

        return True

    def _lookup_pointer(self, uri, pointer: str):
        paths = self._schema_paths.setdefault(str(uri) if uri else "", {})
        return paths.get(pointer)

    def _lookup_reference(self, uri: str):
        if _is_absolute(uri):
            return self.store.lookup_schema(uri)
        return self._local_store.lookup_schema(uri)

    def _resolve_pointer(self, ref_schema: SchemaNode, resolved_schema: SchemaNode):
        ref = ref_schema.reference
        new_schema = self._lookup_pointer(ref.uri, ref.pointer)
        if new_schema is None:
            new_schema = _evaluate_pointer(resolved_schema, ref.pointer)
            if new_schema is None:
                message = f'Couldn\'t resolve pointer "{ref.pointer}".'
                self.errors.append(SchemaError(resolved_schema, message, "unresolved_pointer"))
                return None
            # aggressive cycle detection (rb:216-226, issue #50)
            if new_schema.reference is not None:
                new_new = self._lookup_pointer(ref.uri, new_schema.reference.pointer)
                if new_new is not None:
                    new_new.clones.add(ref_schema)
                else:
                    self._build_schema_paths(str(ref.uri) if ref.uri else "", resolved_schema)
            else:
                self._build_schema_paths(str(ref.uri) if ref.uri else "", resolved_schema)
        else:
            new_schema.clones.add(ref_schema)
        return new_schema

    def _resolve_reference(self, ref_schema: SchemaNode):
        ref = ref_schema.reference
        uri = ref.uri

        if uri and _uri_host(uri):
            scheme = urlparse(uri).scheme or "http"
            if self.store.lookup_schema(uri):
                return self._resolve_uri(ref_schema, uri)
            message = f"Reference resolution over {scheme} is not currently supported (URI: {uri})."
            self.errors.append(SchemaError(ref_schema, message, "scheme_not_supported"))
            return None
        if uri and uri.startswith("/"):
            return self._resolve_uri(ref_schema, uri)
        if uri:
            if ref_schema.uri:
                schema_uri = ref_schema.uri.rstrip("/")
                return self._resolve_uri(ref_schema, f"{schema_uri}/{uri}")
            return None
        return self._resolve_pointer(ref_schema, self._schema)

    def _resolve_uri(self, ref_schema: SchemaNode, uri: str):
        schema = self._lookup_reference(uri)
        if schema is not None:
            return self._resolve_pointer(ref_schema, schema)
        message = f"Couldn't resolve URI: {uri}."
        self.errors.append(SchemaError(ref_schema, message, "unresolved_pointer"))
        return None

    def _unresolved_refs(self, schema: SchemaNode) -> list:
        if not schema.original():
            return []
        out: list = []
        for sub in schema_children(schema):
            if not sub.expanded:
                out.append(sub.reference)
            else:
                out.extend(self._unresolved_refs(sub))
        return out

    def _traverse_schema(self, schema: SchemaNode) -> None:
        self._add_reference(schema)
        for sub in schema_children(schema):
            if sub.reference and not sub.expanded:
                self._dereference(sub, [])
            if not sub.reference:
                self._traverse_schema(sub)
        # rehydrate clones (rb:354-361)
        if schema.original():
            for clone in schema.clones:
                parent = clone.parent
                clone.copy_from(schema)
                clone.parent = parent


def schema_children(schema: SchemaNode):
    """Yield sub-schemas in the reference's traversal order
    (reference_expander.rb:284-324)."""
    for s in schema.all_of:
        if s is not None:
            yield s
    for s in schema.any_of:
        if s is not None:
            yield s
    for s in schema.one_of:
        if s is not None:
            yield s
    for s in schema.definitions.values():
        if s is not None:
            yield s
    for s in schema.pattern_properties.values():
        if s is not None:
            yield s
    if isinstance(schema.properties, dict):
        for s in schema.properties.values():
            if isinstance(s, SchemaNode):
                yield s
    if isinstance(schema.additional_properties, SchemaNode):
        yield schema.additional_properties
    if schema.not_ is not None and isinstance(schema.not_, SchemaNode):
        yield schema.not_
    if schema.tuple_items:
        for s in schema.tuple_items:
            if s is not None:
                yield s
    if schema.items is not None:
        yield schema.items
    for s in schema.dependencies.values():
        if isinstance(s, SchemaNode):
            yield s
    if schema.links:
        for l in schema.links:
            if isinstance(l, Link):
                if l.schema is not None:
                    yield l.schema
                if l.target_schema is not None:
                    yield l.target_schema


def _evaluate_pointer(schema: SchemaNode, pointer: str):
    """Evaluate a JSON pointer against a SchemaNode tree. The reference
    evaluates pointers directly against Schema objects by treating keyword
    names as hash keys (json_pointer/evaluator.rb works on Schema via #[]);
    we walk fragments instead."""
    path = pointer[1:] if pointer.startswith("#") else pointer
    if path == "":
        return schema
    if not path.startswith("/"):
        raise ValueError(f'Path must begin with a leading "/": {pointer}.')
    node = schema
    parts = [p.replace("~1", "/").replace("~0", "~") for p in path.split("/")[1:]]
    i = 0
    while i < len(parts) and node is not None:
        key = parts[i]
        if key == "definitions" and i + 1 < len(parts) and parts[i + 1] in node.definitions:
            node = node.definitions[parts[i + 1]]
            i += 2
        elif key == "properties" and i + 1 < len(parts) and isinstance(node.properties, dict) and parts[i + 1] in node.properties:
            node = node.properties[parts[i + 1]]
            i += 2
        elif key == "patternProperties" and i + 1 < len(parts) and parts[i + 1] in node.pattern_properties:
            node = node.pattern_properties[parts[i + 1]]
            i += 2
        elif key == "items":
            if node.tuple_items is not None and i + 1 < len(parts) and parts[i + 1].isdigit():
                node = node.tuple_items[int(parts[i + 1])]
                i += 2
            elif node.items is not None:
                node = node.items
                i += 1
            else:
                return None
        elif key == "additionalProperties" and isinstance(node.additional_properties, SchemaNode):
            node = node.additional_properties
            i += 1
        elif key == "additionalItems" and isinstance(node.additional_items, SchemaNode):
            node = node.additional_items
            i += 1
        elif key == "not":
            node = node.not_
            i += 1
        elif key in ("allOf", "anyOf", "oneOf") and i + 1 < len(parts) and parts[i + 1].isdigit():
            arr = {"allOf": node.all_of, "anyOf": node.any_of, "oneOf": node.one_of}[key]
            idx = int(parts[i + 1])
            node = arr[idx] if idx < len(arr) else None
            i += 2
        elif key == "dependencies" and i + 1 < len(parts) and parts[i + 1] in node.dependencies:
            dep = node.dependencies[parts[i + 1]]
            node = dep if isinstance(dep, SchemaNode) else None
            i += 2
        else:
            return None
    return node
