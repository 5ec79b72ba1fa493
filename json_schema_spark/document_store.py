"""URI → schema registry used during ``$ref`` expansion.

Semantics match the reference's DocumentStore
(lib/json_schema/document_store.rb:8-29): URIs are stored/looked up with a
trailing "#" chomped.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple


class DocumentStore:
    def __init__(self):
        self._schema_map: dict = {}

    def add_schema(self, schema) -> None:
        if schema.uri is None:
            raise ValueError("can't add nil URI")
        self._schema_map[_chomp_hash(schema.uri)] = schema

    def lookup_schema(self, uri: str):
        return self._schema_map.get(_chomp_hash(uri))

    def __iter__(self) -> Iterator[Tuple[str, object]]:
        return iter(self._schema_map.items())

    def __len__(self) -> int:
        return len(self._schema_map)


def _chomp_hash(uri: str) -> str:
    return uri[:-1] if uri.endswith("#") else uri
