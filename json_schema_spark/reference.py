"""``$ref`` values: a URI plus a JSON-pointer fragment.

Semantics match the reference's JsonReference::Reference
(lib/json_reference.rb:9-58): split on "#", normalize the pointer by
prepending "#" and stripping a single trailing "/", bare fragments without
"#" resolve as pointer-only.
"""

from __future__ import annotations

from typing import Any, Optional
from urllib.parse import urlparse

from . import pointer as json_pointer


class Reference:
    def __init__(self, ref: str):
        self.uri: Optional[str] = None
        if "#" in ref:
            uri, _, ptr = ref.partition("#")
            if uri:
                self.uri = uri
            self.pointer = ptr
        else:
            self.pointer = ref
        self.pointer = "#" + self.pointer
        if self.pointer.endswith("/") and len(self.pointer) > 1:
            self.pointer = self.pointer[:-1]

    def resolve_pointer(self, data: Any) -> Any:
        return json_pointer.evaluate(data, self.pointer)

    def __str__(self) -> str:
        return f"{self.uri}{self.pointer}" if self.uri else self.pointer

    def __repr__(self) -> str:
        return f"#<Reference {self}>"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Reference) and str(self) == str(other)

    def __lt__(self, other: "Reference") -> bool:
        return str(self) < str(other)

    def __hash__(self) -> int:
        return hash(str(self))

    @property
    def uri_parsed(self):
        return urlparse(self.uri) if self.uri else None
