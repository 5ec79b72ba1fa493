"""Engine configuration.

Mirrors the reference's Configuration (lib/json_schema/configuration.rb):
``all_of_sub_errors``, ``validate_regex_with`` and a custom-format registry.
In this engine a custom format registers BOTH a driver-side predicate
(``fn(str) -> bool``, used by the compiler's local oracle and tests) and an
optional Spark column builder (``col -> BooleanColumn``). When no column
builder is given, the engine wraps the predicate in an Arrow-vectorized
``pandas_udf(BooleanType)`` — batch transfer, never row-at-a-time Python UDFs
(reference analog: configuration.rb:11-13, used at validator.rb:218-221).

Engine-specific knobs:

- ``max_unroll_depth``: static unrolling bound for cyclic ``$ref`` graphs in
  the columnar compiler. The reference terminates on finite data depth
  (validator.rb:41-57 keeps loop detection disabled); a static expression
  compiler must bound recursion instead, so values nested deeper than this
  validate vacuously true at the cut point (documented deviation).
"""

from __future__ import annotations

from types import MappingProxyType
from typing import Callable, Mapping, Optional


class Configuration:
    """``_version`` increments on every attribute assignment (including
    reset/register_format): the engine's compiled-SQL cache keys on it so a
    config change can never serve stale compiled text.

    The format registries are exposed as READ-ONLY mapping views —
    ``register_format`` is the only mutation path. The natural-looking
    in-place idiom ``configuration().custom_formats[name] = pred`` would
    bypass the version bump and let the compile cache serve stale SQL
    referencing missing format UDFs (ADVICE r3); with the proxy it raises
    TypeError immediately instead of failing later and silently."""

    def __init__(self):
        object.__setattr__(self, "_version", 0)
        self.reset()

    def __setattr__(self, name, value):
        object.__setattr__(self, name, value)
        if name != "_version":
            object.__setattr__(self, "_version", self._version + 1)

    def reset(self) -> None:
        self.validate_regex_with: Optional[str] = None
        self._custom_formats: dict = {}
        self._custom_format_columns: dict = {}
        self.all_of_sub_errors: bool = False
        self.max_unroll_depth: int = 6
        # total dereferenced-$ref nodes allowed on one compile path: caps the
        # *combinatorial* blowup of cyclic schema graphs whose clones branch
        # into each other (e.g. the draft-4 meta-schema); values nested
        # beyond this many ref hops validate vacuously true
        self.max_ref_depth: int = 16

    @property
    def custom_formats(self) -> Mapping[str, Callable[[str], bool]]:
        return MappingProxyType(self._custom_formats)

    @property
    def custom_format_columns(self) -> Mapping[str, Callable]:
        return MappingProxyType(self._custom_format_columns)

    def register_format(
        self,
        name: str,
        predicate: Callable[[str], bool],
        column_builder: Optional[Callable] = None,
    ) -> None:
        self._custom_formats[name] = predicate
        if column_builder is not None:
            self._custom_format_columns[name] = column_builder
        # in-place dict writes don't pass through __setattr__ — bump
        # explicitly so the compiled-SQL cache invalidates
        object.__setattr__(self, "_version", self._version + 1)


_configuration = Configuration()


def configuration() -> Configuration:
    return _configuration
