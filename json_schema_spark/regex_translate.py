"""Regex dialect translation: schema patterns → Spark ``rlike`` (Java) regex.

The reference compiles schema patterns as Ruby regexes and matches
*unanchored* (validator.rb:470-480 uses ``=~``); Java's ``Matcher.find()``
under ``rlike`` is also unanchored, so no anchoring shim is needed. Two real
dialect gaps are handled at compile time (SURVEY.md §7.3):

- Ruby ``^``/``$`` are always line anchors; ECMA-262 (which draft-4
  mandates) anchors to input start/end. We keep the ECMA/Java default — no
  ``(?m)`` — because Spark's RLIKE mishandles ``(?m)^$`` on empty strings
  (observed: ``'' RLIKE '(?m)^$'`` is false) and the spec semantics are the
  defensible choice; verdicts differ from the Ruby reference only for data
  containing embedded newlines (documented deviation).
- POSIX classes and Ruby-only escapes are rewritten or rejected at compile
  time (the analog of the reference's opt-in ECMA check, parser.rb:248-257).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

_POSIX = {
    "[:alpha:]": r"\p{Alpha}",
    "[:digit:]": r"\p{Digit}",
    "[:alnum:]": r"\p{Alnum}",
    "[:upper:]": r"\p{Upper}",
    "[:lower:]": r"\p{Lower}",
    "[:space:]": r"\s",
    "[:punct:]": r"\p{Punct}",
    "[:xdigit:]": r"\p{XDigit}",
}

_RUBY_ONLY = {
    r"\h": "[0-9a-fA-F]",
    r"\H": "[^0-9a-fA-F]",
}


def translate_regex(source: str, check_only: bool = False) -> Tuple[bool, Optional[str]]:
    """Translate a schema pattern to a Java-dialect pattern for ``rlike``.

    Returns ``(ok, translated)``; ``ok`` is False when the pattern cannot be
    compiled at all. With ``check_only`` the translated value may be None.
    """
    out = source
    for posix, java in _POSIX.items():
        out = out.replace(posix, java)
    # \h / \H outside character classes — a plain replace is safe because the
    # expansions are themselves classes
    for rb, java in _RUBY_ONLY.items():
        out = out.replace(rb, java)
    try:
        re.compile(out)
    except re.error:
        return False, None
    if check_only:
        return True, None
    return True, out


def is_ecma262(source: str) -> bool:
    """Heuristic ECMA-262 validity check (reference analog: the optional
    ecma-re-validator hook, configuration.rb:5-9). Rejects Ruby/Java-only
    constructs and uncompilable patterns."""
    if re.search(r"\\[AzZhH]", source):
        return False
    if "[[:" in source:
        return False
    if re.search(r"[+*?}][+]", source):  # possessive quantifiers
        return False
    if re.search(r"\(\?<[=!]", source):
        # lookbehind only landed in ES2018; the ecma-re-validator gem
        # (ES5-era) rejects it
        return False
    try:
        re.compile(source)
    except re.error:
        return False
    return True
