"""Format checks as Column builders.

The reference's ten built-in formats (validator.rb:569-604) map to JVM-side
``rlike`` checks with the same regex constants (translated to Java dialect):

- ``date`` additionally requires a real calendar date (Ruby ``Date.parse``,
  validator.rb:570) → ``try_to_date`` + round-trip equality.
- ``uri`` / ``uri-reference`` — the reference accepts anything
  ``URI.parse`` accepts, including relative references (validator.rb:577-585)
  → a strict RFC-3986 URI-reference regex, fully JVM-side.
- ``regex`` — "does this string compile as a regex" has no Catalyst
  predicate, so it's the one built-in that uses an Arrow-vectorized
  ``pandas_udf`` (allowed slow path; never row-at-a-time Python).

Custom formats (configuration().register_format, the analog of
configuration.rb:11-13) use their registered Column builder when given, else
wrap the Python predicate in a ``pandas_udf``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, functions as F, types as T

from ..config import configuration

# reference regex constants (validator.rb:590-604) in Java dialect;
# (?i) where the Ruby regex had /i (anchors stay ECMA-style, see
# regex_translate.py for the multiline rationale).
EMAIL_JAVA = r"(?i)^[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]+$"
HOSTNAME_JAVA = (
    r"^(?=.{1,255}$)[0-9A-Za-z](?:(?:[0-9A-Za-z]|-){0,61}[0-9A-Za-z])?"
    r"(?:\.[0-9A-Za-z](?:(?:[0-9A-Za-z]|-){0,61}[0-9A-Za-z])?)*\.?$"
)
DATE_JAVA = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
DATE_TIME_JAVA = (
    r"^[0-9]{4}-[0-9]{2}-[0-9]{2}T[0-2][0-9]:[0-5][0-9]:[0-5][0-9]"
    r"(\.[0-9]+)?(Z|[\-+][0-9]{2}:[0-5][0-9])$"
)
IPV4_JAVA = r"^((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])\.){3,3}(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])$"
IPV6_JAVA = (
    r"^(([0-9a-fA-F]{1,4}:){7,7}[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,7}:|"
    r"([0-9a-fA-F]{1,4}:){1,6}:[0-9a-fA-F]{1,4}|([0-9a-fA-F]{1,4}:){1,5}(:[0-9a-fA-F]{1,4}){1,2}|"
    r"([0-9a-fA-F]{1,4}:){1,4}(:[0-9a-fA-F]{1,4}){1,3}|([0-9a-fA-F]{1,4}:){1,3}(:[0-9a-fA-F]{1,4}){1,4}|"
    r"([0-9a-fA-F]{1,4}:){1,2}(:[0-9a-fA-F]{1,4}){1,5}|[0-9a-fA-F]{1,4}:((:[0-9a-fA-F]{1,4}){1,6})|"
    r":((:[0-9a-fA-F]{1,4}){1,7}|:)|fe80:(:[0-9a-fA-F]{0,4}){0,4}%[0-9a-zA-Z]{1,}|"
    r"::(ffff(:0{1,4}){0,1}:){0,1}((25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9]).){3,3}"
    r"(25[0-5]|(2[0-4]|1{0,1}[0-9]){0,1}[0-9])|([0-9a-fA-F]{1,4}:){1,4}:)$"
)
UUID_JAVA = r"^[a-f0-9]{8}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{4}-[a-f0-9]{12}$"

# strict RFC-3986 URI-reference (scheme optional → relative refs allowed),
# matching Ruby URI.parse acceptance on the reference's test corpus
_PCT = r"%[0-9A-Fa-f]{2}"
_UNRES_SUB = r"A-Za-z0-9\-._~!$&'()*+,;="
URI_REFERENCE_JAVA = (
    r"^(?:[A-Za-z][A-Za-z0-9+.\-]*:)?"
    r"(?://(?:(?:[" + _UNRES_SUB + r":]|" + _PCT + r")*@)?"
    r"(?:\[[0-9A-Fa-f:.]*\]|(?:[" + _UNRES_SUB + r"]|" + _PCT + r")*)(?::\d*)?)?"
    r"(?:[" + _UNRES_SUB + r":@/]|" + _PCT + r")*"
    r"(?:\?(?:[" + _UNRES_SUB + r":@/?]|" + _PCT + r")*)?"
    r"(?:#(?:[" + _UNRES_SUB + r":@/?]|" + _PCT + r")*)?$"
)


@F.pandas_udf(T.BooleanType())
def _regex_compiles(s):
    import re

    def check(x):
        if x is None:
            return None
        try:
            re.compile(x)
            return True
        except re.error:
            return False

    return s.map(check)


@F.pandas_udf(T.ArrayType(T.BooleanType()))
def _regex_compiles_arr(s):
    import re

    def check_one(x):
        if x is None:
            return None
        try:
            re.compile(x)
            return True
        except re.error:
            return False

    return s.map(lambda arr: None if arr is None
                 else [check_one(x) for x in arr])


def _wrap_predicate_udf(predicate):
    @F.pandas_udf(T.BooleanType())
    def fn(s):
        return s.map(lambda x: bool(predicate(x)) if x is not None else None)

    return fn


def _wrap_predicate_udf_arr(predicate):
    """Array-in/array-out variant: applied to a whole transformed array
    OUTSIDE a higher-order lambda (Python UDFs can't run inside one), the
    per-element results are then indexed back in via element_at."""
    @F.pandas_udf(T.ArrayType(T.BooleanType()))
    def fn(s):
        return s.map(lambda arr: None if arr is None
                     else [bool(predicate(x)) if x is not None else None
                           for x in arr])

    return fn


# Deepest lambda nesting the compiler will hoist a format UDF across: the
# hoisted column is a depth-N nested array (one transform per lambda level)
# fed to the matching _arrN UDF and indexed back with chained element_at —
# no offset arithmetic, so the depth is bounded only by how many UDF
# variants are registered. 6 levels of items-under-items is far past any
# real schema; beyond it the check is vacuously true (documented).
MAX_LAMBDA_HOIST_DEPTH = 6


def _nested_bool_type(depth: int):
    t: T.DataType = T.BooleanType()
    for _ in range(depth):
        t = T.ArrayType(t)
    return t


def _apply_nested(arr, depth, check_one):
    if arr is None:
        return None
    if depth == 0:
        return check_one(arr)
    return [_apply_nested(x, depth - 1, check_one) for x in arr]


def _regex_compiles_nested(depth: int):
    @F.pandas_udf(_nested_bool_type(depth))
    def fn(s):
        import re

        def check(x):
            if x is None:
                return None
            try:
                re.compile(x)
                return True
            except re.error:
                return False

        return s.map(lambda arr: _apply_nested(arr, depth, check))

    return fn


def _wrap_predicate_udf_nested(predicate, depth: int):
    @F.pandas_udf(_nested_bool_type(depth))
    def fn(s):
        def check(x):
            return bool(predicate(x)) if x is not None else None

        return s.map(lambda arr: _apply_nested(arr, depth, check))

    return fn


def udf_name_for_format(fmt: str) -> str:
    safe = "".join(c if c.isalnum() else "_" for c in fmt)
    return f"jss_fmt_{safe}"


def register_format_udfs(spark) -> None:
    """Register the Arrow-vectorized format UDFs so compiled SQL can call
    them by name. Idempotent; called by the engine before execution."""
    spark.udf.register("jss_regex_compiles", _regex_compiles)
    spark.udf.register("jss_regex_compiles_arr", _regex_compiles_arr)
    for d in range(2, MAX_LAMBDA_HOIST_DEPTH + 1):
        spark.udf.register(f"jss_regex_compiles_arr{d}", _regex_compiles_nested(d))
    for name, predicate in configuration().custom_formats.items():
        if name in configuration().custom_format_columns:
            continue
        spark.udf.register(udf_name_for_format(name), _wrap_predicate_udf(predicate))
        spark.udf.register(udf_name_for_format(name) + "_arr",
                           _wrap_predicate_udf_arr(predicate))
        for d in range(2, MAX_LAMBDA_HOIST_DEPTH + 1):
            spark.udf.register(udf_name_for_format(name) + f"_arr{d}",
                               _wrap_predicate_udf_nested(predicate, d))


_RLIKE_FORMATS = {
    "date-time": DATE_TIME_JAVA,
    "email": EMAIL_JAVA,
    "hostname": HOSTNAME_JAVA,
    "ipv4": IPV4_JAVA,
    "ipv6": IPV6_JAVA,
    "uuid": UUID_JAVA,
    "uri": URI_REFERENCE_JAVA,
    "uri-reference": URI_REFERENCE_JAVA,
}


def format_check_sql(fmt: str, string_expr: str, allow_udf: bool = True,
                     lambda_udf_cb=None) -> Optional[str]:
    """SQL boolean expression that is true when ``string_expr`` satisfies the
    named format, or None when the format is unknown (parser already errored).

    ``allow_udf=False`` applies inside higher-order-function lambdas, where
    Spark forbids Python UDFs. There the compiler passes ``lambda_udf_cb``:
    called with the UDF's base name, it pre-projects the check over the
    whole enclosing collection stack as a depth-N nested array column fed
    to the matching ``_arrN`` UDF (outside the lambdas) and returns the
    element_at-indexed replacement SQL — or None when the nesting exceeds
    MAX_LAMBDA_HOIST_DEPTH (vacuously true; documented gap no real schema
    reaches)."""
    from .sqlgen import sql_str

    def udf_or_fallback(udf_name: str) -> str:
        if allow_udf:
            return f"{udf_name}({string_expr})"
        if lambda_udf_cb is not None:
            replaced = lambda_udf_cb(udf_name)
            if replaced is not None:
                return replaced
        return "true"

    cfg = configuration()
    if fmt in cfg.custom_format_columns:
        return cfg.custom_format_columns[fmt](string_expr)
    if fmt in cfg.custom_formats:
        return udf_or_fallback(udf_name_for_format(fmt))

    if fmt == "date":
        # regex shape + real calendar date (Ruby Date.parse, validator.rb:570)
        return (f"(({string_expr} RLIKE {sql_str(DATE_JAVA)}) AND "
                f"try_to_date({string_expr}, 'yyyy-MM-dd') IS NOT NULL)")
    if fmt in _RLIKE_FORMATS:
        return f"({string_expr} RLIKE {sql_str(_RLIKE_FORMATS[fmt])})"
    if fmt == "regex":
        return udf_or_fallback("jss_regex_compiles")
    return None


# driver-side predicates for the local oracle / tests -------------------------

def format_check_python(fmt: str, data: str) -> Optional[bool]:
    import re

    cfg = configuration()
    if fmt in cfg.custom_formats:
        return bool(cfg.custom_formats[fmt](data))
    java_to_py = {
        "date": DATE_JAVA,
        "date-time": DATE_TIME_JAVA,
        "email": EMAIL_JAVA,
        "hostname": HOSTNAME_JAVA,
        "ipv4": IPV4_JAVA,
        "ipv6": IPV6_JAVA,
        "uuid": UUID_JAVA,
        "uri": URI_REFERENCE_JAVA,
        "uri-reference": URI_REFERENCE_JAVA,
    }
    if fmt == "regex":
        try:
            re.compile(data)
            return True
        except re.error:
            return False
    if fmt in java_to_py:
        pattern = java_to_py[fmt]
        flags = 0
        if pattern.startswith("(?i)"):
            pattern, flags = pattern[4:], re.I
        if re.search(pattern, data, flags) is None:
            return False
        if fmt == "date":
            import datetime

            try:
                datetime.date.fromisoformat(data)
            except ValueError:
                return False
        return True
    return None
