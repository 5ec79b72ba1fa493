from .columnar import ColumnarCompiler, Compiled, EMPTY_ERRORS, ERR_ARRAY_DDL
from .values import TypedValue, Value, VariantValue

__all__ = [
    "ColumnarCompiler",
    "Compiled",
    "EMPTY_ERRORS",
    "ERR_ARRAY_DDL",
    "TypedValue",
    "Value",
    "VariantValue",
]
