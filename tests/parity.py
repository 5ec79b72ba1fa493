"""Parity harness: run the columnar engine on single documents and compare
valid/error outcomes with the expectations the reference's validator_test.rb
asserts (exact messages, error types, data pointers).

Each case validates a (possibly mutated) scaffold schema against one data
document loaded as a 1-row DataFrame with a VARIANT column — the same
engine path used for billion-row corpora.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, List, Optional

from pyspark.sql import SparkSession

from json_schema_spark.engine import ValidationEngine, compile_schema


@dataclass
class Outcome:
    valid: bool
    messages: List[str] = field(default_factory=list)
    types: List[str] = field(default_factory=list)
    paths: List[str] = field(default_factory=list)
    sub_errors: List[Optional[str]] = field(default_factory=list)
    data: List[Any] = field(default_factory=list)  # parsed data_json per error


def run_case(spark: SparkSession, schema_dict: dict, data: Any,
             max_unroll_depth: Optional[int] = None,
             definition: Optional[str] = "app",
             fail_fast: bool = False) -> Outcome:
    """Mirror of the reference harness (validator_test.rb:1063-1069): parse +
    expand the whole scaffold, then validate against definitions[definition]
    (or the root when definition is None)."""
    node = compile_schema(schema_dict)
    if definition is not None:
        node = node.definitions[definition]
    df = spark.createDataFrame([(json.dumps(data),)], "doc string")
    engine = ValidationEngine(spark, max_unroll_depth=max_unroll_depth)
    result = engine.validate_json(df, "doc", node, fail_fast=fail_fast)
    row = result.annotated.select("is_valid", "violations").collect()[0]
    errors = row["violations"] or []
    return Outcome(
        valid=bool(row["is_valid"]),
        messages=[e["message"] for e in errors],
        types=[e["error_type"] for e in errors],
        paths=[e["path"] for e in errors],
        sub_errors=[e["sub_errors"] for e in errors],
        data=[json.loads(e["data_json"]) if e["data_json"] is not None else None
              for e in errors],
    )
