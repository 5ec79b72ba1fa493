"""Regression tests for the round-1 ADVICE findings:

1. typed-mode column pruning must keep the fields a schema-form dependency
   touches (engine.py needs_all);
2. variant enum deep-equality must be key-order-insensitive and normalize
   integral floats (values.py eq_literal);
3. typed-struct objects with additionalProperties-as-schema /
   patternProperties must validate per-field with preserved types
   (values.py static_object_entries) instead of crashing;
4. tuple items + additionalItems:false must skip positional subschema
   errors when the array is over-long (reference validator.rb early
   return);
5. minimum/maximum/multipleOf must use exact decimal arithmetic for
   integer operands beyond 2^53 (Ruby Integer semantics).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from json_schema_spark.engine import ValidationEngine
from tests.parity import run_case


# --- 1. dependencies-as-schema survives typed pruning ------------------------


def test_typed_pruning_keeps_dependency_targets(spark):
    schema = {
        "type": ["object"],
        "properties": {"a": {"type": ["integer"]}},
        "dependencies": {"a": {"required": ["b"]}},
    }
    df = spark.createDataFrame([(1, "x", "noise")], "a long, b string, c string")
    res = ValidationEngine(spark).validate_typed(df, schema)
    row = res.annotated.select("is_valid", "violations").collect()[0]
    assert row["is_valid"], [e["message"] for e in row["violations"]]

    # and the dependency still fires when the target is absent
    df2 = spark.createDataFrame([(1, None, "noise")], "a long, b string, c string")
    res2 = ValidationEngine(spark).validate_typed(df2, schema)
    row2 = res2.annotated.select("is_valid", "violations").collect()[0]
    assert not row2["is_valid"]
    assert row2["violations"][0]["error_type"] == "required_failed"


# --- 2. composite enum deep equality ------------------------------------------


def test_enum_composite_key_order_insensitive(spark):
    out = run_case(spark, {"enum": [{"b": 1, "a": 2}]}, {"b": 1, "a": 2},
                   definition=None)
    assert out.valid, out.messages
    out2 = run_case(spark, {"enum": [{"b": 1, "a": 2}]}, {"a": 2, "b": 1},
                    definition=None)
    assert out2.valid, out2.messages


def test_enum_composite_integral_float_normalized(spark):
    # Ruby: 4 == 4.0 → {"a" => 4.0} includes {"a" => 4}
    out = run_case(spark, {"enum": [{"a": 4.0}]}, {"a": 4}, definition=None)
    assert out.valid, out.messages


def test_enum_composite_nested_sorting(spark):
    lit = {"z": [1, {"y": 2.0, "x": 3}], "a": "s"}
    data = {"a": "s", "z": [1, {"x": 3, "y": 2}]}
    out = run_case(spark, {"enum": [lit]}, data, definition=None)
    assert out.valid, out.messages


def test_enum_composite_rejects_nonmember(spark):
    out = run_case(spark, {"enum": [{"a": 1}]}, {"a": 2}, definition=None)
    assert not out.valid


# --- 3. typed struct additionalProperties / patternProperties ------------------


def test_typed_struct_additional_properties_schema(spark):
    schema = {
        "type": ["object"],
        "properties": {"name": {"type": ["string"]}},
        "additionalProperties": {"type": ["string"], "minLength": 2},
    }
    df = spark.createDataFrame([("app", "ok"), ("app", "x")],
                               "name string, extra string")
    res = ValidationEngine(spark).validate_typed(df, schema)
    rows = res.annotated.select("is_valid", "violations").collect()
    assert rows[0]["is_valid"]
    assert not rows[1]["is_valid"]
    assert rows[1]["violations"][0]["error_type"] == "min_length_failed"
    assert rows[1]["violations"][0]["path"] == "#/extra"


def test_typed_struct_additional_properties_schema_wrong_type(spark):
    schema = {
        "type": ["object"],
        "properties": {"name": {"type": ["string"]}},
        "additionalProperties": {"type": ["string"]},
    }
    df = spark.createDataFrame([("app", 7)], "name string, extra long")
    res = ValidationEngine(spark).validate_typed(df, schema)
    row = res.annotated.select("is_valid", "violations").collect()[0]
    assert not row["is_valid"]
    assert row["violations"][0]["error_type"] == "invalid_type"


def test_typed_struct_pattern_properties(spark):
    schema = {
        "type": ["object"],
        "patternProperties": {"^meta_": {"type": ["integer"], "minimum": 0}},
    }
    df = spark.createDataFrame([(1, "t"), (-2, "t")], "meta_n long, other string")
    res = ValidationEngine(spark).validate_typed(df, schema)
    rows = res.annotated.select("is_valid", "violations").collect()
    assert rows[0]["is_valid"]
    assert not rows[1]["is_valid"]
    assert rows[1]["violations"][0]["error_type"] == "min_failed"
    assert rows[1]["violations"][0]["path"] == "#/meta_n"


# --- 4. tuple items early return on additionalItems:false ----------------------


def test_tuple_items_overflow_skips_positional_errors(spark):
    schema = {
        "items": [{"type": ["string"]}, {"type": ["integer"]}],
        "additionalItems": False,
    }
    # 3 items AND a positional violation (first element not a string):
    # reference emits ONLY the max_items error
    out = run_case(spark, schema, [1, 2, 3], definition=None)
    assert not out.valid
    assert out.types == ["max_items_failed"]
    assert out.messages == ["No more than 2 items are allowed; 3 were supplied."]


def test_tuple_items_positional_still_checked_at_exact_size(spark):
    schema = {
        "items": [{"type": ["string"]}, {"type": ["integer"]}],
        "additionalItems": False,
    }
    out = run_case(spark, schema, [1, 2], definition=None)
    assert not out.valid
    assert out.types == ["invalid_type"]


# --- 5. exact integer arithmetic past 2^53 -------------------------------------


def test_multiple_of_int64_exact(spark):
    # 9007199254740993 is odd but rounds to an even double
    out = run_case(spark, {"multipleOf": 2}, 9007199254740993, definition=None)
    assert not out.valid
    assert out.types == ["multiple_of_failed"]
    out2 = run_case(spark, {"multipleOf": 2}, 9007199254740992, definition=None)
    assert out2.valid, out2.messages


def test_maximum_int64_exact(spark):
    out = run_case(spark, {"maximum": 9007199254740992}, 9007199254740993,
                   definition=None)
    assert not out.valid
    assert out.types == ["max_failed"]


def test_minimum_int64_exact_typed(spark):
    schema = {"type": ["object"],
              "properties": {"n": {"minimum": 9007199254740993}}}
    df = spark.createDataFrame([(9007199254740992,), (9007199254740993,)],
                               "n long")
    res = ValidationEngine(spark).validate_typed(df, schema)
    rows = res.annotated.select("is_valid").collect()
    assert [r["is_valid"] for r in rows] == [False, True]


def test_multiple_of_float_semantics_unchanged(spark):
    # Ruby Float#%: 0.005 % 0.01 != 0 → invalid (validator_test.rb:424-432)
    out = run_case(spark, {"multipleOf": 0.01}, 0.005, definition=None)
    assert not out.valid
    out2 = run_case(spark, {"multipleOf": 0.5}, 4.5, definition=None)
    assert out2.valid, out2.messages


# --- r3 ADVICE: compile-cache invalidation on format registry mutation ------


def test_custom_formats_readonly_and_version_bump():
    """The natural in-place idiom configuration().custom_formats[n] = f
    must fail loudly (it would bypass the compile-cache version bump and
    serve stale compiled SQL); register_format is the mutation path and
    must bump the version even though it mutates the dict in place."""
    import pytest

    from json_schema_spark.config import configuration

    cfg = configuration()
    with pytest.raises(TypeError):
        cfg.custom_formats["sneaky"] = lambda s: True
    with pytest.raises(TypeError):
        cfg.custom_format_columns["sneaky"] = lambda c: c.isNotNull()

    before = cfg._version
    cfg.register_format("bump_check", lambda s: s == "ok")
    try:
        assert cfg._version > before
        assert "bump_check" in cfg.custom_formats
    finally:
        cfg.reset()
