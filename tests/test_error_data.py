"""error_data parity (reference lib/json_schema/error.rb:39-59: every
ValidationError carries the offending datum) and fail_fast first-error
semantics (lib/json_schema/validator.rb:16-31: fail-fast still reports the
first error, not zero errors)."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_schema_spark.engine import ValidationEngine
from tests.parity import run_case


def test_error_data_scalar_type(spark):
    out = run_case(spark, {"type": ["string"]}, 5, definition=None)
    assert not out.valid
    assert out.data == [5]


def test_error_data_enum(spark):
    out = run_case(spark, {"enum": ["a", "b"]}, "z", definition=None)
    assert out.data == ["z"]


def test_error_data_required_is_whole_object(spark):
    out = run_case(spark, {"required": ["name"]}, {"other": 1}, definition=None)
    assert out.types == ["required_failed"]
    assert out.data == [{"other": 1}]


def test_error_data_array_element(spark):
    out = run_case(spark, {"items": {"type": ["integer"]}}, [1, "x"],
                   definition=None)
    assert out.paths == ["#/1"]
    assert out.data == ["x"]


def test_error_data_nested_property(spark):
    out = run_case(spark, {"properties": {"n": {"maximum": 10}}}, {"n": 11},
                   definition=None)
    assert out.paths == ["#/n"]
    assert out.data == [11]


def test_error_data_typed_mode(spark):
    schema = {"type": ["object"],
              "properties": {"n": {"maximum": 10}, "s": {"minLength": 3}}}
    df = spark.createDataFrame([(11, "ab")], "n long, s string")
    res = ValidationEngine(spark).validate_typed(df, schema)
    rows = {r["path"]: r["data_json"] for r in
            res.violations.select("path", "data_json").collect()}
    assert rows["#/n"] == "11"
    assert rows["#/s"] == '"ab"'


# --- fail_fast ----------------------------------------------------------------


def test_fail_fast_reports_exactly_first_error(spark):
    schema = {"required": ["name"],
              "properties": {"n": {"maximum": 10}},
              "allOf": [{"required": ["also"]}]}
    data = {"n": 11}
    full = run_case(spark, schema, data, definition=None)
    fast = run_case(spark, schema, data, definition=None, fail_fast=True)
    assert not full.valid and not fast.valid
    assert len(full.messages) >= 2
    assert len(fast.messages) == 1
    # the first error of the traversal, with its full payload
    assert fast.messages[0] == full.messages[0]
    assert fast.types[0] == full.types[0]
    assert fast.paths[0] == full.paths[0]


def test_fail_fast_valid_doc_unchanged(spark):
    out = run_case(spark, {"required": ["a"]}, {"a": 1}, definition=None,
                   fail_fast=True)
    assert out.valid
    assert out.messages == []
