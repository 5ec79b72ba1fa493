"""Module entry points (reference: test/json_schema_test.rb) and error
formatting (test/json_schema/error_test.rb)."""

import pytest

import json_schema_spark as jss
from json_schema_spark.errors import to_list
from tests.data_scaffold import schema_sample


def test_parse_happy():
    schema, errors = jss.parse(schema_sample())
    assert errors == []
    assert schema.title == "Example API"


def test_parse_error_returns_none():
    bad = schema_sample()
    bad["type"] = 4
    schema, errors = jss.parse(bad)
    assert schema is None
    assert errors


def test_parse_bang_raises():
    bad = schema_sample()
    bad["type"] = 4
    with pytest.raises(jss.AggregateError):
        jss.parse_bang(bad)


def test_configure():
    jss.configure(lambda c: c.register_format("x", lambda d: True))
    assert "x" in jss.configuration().custom_formats
    jss.configuration().reset()


def test_to_list_formatting():
    # error.rb:61-84: a/an + Oxford comma rules
    assert to_list(["string"]) == "a string"
    assert to_list(["object"]) == "an object"
    assert to_list(["string", "null"]) == "a string or null"
    assert to_list(["object", "null", "string"]) == "an object, null, or string"
    assert to_list(["integer", "string"]) == "an integer or string"


def test_schema_error_str():
    schema, _ = jss.parse(schema_sample())
    from json_schema_spark.errors import SchemaError

    err = SchemaError(schema.definitions["app"], "boom.", "invalid_type")
    assert str(err) == "#/definitions/app: boom."
    assert str(SchemaError(None, "boom.", "x")) == "boom."
