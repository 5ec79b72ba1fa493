"""First end-to-end slice: scaffold schema over a 1-row variant DataFrame."""

from tests.data_scaffold import data_sample, pointer, schema_sample
from tests.parity import run_case


def test_scaffold_valid_sample(spark):
    out = run_case(spark, schema_sample(), data_sample())
    assert out.valid, (out.messages, out.types)


def test_min_length_violation(spark):
    data = data_sample()
    data["name"] = "ab"
    out = run_case(spark, schema_sample(), data)
    assert not out.valid
    assert "At least 3 characters are required; only 2 were supplied." in out.messages
    assert "min_length_failed" in out.types
    assert "#/name" in out.paths


def test_pattern_violation(spark):
    data = data_sample()
    data["name"] = "ab cd"
    out = run_case(spark, schema_sample(), data)
    assert not out.valid
    assert "ab cd does not match /^[a-z][a-z0-9-]{3,30}$/." in out.messages
    assert "pattern_failed" in out.types


def test_required_violation(spark):
    out = run_case(spark, schema_sample(), {})
    assert not out.valid
    assert '"name" wasn\'t supplied.' in out.messages
    assert "required_failed" in out.types


def test_enum_violation(spark):
    data = data_sample()
    data["visibility"] = "personal"
    out = run_case(spark, schema_sample(), data)
    assert not out.valid
    assert 'personal is not a member of ["private", "public"].' in out.messages


def test_type_violation(spark):
    schema = schema_sample()
    data = data_sample()
    data["name"] = 4
    out = run_case(spark, schema, data)
    assert not out.valid
    assert "For 'properties/name', 4 is not a string." in out.messages
    assert "invalid_type" in out.types


def test_additional_properties_violation(spark):
    data = data_sample()
    data["foo"] = "bar"
    out = run_case(spark, schema_sample(), data)
    assert not out.valid
    assert '"foo" is not a permitted key.' in out.messages
    assert "invalid_keys" in out.types


def test_numeric_bounds(spark):
    data = data_sample()
    data["id"] = 0
    out = run_case(spark, schema_sample(), data)
    assert not out.valid
    assert "0 must be greater than 0." in out.messages
    assert "min_failed" in out.types


def test_multiple_of_float(spark):
    data = data_sample()
    data["cost"] = 0.005
    out = run_case(spark, schema_sample(), data)
    assert not out.valid
    assert "0.005 is not a multiple of 0.01." in out.messages
    assert "multiple_of_failed" in out.types
