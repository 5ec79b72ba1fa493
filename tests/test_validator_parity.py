"""Full port of the reference validator suite.

Each case mirrors one ``it`` block of
/root/reference/test/json_schema/validator_test.rb (cited per test): mutate
the scaffold schema via JSON pointer, set a data field, validate the
``app`` definition over a 1-row variant DataFrame, assert validity plus
byte-exact messages / error types / data pointers.

The reference's ``error_data`` (the raw offending datum, error.rb:39-59) is
carried as the ``data_json`` violation column; its dedicated assertions
live in tests/test_error_data.py.
"""

from __future__ import annotations

import json

import pytest

from json_schema_spark import configuration
from tests.data_scaffold import data_sample, pointer, schema_sample
from tests.parity import run_case


@pytest.fixture(autouse=True)
def reset_config():
    configuration().reset()
    yield
    configuration().reset()


def case(spark, mutations=None, data_overrides=None, data=None, definition="app"):
    """mutations: list of (pointer, dict-to-merge); data_overrides: dict of
    top-level data fields; data: replace the whole data sample."""
    schema = schema_sample()
    for path, merge in (mutations or []):
        pointer(schema, path).update(merge)
    if data is None:
        data = data_sample()
        data.update(data_overrides or {})
    return run_case(spark, schema, data, definition=definition)


def branches(sub_errors_json):
    """Parse a combinator's sub_errors JSON into per-branch message lists."""
    parsed = json.loads(sub_errors_json)
    return [[e["message"] for e in branch] for branch in parsed]


def branch_types(sub_errors_json):
    parsed = json.loads(sub_errors_json)
    return [[e["error_type"] for e in branch] for branch in parsed]


# --- base -------------------------------------------------------------------


def test_finds_data_valid(spark):  # validator_test.rb:10
    out = case(spark)
    assert out.valid, out.messages


# --- enum -------------------------------------------------------------------


def test_enum_success(spark):  # :14
    out = case(spark,
               [("#/definitions/app/definitions/visibility", {"enum": ["private", "public"]})],
               {"visibility": "public"})
    assert out.valid


def test_enum_failure(spark):  # :22
    out = case(spark,
               [("#/definitions/app/definitions/visibility", {"enum": ["private", "public"]})],
               {"visibility": "personal"})
    assert not out.valid
    assert 'personal is not a member of ["private", "public"].' in out.messages
    assert "invalid_type" in out.types


# --- type -------------------------------------------------------------------


def test_type_success(spark):  # :33
    out = case(spark, [("#/definitions/app", {"type": ["object"]})],
               data={"name": "cloudnasium"})
    assert out.valid


def test_type_failure(spark):  # :51
    out = case(spark, [("#/definitions/app", {"type": ["object"]})], data=4)
    assert not out.valid
    assert "For 'definitions/app', 4 is not an object." in out.messages
    assert "invalid_type" in out.types


@pytest.mark.parametrize(
    "types,expected",
    [
        (["string"], "For 'definitions/app', 4 is not a string."),
        (["string", "null"], "For 'definitions/app', 4 is not a string or null."),
        (["object", "null", "string"],
         "For 'definitions/app', 4 is not an object, null, or string."),
    ],
)
def test_type_error_list_messages(spark, types, expected):  # :62-86
    out = case(spark, [("#/definitions/app", {"type": types})], data=4)
    assert not out.valid
    assert expected in out.messages


# --- items ------------------------------------------------------------------


def test_items_list_success(spark):  # :88
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"items": {"pattern": "^[a-z][a-z\\-]*[a-z]$"}})],
               {"flags": ["websockets"]})
    assert out.valid


def test_items_list_failure(spark):  # :97
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"items": {"pattern": "^[a-z][a-z\\-]*[a-z]$"}})],
               {"flags": ["1337"]})
    assert not out.valid
    assert "1337 does not match /^[a-z][a-z\\-]*[a-z]$/." in out.messages
    assert "pattern_failed" in out.types
    assert "#/flags/0" in out.paths


TUPLE_ITEMS = {"items": [{"enum": ["bamboo", "cedar"]}, {"enum": ["http", "https"]}]}


def test_tuple_items_success(spark):  # :110
    out = case(spark, [("#/definitions/app/definitions/flags", dict(TUPLE_ITEMS))],
               {"flags": ["cedar", "https"]})
    assert out.valid, out.messages


def test_tuple_additional_items_true(spark):  # :121
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": True, **TUPLE_ITEMS})],
               {"flags": ["cedar", "https", "websockets"]})
    assert out.valid


def test_tuple_additional_items_false(spark):  # :133
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": False, **TUPLE_ITEMS})],
               {"flags": ["cedar", "https", "websockets"]})
    assert not out.valid
    assert "No more than 2 items are allowed; 3 were supplied." in out.messages
    assert "max_items_failed" in out.types


def test_tuple_additional_items_schema_success(spark):  # :148
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": {"enum": ["foo", "websockets"]}, **TUPLE_ITEMS})],
               {"flags": ["cedar", "https", "websockets"]})
    assert out.valid, out.messages


def test_tuple_additional_items_schema_failure(spark):  # :160
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": {"enum": ["foo", "bar"]}, **TUPLE_ITEMS})],
               {"flags": ["cedar", "https", "websockets"]})
    assert not out.valid
    assert 'websockets is not a member of ["foo", "bar"].' in out.messages
    assert "invalid_type" in out.types


def test_tuple_additional_items_schema_multiple_failures(spark):  # :176
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": {"enum": ["foo", "bar"]}, **TUPLE_ITEMS})],
               {"flags": ["cedar", "https", "websockets", "1337"]})
    assert not out.valid
    assert 'websockets is not a member of ["foo", "bar"].' in out.messages
    assert '1337 is not a member of ["foo", "bar"].' in out.messages


def test_tuple_additional_items_and_items_failures(spark):  # :195
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": {"enum": ["foo", "bar"]}, **TUPLE_ITEMS})],
               {"flags": ["cedar", "1337", "websockets"]})
    assert not out.valid
    assert 'websockets is not a member of ["foo", "bar"].' in out.messages
    assert '1337 is not a member of ["http", "https"].' in out.messages


def test_tuple_too_few_items(spark):  # :214
    out = case(spark, [("#/definitions/app/definitions/flags", dict(TUPLE_ITEMS))],
               {"flags": ["cedar"]})
    assert not out.valid
    assert "2 items required; only 1 was supplied." in out.messages
    assert "min_items_failed" in out.types


def test_tuple_too_many_items(spark):  # :228
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": False, **TUPLE_ITEMS})],
               {"flags": ["cedar", "https", "websockets"]})
    assert not out.valid
    assert "No more than 2 items are allowed; 3 were supplied." in out.messages
    assert "max_items_failed" in out.types


def test_tuple_non_conforming_items(spark):  # :244
    out = case(spark,
               [("#/definitions/app/definitions/flags",
                 {"additionalItems": False, **TUPLE_ITEMS})],
               {"flags": ["cedar", "1337"]})
    assert not out.valid
    assert '1337 is not a member of ["http", "https"].' in out.messages
    assert "invalid_type" in out.types


# --- max/min items, uniqueItems ----------------------------------------------


def test_max_items_success(spark):  # :265
    out = case(spark, [("#/definitions/app/definitions/flags", {"maxItems": 10})],
               {"flags": list(range(10))})
    assert out.valid


def test_max_items_failure(spark):  # :273
    out = case(spark, [("#/definitions/app/definitions/flags", {"maxItems": 10})],
               {"flags": list(range(11))})
    assert not out.valid
    assert "No more than 10 items are allowed; 11 were supplied." in out.messages
    assert "max_items_failed" in out.types


def test_min_items_success(spark):  # :285
    out = case(spark, [("#/definitions/app/definitions/flags", {"minItems": 1})],
               {"flags": ["websockets"]})
    assert out.valid


def test_min_items_failure(spark):  # :293
    out = case(spark, [("#/definitions/app/definitions/flags", {"minItems": 1})],
               {"flags": []})
    assert not out.valid
    assert "1 item required; only 0 were supplied." in out.messages
    assert "min_items_failed" in out.types


def test_unique_items_success(spark):  # :304
    out = case(spark, [("#/definitions/app/definitions/flags", {"uniqueItems": True})],
               {"flags": ["websockets"]})
    assert out.valid


def test_unique_items_failure(spark):  # :312
    out = case(spark, [("#/definitions/app/definitions/flags", {"uniqueItems": True})],
               {"flags": ["websockets", "websockets"]})
    assert not out.valid
    assert "Duplicate items are not allowed." in out.messages
    assert "unique_items_failed" in out.types


# --- numeric bounds -----------------------------------------------------------


def test_max_int_inclusive(spark):  # :323
    out = case(spark,
               [("#/definitions/app/definitions/id",
                 {"exclusiveMaximum": False, "maximum": 10})],
               {"id": 11})
    assert not out.valid
    assert "11 must be less than or equal to 10." in out.messages
    assert "max_failed" in out.types


def test_max_int_exclusive(spark):  # :334
    out = case(spark,
               [("#/definitions/app/definitions/id",
                 {"exclusiveMaximum": True, "maximum": 10})],
               {"id": 10})
    assert not out.valid
    assert "10 must be less than 10." in out.messages


def test_max_number_inclusive(spark):  # :345
    out = case(spark,
               [("#/definitions/app/definitions/cost",
                 {"exclusiveMaximum": False, "maximum": 10.0})],
               {"cost": 10.1})
    assert not out.valid
    assert "10.1 must be less than or equal to 10.0." in out.messages


def test_max_number_exclusive(spark):  # :356
    out = case(spark,
               [("#/definitions/app/definitions/cost",
                 {"exclusiveMaximum": True, "maximum": 10.0})],
               {"cost": 10.0})
    assert not out.valid
    assert "10.0 must be less than 10.0." in out.messages


def test_min_int_inclusive(spark):  # :367
    out = case(spark,
               [("#/definitions/app/definitions/id",
                 {"exclusiveMinimum": False, "minimum": 1})],
               {"id": 0})
    assert not out.valid
    assert "0 must be greater than or equal to 1." in out.messages
    assert "min_failed" in out.types


def test_min_int_exclusive(spark):  # :378
    out = case(spark,
               [("#/definitions/app/definitions/id",
                 {"exclusiveMinimum": True, "minimum": 1})],
               {"id": 1})
    assert not out.valid
    assert "1 must be greater than 1." in out.messages


def test_min_number_inclusive(spark):  # :388
    out = case(spark,
               [("#/definitions/app/definitions/cost",
                 {"exclusiveMinimum": False, "minimum": 0.0})],
               {"cost": -0.01})
    assert not out.valid
    assert "-0.01 must be greater than or equal to 0.0." in out.messages


def test_min_number_exclusive(spark):  # :400
    out = case(spark,
               [("#/definitions/app/definitions/cost",
                 {"exclusiveMinimum": True, "minimum": 0.0})],
               {"cost": 0.0})
    assert not out.valid
    assert "0.0 must be greater than 0.0." in out.messages


def test_multiple_of_integer(spark):  # :411
    out = case(spark, [("#/definitions/app/definitions/id", {"multipleOf": 2})],
               {"id": 1})
    assert not out.valid
    assert "1 is not a multiple of 2." in out.messages
    assert "multiple_of_failed" in out.types


def test_multiple_of_number(spark):  # :421 — Ruby float-mod semantics
    out = case(spark, [("#/definitions/app/definitions/cost", {"multipleOf": 0.01})],
               {"cost": 0.005})
    assert not out.valid
    assert "0.005 is not a multiple of 0.01." in out.messages


# --- object keywords -----------------------------------------------------------


def test_additional_properties_true(spark):  # :431
    out = case(spark, [("#/definitions/app", {"additionalProperties": True})],
               {"foo": "bar"})
    assert out.valid


def test_additional_properties_false(spark):  # :439
    out = case(spark,
               [("#/definitions/app",
                 {"additionalProperties": False,
                  "patternProperties": {"^matches": {}}})],
               {"foo": "bar", "matches_pattern": "yes!"})
    assert not out.valid
    assert '"foo" is not a permitted key.' in out.messages
    assert "invalid_keys" in out.types


def test_additional_properties_false_multiple(spark):  # :453
    out = case(spark,
               [("#/definitions/app",
                 {"additionalProperties": False,
                  "patternProperties": {"^matches": {}}})],
               {"foo": "bar", "baz": "blah", "matches_pattern": "yes!"})
    assert not out.valid
    assert '"baz", "foo" are not permitted keys.' in out.messages


def test_additional_properties_schema_success(spark):  # :468
    out = case(spark,
               [("#/definitions/app", {"additionalProperties": {"type": ["boolean"]}})],
               {"foo": True})
    assert out.valid, out.messages


def test_additional_properties_schema_failure(spark):  # :477
    out = case(spark,
               [("#/definitions/app",
                 {"additionalProperties": {"type": ["boolean"]},
                  "patternProperties": {"^matches": {}}})],
               {"foo": 4, "matches_pattern": "yes!"})
    assert not out.valid
    assert "For 'additionalProperties', 4 is not a boolean." in out.messages


def test_simple_dependencies(spark):  # :496
    out = case(spark, [("#/definitions/app/dependencies", {"production": "ssl"})],
               {"production": True})
    assert not out.valid
    assert '"ssl" wasn\'t supplied.' in out.messages


def test_schema_dependencies(spark):  # :506
    out = case(spark,
               [("#/definitions/app/dependencies",
                 {"ssl": {"properties": {"cost": {"minimum": 20.0}}}})],
               {"cost": 10.0, "ssl": True})
    assert not out.valid
    assert "10.0 must be greater than or equal to 20.0." in out.messages
    assert "min_failed" in out.types


def test_max_properties(spark):  # :523
    out = case(spark, [("#/definitions/app", {"maxProperties": 0})],
               data={"name": "cloudnasium"})
    assert not out.valid
    assert "No more than 0 properties are allowed; 1 was supplied." in out.messages
    assert "max_properties_failed" in out.types


def test_min_properties(spark):  # :534
    out = case(spark, [("#/definitions/app", {"minProperties": 2})],
               data={"name": "cloudnasium"})
    assert not out.valid
    assert "At least 2 properties are required; 1 was supplied." in out.messages
    assert "min_properties_failed" in out.types


def test_pattern_properties(spark):  # :545
    out = case(spark,
               [("#/definitions/app/definitions/config_vars",
                 {"patternProperties": {"^\\w+$": {"type": ["null", "string"]}}})],
               {"config_vars": {"": 123, "KEY": 456}})
    assert not out.valid
    assert "For 'definitions/config_vars', 456 is not a null or string." in out.messages
    assert "invalid_type" in out.types


def test_pattern_properties_missing_parent(spark):  # :563
    schema = {
        "$schema": "http://json-schema.org/draft-04/hyper-schema",
        "patternProperties": {"^S_": {"type": ["string"]}},
    }
    data = data_sample()
    data["S_0"] = 123
    out = run_case(spark, schema, data, definition=None)
    assert not out.valid
    assert "For 'patternProperties/^S_', 123 is not a string." in out.messages


def test_required(spark):  # :571
    out = case(spark, [("#/definitions/app/dependencies", {"required": ["name"]})],
               data={})
    assert not out.valid
    assert '"name" wasn\'t supplied.' in out.messages
    assert "required_failed" in out.types


def test_strict_properties_false(spark):  # :582
    out = case(spark, [("#/definitions/app", {"strictProperties": False})])
    assert out.valid


def test_strict_properties_true(spark):  # :589
    out = case(spark,
               [("#/definitions/app",
                 {"patternProperties": {"^matches": {}}, "strictProperties": True})],
               {"extra_key": "value", "matches_pattern": "yes!"})
    assert not out.valid
    missing = sorted(
        ["config_vars", "contrived", "cost", "flags", "id", "owner",
         "production", "ssl", "visibility"])
    expected = '"' + '", "'.join(missing) + '" weren\'t supplied.'
    assert expected in out.messages
    assert '"extra_key" is not a permitted key.' in out.messages
    assert "invalid_keys" in out.types


# --- combinators ---------------------------------------------------------------


ALL_OF = {"allOf": [{"maxLength": 30}, {"minLength": 3}]}


def test_all_of(spark):  # :605
    out = case(spark, [("#/definitions/app/definitions/contrived", dict(ALL_OF))],
               {"contrived": "ab"})
    assert not out.valid
    assert 'Not all subschemas of "allOf" matched.' in out.messages
    assert "all_of_failed" in out.types


def test_all_of_includes_failing_condition(spark):  # :618
    out = case(spark, [("#/definitions/app/definitions/contrived", dict(ALL_OF))],
               {"contrived": "ab"})
    assert not out.valid
    assert "At least 3 characters are required; only 2 were supplied." in out.messages


def test_all_of_sub_errors(spark):  # :631
    configuration().all_of_sub_errors = True
    out = case(spark,
               [("#/definitions/app/definitions/contrived",
                 {"allOf": [{"minLength": 5}, {"minLength": 3}]})],
               {"contrived": "ab"})
    assert not out.valid
    assert 'Not all subschemas of "allOf" matched.' in out.messages
    idx = out.types.index("all_of_failed")
    msgs = branches(out.sub_errors[idx])
    assert ["At least 3 characters are required; only 2 were supplied."] in msgs
    assert ["At least 5 characters are required; only 2 were supplied."] in msgs
    assert branch_types(out.sub_errors[idx]) == [["min_length_failed"], ["min_length_failed"]]


def test_any_of(spark):  # :654
    out = case(spark,
               [("#/definitions/app/definitions/contrived",
                 {"anyOf": [{"minLength": 5}, {"minLength": 3}]})],
               {"contrived": "ab"})
    assert not out.valid
    assert 'No subschema in "anyOf" matched.' in out.messages
    assert "any_of_failed" in out.types
    idx = out.types.index("any_of_failed")
    msgs = branches(out.sub_errors[idx])
    assert ["At least 5 characters are required; only 2 were supplied."] in msgs
    assert ["At least 3 characters are required; only 2 were supplied."] in msgs
    assert branch_types(out.sub_errors[idx]) == [["min_length_failed"], ["min_length_failed"]]


def test_one_of(spark):  # :673
    out = case(spark,
               [("#/definitions/app/definitions/contrived",
                 {"oneOf": [{"pattern": "^(foo|aaa)$"},
                            {"pattern": "^(foo|zzz)$"},
                            {"pattern": "^(hell|no)$"}]})],
               {"contrived": "foo"})
    assert not out.valid
    assert 'More than one subschema in "oneOf" matched.' in out.messages
    assert "one_of_failed" in out.types
    idx = out.types.index("one_of_failed")
    assert branches(out.sub_errors[idx]) == [[], [], ["foo does not match /^(hell|no)$/."]]
    assert branch_types(out.sub_errors[idx]) == [[], [], ["pattern_failed"]]


def test_not(spark):  # :692
    out = case(spark,
               [("#/definitions/app/definitions/contrived", {"not": {"pattern": "^$"}})],
               {"contrived": ""})
    assert not out.valid
    assert 'Matched "not" subschema.' in out.messages
    assert "not_failed" in out.types


# --- formats ---------------------------------------------------------------------


def fmt_case(spark, fmt, value):
    return case(spark, [("#/definitions/app/definitions/owner", {"format": fmt})],
                {"owner": value})


@pytest.mark.parametrize(
    "fmt,value",
    [
        ("date", "2014-05-13"),
        ("date-time", "2014-05-13T08:42:40Z"),
        ("date-time", "2014-05-13T08:42:40-00:00"),
        ("date-time", "2014-05-13T08:42:40.444Z"),
        ("email", "dwarf@example.com"),
        ("email", "dwarf@example.technology"),
        ("hostname", "example.com"),
        ("ipv4", "1.2.3.4"),
        ("ipv6", "1::3:4:5:6:7:8"),
        ("regex", "^owner@heroku\\.com$"),
        ("uri", "https://example.com"),
        ("uri", "schemata/app"),
        ("uri", "#hello"),
        ("uri-reference", "https://example.com"),
        ("uuid", "01234567-89ab-cdef-0123-456789abcdef"),
    ],
)
def test_format_success(spark, fmt, value):  # :705-930
    out = fmt_case(spark, fmt, value)
    assert out.valid, out.messages


@pytest.mark.parametrize(
    "fmt,value",
    [
        ("date", "13/05/2014"),
        ("date", "2014-24-60"),
        ("date-time", "2014-05-13T08:42:40"),
        ("email", "@example.com"),
        ("hostname", "@example.com"),
        ("ipv4", "1.2.3.4.5"),
        ("ipv6", "1::3:4:5:6:7:8:9"),
        ("regex", "^owner($"),
        ("uri", "http://example.com[]"),
        ("uri-reference", "http://example.com[]"),
        ("uuid", "123"),
    ],
)
def test_format_failure(spark, fmt, value):  # :705-930
    out = fmt_case(spark, fmt, value)
    assert not out.valid
    assert f"{value} is not a valid {fmt}." in out.messages
    assert "invalid_format" in out.types


# --- string lengths / pattern ------------------------------------------------------


def test_max_length(spark):  # :932
    out = case(spark, [("#/definitions/app/definitions/name", {"maxLength": 3})],
               {"name": "abcd"})
    assert not out.valid
    assert "Only 3 characters are allowed; 4 were supplied." in out.messages
    assert "max_length_failed" in out.types


def test_min_length(spark):  # :942
    out = case(spark, [("#/definitions/app/definitions/name", {"minLength": 3})],
               {"name": "ab"})
    assert not out.valid
    assert "At least 3 characters are required; only 2 were supplied." in out.messages
    assert "min_length_failed" in out.types


def test_pattern(spark):  # :952
    out = case(spark,
               [("#/definitions/app/definitions/name",
                 {"pattern": "^[a-z][a-z0-9-]{3,30}$"})],
               {"name": "ab"})
    assert not out.valid
    assert "ab does not match /^[a-z][a-z0-9-]{3,30}$/." in out.messages
    assert "pattern_failed" in out.types


def test_error_pointer(spark):  # :963
    out = case(spark,
               [("#/definitions/app/definitions/visibility",
                 {"enum": ["private", "public"]})],
               {"visibility": "personal"})
    assert not out.valid
    assert out.paths[0] == "#/visibility"


# --- custom formats ---------------------------------------------------------------


def test_custom_format_success(spark):  # :983
    configuration().register_format(
        "the-answer", lambda d: d.isdigit() and int(d) == 42)
    out = fmt_case(spark, "the-answer", "42")
    assert out.valid, out.messages


def test_custom_format_failure(spark):  # :994
    configuration().register_format(
        "the-answer", lambda d: d.isdigit() and int(d) == 42)
    out = fmt_case(spark, "the-answer", "43")
    assert not out.valid
    assert "43 is not a valid the-answer." in out.messages
    assert "invalid_format" in out.types


def test_dependency_skipped_for_falsy_value(spark):
    """validator.rb:205 uses truthiness: production=false does not trigger
    the production->ssl dependency."""
    out = case(spark, [("#/definitions/app/dependencies", {"production": "ssl"})],
               {"production": False})
    assert out.valid, out.messages
