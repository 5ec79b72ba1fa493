"""Schema-parser tests (reference: test/json_schema/parser_test.rb)."""

import pytest

from json_schema_spark import configuration
from json_schema_spark.parser import Parser
from tests.data_scaffold import schema_sample


@pytest.fixture(autouse=True)
def reset_config():
    configuration().reset()
    yield
    configuration().reset()


def parse(sample):
    p = Parser()
    schema = p.parse(sample)
    return schema, p.errors


def messages(errors):
    return [e.message for e in errors]


def types(errors):
    return [e.error_type for e in errors]


def test_parses_scaffold():
    schema, errors = parse(schema_sample())
    assert errors == []
    assert schema.title == "Example API"
    assert schema.description == "An example API."
    assert schema.type == ["object"]
    assert schema.uri == "/"


def test_app_definition_attributes():
    schema, _ = parse(schema_sample())
    app = schema.definitions["app"]
    assert app.title == "App"
    assert app.id == "schemata/app"
    assert app.uri == "/schemata/app"
    assert app.pointer == "#/definitions/app"
    assert app.additional_properties is False
    assert app.max_properties == 10
    assert app.min_properties == 1
    assert app.required == ["name"]
    assert app.media.type == "application/json"
    assert app.path_start == "/"
    assert app.read_only is False

    name = app.definitions["name"]
    assert name.default == "hello-world"
    assert name.max_length == 30
    assert name.min_length == 3
    assert name.pattern == "^[a-z][a-z0-9-]{3,30}$"
    assert name.type == ["string"]
    assert name.pointer == "#/definitions/app/definitions/name"

    cost = app.definitions["cost"]
    assert cost.max == 1000.0
    assert cost.max_exclusive is True
    assert cost.min == 0.0
    assert cost.min_exclusive is False
    assert cost.multiple_of == 0.01

    flags = app.definitions["flags"]
    assert flags.max_items == 10
    assert flags.min_items == 1
    assert flags.unique_items is True
    assert flags.items is not None
    assert flags.items.pattern == "^[a-z][a-z\\-]*[a-z]$"

    visibility = app.definitions["visibility"]
    assert visibility.enum == ["private", "public"]

    contrived = app.definitions["contrived"]
    assert len(contrived.all_of) == 2
    assert len(contrived.any_of) == 2
    assert len(contrived.one_of) == 2
    assert contrived.not_ is not None
    assert contrived.all_of[0].pointer == "#/definitions/app/definitions/contrived/allOf/0"

    deps = app.dependencies
    assert deps["production"] == ["ssl"]  # simple dep normalized to array
    assert deps["ssl"].properties["cost"].min == 20.0


def test_ref_stub():
    schema, _ = parse(schema_sample())
    prop = schema.properties["app"]
    assert prop.reference is not None
    assert prop.reference.pointer == "#/definitions/app"
    assert prop.expanded is False


def test_links():
    schema, _ = parse(schema_sample())
    app = schema.definitions["app"]
    link = app.links[0]
    assert link.href == "/apps"
    assert link.method == "post"
    assert link.rel == "create"
    assert link.schema.properties["name"].reference is not None
    assert link.target_schema.reference is not None


def test_tuple_items():
    sample = schema_sample()
    sample["definitions"]["app"]["definitions"]["flags"]["items"] = [
        {"type": ["string"]},
        {"type": ["boolean"]},
    ]
    schema, errors = parse(sample)
    assert errors == []
    flags = schema.definitions["app"].definitions["flags"]
    assert flags.items is None
    assert len(flags.tuple_items) == 2


def test_errors_non_string_id():
    sample = schema_sample()
    sample["id"] = 4
    schema, errors = parse(sample)
    assert schema is None
    assert '4 is not a valid "id", must be a string.' in messages(errors)
    assert "invalid_type" in types(errors)


def test_errors_non_array_string_type():
    sample = schema_sample()
    sample["type"] = 4
    _, errors = parse(sample)
    assert '4 is not a valid "type", must be a array/string.' in messages(errors)


def test_errors_unknown_type():
    sample = schema_sample()
    sample["type"] = ["float", "double"]
    _, errors = parse(sample)
    assert "Unknown types: double, float." in messages(errors)
    assert "unknown_type" in types(errors)


def test_errors_unknown_format():
    sample = schema_sample()
    sample["format"] = "obscure-thing"
    _, errors = parse(sample)
    assert (
        '"obscure-thing" is not a valid format, must be one of date, date-time, '
        "email, hostname, ipv4, ipv6, regex, uri, uri-reference, uuid." in messages(errors)
    )
    assert "unknown_format" in types(errors)


def test_invalid_regex_passes_without_check():
    sample = schema_sample()
    sample["pattern"] = "\\Ameow"
    schema, errors = parse(sample)
    assert errors == []


def test_invalid_regex_fails_with_ecma_check():
    configuration().validate_regex_with = "ecma-re-validator"
    sample = schema_sample()
    sample["pattern"] = "\\Ameow"
    _, errors = parse(sample)
    assert '"\\\\Ameow" is not an ECMA-262 regular expression.' in messages(errors)
    assert "regex_failed" in types(errors)


def test_custom_format_registration():
    configuration().register_format("the-answer", lambda d: d == "42")
    sample = schema_sample()
    sample["format"] = "the-answer"
    schema, errors = parse(sample)
    assert errors == []


def test_bad_format_with_custom_formats():
    configuration().register_format("the-answer", lambda d: d == "42")
    sample = schema_sample()
    sample["format"] = "not-a-format"
    _, errors = parse(sample)
    assert (
        '"not-a-format" is not a valid format, must be one of date, date-time, '
        "email, hostname, ipv4, ipv6, regex, uri, uri-reference, uuid, the-answer."
        in messages(errors)
    )


def test_parse_bang_raises():
    from json_schema_spark import AggregateError

    sample = schema_sample()
    sample["id"] = 4
    with pytest.raises(AggregateError):
        Parser().parse_bang(sample)


def test_non_hash_schema_error():
    _, errors = parse(4)
    assert "4 is not a valid schema." in messages(errors)
    assert "schema_not_found" in types(errors)


def test_boolean_not_integer():
    sample = schema_sample()
    sample["maxLength"] = True
    _, errors = parse(sample)
    assert 'true is not a valid "maxLength", must be a integer.' in messages(errors)
