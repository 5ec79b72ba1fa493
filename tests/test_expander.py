"""$ref-expansion tests (reference: test/json_schema/reference_expander_test.rb)."""

import pytest

from json_schema_spark.document_store import DocumentStore
from json_schema_spark.expander import ReferenceExpander
from json_schema_spark.parser import Parser
from tests.data_scaffold import schema_sample


def parse_and_expand(sample, store=None):
    schema = Parser().parse_bang(sample)
    expander = ReferenceExpander()
    ok = expander.expand(schema, store=store)
    return schema, ok, expander.errors


def test_expands_scaffold():
    schema, ok, errors = parse_and_expand(schema_sample())
    assert ok, [str(e) for e in errors]
    app_ref = schema.properties["app"]
    assert app_ref.expanded
    # dereferenced node carries the target's keywords
    assert app_ref.required == ["name"]
    name = app_ref.properties["name"]
    assert name.expanded
    assert name.max_length == 30
    # contrived_plus cross-pointer refs
    cp = schema.definitions["app"].definitions["contrived_plus"]
    assert cp.all_of[0].max_length == 30
    assert cp.all_of[1].min_length == 3
    assert cp.one_of[0].pattern == "^(foo|aaa)$"
    assert cp.not_.pattern == "^$"


def test_chained_references():
    sample = {
        "definitions": {
            "app0": {"$ref": "#/definitions/app1"},
            "app1": {"$ref": "#/definitions/app2"},
            "app2": {"type": ["object"]},
        },
        "properties": {"app": {"$ref": "#/definitions/app0"}},
    }
    schema, ok, errors = parse_and_expand(sample)
    assert ok, [str(e) for e in errors]
    assert schema.properties["app"].type == ["object"]


def test_self_reference_cycle():
    sample = {
        "additionalProperties": False,
        "properties": {"app": {"$ref": "#"}},
    }
    schema, ok, errors = parse_and_expand(sample)
    assert ok, [str(e) for e in errors]
    app = schema.properties["app"]
    assert app.expanded
    assert app.additional_properties is False
    # cyclic: the child's own properties/app points back into the graph
    assert app.properties["app"] is not None


def test_unresolvable_pointer():
    sample = {"properties": {"app": {"$ref": "#/definitions/nope"}}}
    schema, ok, errors = parse_and_expand(sample)
    assert not ok
    msgs = [e.message for e in errors]
    assert 'Couldn\'t resolve pointer "#/definitions/nope".' in msgs
    assert any(e.error_type == "unresolved_pointer" for e in errors)


def test_unsupported_scheme():
    sample = {"properties": {"app": {"$ref": "http://example.com#/definitions/app"}}}
    schema, ok, errors = parse_and_expand(sample)
    assert not ok
    assert any(e.error_type == "scheme_not_supported" for e in errors)
    assert any(
        "Reference resolution over http is not currently supported" in e.message
        for e in errors
    )


def test_reference_loop():
    sample = {
        "definitions": {
            "a": {"$ref": "#/definitions/b"},
            "b": {"$ref": "#/definitions/c"},
            "c": {"$ref": "#/definitions/a"},
        },
        "properties": {"app": {"$ref": "#/definitions/a"}},
    }
    schema, ok, errors = parse_and_expand(sample)
    assert not ok
    assert any(e.error_type == "loop_detected" for e in errors)
    assert any("Reference loop detected:" in e.message for e in errors)


def test_cross_document_reference():
    store = DocumentStore()
    external = Parser().parse_bang(
        {
            "id": "http://example.com/schema",
            "definitions": {"name": {"type": ["string"], "maxLength": 30}},
        }
    )
    store.add_schema(external)
    sample = {
        "properties": {
            "name": {"$ref": "http://example.com/schema#/definitions/name"},
        },
    }
    schema, ok, errors = parse_and_expand(sample, store=store)
    assert ok, [str(e) for e in errors]
    assert schema.properties["name"].max_length == 30


def test_nested_external_reference():
    store = DocumentStore()
    external = Parser().parse_bang(
        {
            "id": "http://example.com/schema",
            "definitions": {
                "inner": {"type": ["integer"]},
                "outer": {"properties": {"x": {"$ref": "#/definitions/inner"}}},
            },
        }
    )
    store.add_schema(external)
    sample = {
        "properties": {
            "thing": {"$ref": "http://example.com/schema#/definitions/outer"},
        },
    }
    schema, ok, errors = parse_and_expand(sample, store=store)
    assert ok, [str(e) for e in errors]
    assert schema.properties["thing"].properties["x"].type == ["integer"]


def test_expansion_in_all_child_positions():
    target = {"type": ["string"]}
    sample = {
        "definitions": {"t": target},
        "allOf": [{"$ref": "#/definitions/t"}],
        "anyOf": [{"$ref": "#/definitions/t"}],
        "oneOf": [{"$ref": "#/definitions/t"}],
        "not": {"$ref": "#/definitions/t"},
        "items": {"$ref": "#/definitions/t"},
        "additionalProperties": {"$ref": "#/definitions/t"},
        "patternProperties": {"^a": {"$ref": "#/definitions/t"}},
        "properties": {"p": {"$ref": "#/definitions/t"}},
        "dependencies": {"d": {"$ref": "#/definitions/t"}},
    }
    schema, ok, errors = parse_and_expand(sample)
    assert ok, [str(e) for e in errors]
    for node in [
        schema.all_of[0],
        schema.any_of[0],
        schema.one_of[0],
        schema.not_,
        schema.items,
        schema.additional_properties,
        schema.pattern_properties["^a"],
        schema.properties["p"],
        schema.dependencies["d"],
    ]:
        assert node.expanded
        assert node.type == ["string"]


def test_unexpanded_ref_error_lists_refs():
    sample = {"properties": {"app": {"$ref": "#/definitions/nope"}}}
    schema, ok, errors = parse_and_expand(sample)
    assert not ok
    assert any(e.error_type == "unresolved_references" for e in errors)


def test_root_ref_with_definitions_unresolvable_matches_reference():
    """A root document that is a $ref stub PLUS definitions: the reference
    parser keeps $ref nodes as stubs (parser.rb:128-144 — siblings,
    definitions included, are not parsed), so the short-circuit expansion
    (reference_expander.rb:18-20) pointer-evaluates against an empty
    definitions map and fails. Byte-matched error."""
    import pytest

    from json_schema_spark.engine import compile_schema
    from json_schema_spark.errors import AggregateError

    with pytest.raises(AggregateError) as exc:
        compile_schema({
            "definitions": {"node": {"type": ["object"]}},
            "$ref": "#/definitions/node",
        })
    assert 'Couldn\'t resolve pointer "#/definitions/node".' in str(exc.value)
