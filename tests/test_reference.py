"""$ref parsing tests (reference: test/json_reference/reference_test.rb)."""

from json_schema_spark.reference import Reference


def test_bare_pointer():
    r = Reference("/definitions/app")
    assert r.uri is None
    assert r.pointer == "#/definitions/app"


def test_hash_only():
    r = Reference("#")
    assert r.uri is None
    assert r.pointer == "#"


def test_uri_and_pointer():
    r = Reference("http://example.com#/definitions/app")
    assert r.uri == "http://example.com"
    assert r.pointer == "#/definitions/app"


def test_uri_no_pointer():
    r = Reference("http://example.com#")
    assert r.uri == "http://example.com"
    assert r.pointer == "#"


def test_trailing_slash_stripped():
    r = Reference("#/definitions/app/")
    assert r.pointer == "#/definitions/app"


def test_str_roundtrip():
    assert str(Reference("http://example.com#/foo")) == "http://example.com#/foo"
    assert str(Reference("#/foo")) == "#/foo"


def test_ordering():
    assert Reference("#/a") < Reference("#/b")
