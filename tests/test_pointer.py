"""RFC-6901 pointer tests (reference: test/json_pointer/evaluator_test.rb)."""

import pytest

from json_schema_spark import pointer

DOC = {
    "foo": ["bar", "baz"],
    "": 0,
    "a/b": 1,
    "c%d": 2,
    "e^f": 3,
    "g|h": 4,
    "i\\j": 5,
    "k\"l": 6,
    " ": 7,
    "m~n": 8,
}


@pytest.mark.parametrize(
    "path,expected",
    [
        ("", DOC),
        ("/foo", ["bar", "baz"]),
        ("/foo/0", "bar"),
        ("/", 0),
        ("/a~1b", 1),
        ("/c%d", 2),
        ("/e^f", 3),
        ("/g|h", 4),
        ("/i\\j", 5),
        ('/k"l', 6),
        ("/ ", 7),
        ("/m~0n", 8),
    ],
)
def test_rfc6901_spec_table(path, expected):
    assert pointer.evaluate(DOC, path) == expected


def test_hash_prefix_optional():
    assert pointer.evaluate(DOC, "#/foo/0") == "bar"


def test_missing_key_returns_none():
    assert pointer.evaluate(DOC, "/missing/deep") is None


def test_error_on_relative_path():
    with pytest.raises(ValueError) as e:
        pointer.evaluate(DOC, "foo")
    assert 'Path must begin with a leading "/": foo.' in str(e.value)


def test_error_on_non_digit_array_key():
    with pytest.raises(ValueError) as e:
        pointer.evaluate(DOC, "/foo/bar")
    assert 'Key operating on an array must be a digit or "-": bar.' in str(e.value)


def test_out_of_range_array_index_is_none():
    assert pointer.evaluate(DOC, "/foo/9") is None
