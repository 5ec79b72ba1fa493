"""Deep mode: iterative validation — agrees with the columnar engine on
acyclic schemas and catches arbitrarily nested violations in cyclic ones
(which static compilation validates vacuously past its bounds)."""

import json

import pytest
from pyspark.sql import functions as F

from json_schema_spark.deep import DeepValidator
from json_schema_spark.engine import ValidationEngine, compile_schema
from json_schema_spark.metaschema import DRAFT4_META_SCHEMA
from tests.data_scaffold import data_sample, schema_sample
from tests.oracle_validator import OracleValidator


def run_deep(spark, schema, docs):
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, doc string"
    ).withColumn("v", F.parse_json("doc"))
    dv = DeepValidator(spark, schema)
    out = dv.validate(df, "v", "i")
    return {r["doc_id"]: r for r in out.collect()}


def test_deep_matches_columnar_on_scaffold(spark):
    schema = compile_schema(schema_sample()).definitions["app"]
    docs = [
        data_sample(),
        {},  # required name missing
        {"name": "ab"},  # minLength
        {"name": "valid-name", "visibility": "personal"},  # enum
        {"name": "valid-name", "flags": ["ok", "1337"]},  # item pattern
        {"name": "valid-name", "extra": 1},  # additionalProperties false
        {"name": "valid-name", "contrived": "ab"},  # combinators fail
        {"name": "valid-name", "production": True},  # dependency
        {"name": "valid-name", "cost": 0.005},  # multipleOf
    ]
    deep = run_deep(spark, schema, docs)

    df = spark.createDataFrame([(i, json.dumps(d)) for i, d in enumerate(docs)],
                               "i int, doc string")
    col = ValidationEngine(spark).validate_json(df, "doc", schema, id_cols=["i"])
    colr = {r["i"]: r for r in col.annotated.select("i", "is_valid", "violations").collect()}

    for i in range(len(docs)):
        assert deep[i]["is_valid"] == colr[i]["is_valid"], (i, docs[i])
        d_errs = sorted((e["error_type"], e["path"]) for e in deep[i]["violations"])
        c_errs = sorted((e["error_type"], e["path"]) for e in (colr[i]["violations"] or []))
        assert d_errs == c_errs, (i, docs[i], d_errs, c_errs)


def test_deep_messages_match_columnar(spark):
    schema = compile_schema(schema_sample()).definitions["app"]
    docs = [{"name": "ab"}, {"name": "valid-name", "cost": 0.005}]
    deep = run_deep(spark, schema, docs)
    msgs = sorted(e["message"] for r in deep.values() for e in r["violations"])
    assert "At least 3 characters are required; only 2 were supplied." in msgs
    assert "0.005 is not a multiple of 0.01." in msgs


def test_deep_metaschema_nested_violation(spark):
    """The case static depth-1 compilation misses: a keyword violation
    nested inside a sub-schema of a sub-schema."""
    docs = [
        {"items": {"maxLength": -1}},                          # depth 2
        {"items": {"items": {"items": {"maxLength": -1}}}},    # depth 4
        {"items": {"items": {"items": {"maxLength": 3}}}},     # valid
        {"properties": {"a": {"not": {"enum": []}}}},          # nested enum
    ]
    deep = run_deep(spark, DRAFT4_META_SCHEMA, docs)
    assert not deep[0]["is_valid"]
    assert not deep[1]["is_valid"]
    assert deep[2]["is_valid"], [e["message"] for e in deep[2]["violations"]]
    assert not deep[3]["is_valid"]
    # the nested min_failed hides inside the anyOf branch (reference
    # semantics: branch errors go to sub_errors, not the main list)
    errs1 = deep[1]["violations"]
    assert {e["error_type"] for e in errs1} == {"any_of_failed"}
    assert any("min_failed" in (e["sub_errors"] or "") for e in errs1)


def test_deep_sub_errors_structure_matches_columnar(spark):
    """Combinator sub_errors must be a branch-ordered JSON array-of-arrays
    (the columnar engine's to_json(array(errs_0, errs_1, ...)) layout), and
    combinator errors must cite the generating node's schema pointer."""
    schema = {
        "definitions": {
            "combo": {
                "anyOf": [
                    {"type": ["integer"], "minimum": 10},
                    {"type": ["string"], "minLength": 5},
                ],
            }
        },
        "properties": {"x": {"$ref": "#/definitions/combo"}},
    }
    docs = [{"x": 3}]
    deep = run_deep(spark, schema, docs)
    assert not deep[0]["is_valid"]
    [err] = deep[0]["violations"]
    assert err["error_type"] == "any_of_failed"

    df = spark.createDataFrame([(0, json.dumps(docs[0]))], "i int, doc string")
    col = ValidationEngine(spark).validate_json(df, "doc", schema, id_cols=["i"])
    [crow] = col.annotated.select("violations").collect()
    [cerr] = crow["violations"]
    # Ruby keeps the ref SITE's fragment on dereference (fragment is not
    # attr_copyable, reference_expander.rb:172-175), so both engines must
    # report the ref site's pointer — and agree with each other
    assert err["schema_pointer"] == cerr["schema_pointer"] == "#/properties/x"

    d_sub, c_sub = json.loads(err["sub_errors"]), json.loads(cerr["sub_errors"])
    assert isinstance(d_sub, list) and all(isinstance(b, list) for b in d_sub)
    assert len(d_sub) == len(c_sub) == 2
    for d_branch, c_branch in zip(d_sub, c_sub):
        d_keys = sorted((e["error_type"], e["path"]) for e in d_branch)
        c_keys = sorted((e["error_type"], e["path"]) for e in c_branch)
        assert d_keys == c_keys, (d_sub, c_sub)


def test_deep_spill_mode_matches_in_memory(spark, tmp_path):
    """spill_path: every level persists to parquet instead of
    localCheckpoint — identical results, bounded executor storage."""
    schema = compile_schema(schema_sample()).definitions["app"]
    docs = [data_sample(), {}, {"name": "ab"},
            {"name": "valid-name", "contrived": "ab"}]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, doc string"
    ).withColumn("v", F.parse_json("doc"))
    mem = DeepValidator(spark, schema).validate(df, "v", "i")
    spill = DeepValidator(spark, schema, spill_path=str(tmp_path / "spill")) \
        .validate(df, "v", "i")
    m = {r["doc_id"]: r for r in mem.collect()}
    s = {r["doc_id"]: r for r in spill.collect()}
    assert set(m) == set(s)
    for i in m:
        assert m[i]["is_valid"] == s[i]["is_valid"]
        assert sorted((e["error_type"], e["path"], e["message"])
                      for e in m[i]["violations"]) == \
               sorted((e["error_type"], e["path"], e["message"])
                      for e in s[i]["violations"])
    # the spill directory actually holds per-level parquet
    import os

    assert os.path.isdir(str(tmp_path / "spill" / "level=0"))


def test_deep_matches_oracle_random(spark):
    import random

    from tests.test_random_crosscheck import rand_schema, rand_value

    rng = random.Random(4242)
    schema_dict = rand_schema(rng)
    node = compile_schema(schema_dict)
    oracle = OracleValidator(node)
    docs = [rand_value(rng) for _ in range(20)]
    deep = run_deep(spark, node, docs)
    for i, doc in enumerate(docs):
        want_valid, want_errors = oracle.validate(doc)
        got = sorted((e["error_type"], e["path"]) for e in deep[i]["violations"])
        assert deep[i]["is_valid"] == want_valid, (doc, got, sorted(want_errors))
        assert got == sorted(want_errors), (doc, schema_dict)
