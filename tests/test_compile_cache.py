"""Compiled-SQL caching (round-2 VERDICT #8): the second submission of the
same schema must skip the driver-side parse→expand→emit pipeline entirely,
and any configuration change must invalidate."""

from __future__ import annotations

import pytest

from json_schema_spark import configuration
from json_schema_spark.compile.columnar import ColumnarCompiler
from json_schema_spark.engine import ValidationEngine


@pytest.fixture(autouse=True)
def reset_config():
    configuration().reset()
    ValidationEngine._COMPILE_CACHE.clear()
    yield
    configuration().reset()
    ValidationEngine._COMPILE_CACHE.clear()


SCHEMA = {
    "properties": {
        "name": {"type": ["string"], "minLength": 2},
        "n": {"type": ["integer"], "maximum": 10},
    },
    "required": ["name"],
}


def _docs(spark):
    return spark.createDataFrame(
        [(1, "ok", 3), (2, "x", 99)], "doc_id bigint, name string, n bigint")


def _count_compiles(monkeypatch):
    calls = {"n": 0}
    orig = ColumnarCompiler.compile_parts

    def counted(self, *a, **k):
        calls["n"] += 1
        return orig(self, *a, **k)

    monkeypatch.setattr(ColumnarCompiler, "compile_parts", counted)
    return calls


def test_second_compile_is_cached(spark, monkeypatch):
    calls = _count_compiles(monkeypatch)
    eng = ValidationEngine(spark)
    r1 = eng.validate_typed(_docs(spark), SCHEMA, id_cols=["doc_id"])
    assert calls["n"] == 1
    r2 = eng.validate_typed(_docs(spark), SCHEMA, id_cols=["doc_id"])
    assert calls["n"] == 1, "same schema+table shape must hit the cache"
    # cached text must still produce correct results
    assert {(r.doc_id, r.is_valid) for r in
            r2.annotated.select("doc_id", "is_valid").collect()} == \
        {(1, True), (2, False)}
    # a second engine instance shares the cache (it is keyed on text, not
    # the session)
    eng2 = ValidationEngine(spark)
    eng2.validate_typed(_docs(spark), SCHEMA, id_cols=["doc_id"])
    assert calls["n"] == 1


def test_schema_or_shape_change_misses(spark, monkeypatch):
    calls = _count_compiles(monkeypatch)
    eng = ValidationEngine(spark)
    eng.validate_typed(_docs(spark), SCHEMA, id_cols=["doc_id"])
    other = {**SCHEMA, "maxProperties": 5}
    eng.validate_typed(_docs(spark), other, id_cols=["doc_id"])
    assert calls["n"] == 2
    base = _docs(spark)
    wider = base.withColumn("extra", base.n * 2)
    eng.validate_typed(wider, SCHEMA, id_cols=["doc_id"])
    assert calls["n"] == 3, "different table shape must not reuse pruned text"


def test_config_change_invalidates(spark, monkeypatch):
    calls = _count_compiles(monkeypatch)
    eng = ValidationEngine(spark)
    schema = {"properties": {"name": {"format": "shouty"}}}
    configuration().register_format("shouty", lambda s: s.isupper())
    eng = ValidationEngine(spark)  # re-register UDFs for the new format
    eng.validate_typed(_docs(spark), schema, id_cols=["doc_id"])
    n_before = calls["n"]
    configuration().register_format("shouty", lambda s: s.islower())
    eng = ValidationEngine(spark)
    r = eng.validate_typed(_docs(spark), schema, id_cols=["doc_id"])
    assert calls["n"] == n_before + 1, "config version change must recompile"
    assert {(row.doc_id, row.is_valid) for row in
            r.annotated.select("doc_id", "is_valid").collect()} == \
        {(1, True), (2, True)}


def test_variant_mode_cached(spark, monkeypatch):
    calls = _count_compiles(monkeypatch)
    eng = ValidationEngine(spark)
    df = spark.createDataFrame(
        [(1, '{"name": "ok"}'), (2, '{"name": 7}')], "doc_id bigint, j string")
    r1 = eng.validate_json(df, "j", SCHEMA, id_cols=["doc_id"])
    r2 = eng.validate_json(df, "j", SCHEMA, id_cols=["doc_id"])
    assert calls["n"] == 1
    assert {(r.doc_id, r.is_valid) for r in
            r2.annotated.select("doc_id", "is_valid").collect()} == \
        {(1, True), (2, False)}
