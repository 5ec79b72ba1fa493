"""Datagen determinism + typed-mode validation of the interleaved documents
table, cross-checked against the variant engine (same schema, same docs)."""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.checks import span_sequence_mismatches
from json_schema_spark.datagen import (DocGenConfig, documents_json_schema,
                                       generate_documents, generate_media)
from json_schema_spark.engine import ValidationEngine

CFG = DocGenConfig(
    n_docs=2000,
    seed=7,
    dup_rate=0.01,
    dangling_rate=0.01,
    bad_kind_rate=0.01,
    neg_offset_rate=0.01,
    long_text_rate=0.01,
    partitions=8,
)


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, CFG).cache()


def test_deterministic_across_partitionings(spark):
    a = generate_documents(spark, CFG)
    b = generate_documents(spark, DocGenConfig(**{**CFG.__dict__, "partitions": 3}))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_shape(docs):
    assert docs.count() == CFG.n_docs
    row = docs.first()
    assert row["doc_id"].startswith("doc_")
    assert len(row["spans"]) >= 1
    fields = row["spans"][0].asDict()
    assert set(fields) == {"kind", "text", "media_ref", "offset"}


def test_media_catalog(spark):
    media = generate_media(spark, CFG)
    n = media.count()
    assert 0 < n <= CFG.n_media
    assert media.select("media_ref").distinct().count() == n


def test_typed_validation_counts(spark, docs):
    engine = ValidationEngine(spark)
    schema = documents_json_schema(CFG)
    result = engine.validate_typed(docs, schema, id_cols=["doc_id"])
    counts = result.counts()
    assert counts["docs"] == CFG.n_docs
    # schema violations come from bad_kind + neg_offset + long_text windows
    # (~1% each of 2000 docs ≈ 60); dup/dangling are corpus-level, not schema
    invalid = counts["docs"] - counts["valid_docs"]
    assert 30 <= invalid <= 90, invalid

    by_type = {r["error_type"]: r["n"] for r in
               result.violations.groupBy("error_type").agg(F.count("*").alias("n")).collect()}
    assert set(by_type) == {"invalid_type", "min_failed", "max_length_failed"}

    # a bad-kind violation pins path and message shape
    enum_viol = result.violations.where(F.col("error_type") == "invalid_type").first()
    assert enum_viol["message"].endswith('is not a member of ["text", "image", "audio", "video"].')
    assert enum_viol["path"].startswith("#/spans/")


def test_typed_matches_variant_verdicts(spark, docs):
    """The same documents, validated typed vs as JSON variants, must agree
    on every per-document verdict (modulo the typed absent-vs-null
    distinction, which this schema does not exercise)."""
    engine = ValidationEngine(spark)
    schema = documents_json_schema(CFG)
    typed = engine.validate_typed(docs, schema, id_cols=["doc_id"])

    as_json = docs.select(
        F.col("doc_id").alias("jid"),
        F.to_json(F.struct("doc_id", "spans")).alias("doc_json"),
    )
    varnt = engine.validate_json(as_json, "doc_json", schema, id_cols=["jid"])

    t = typed.annotated.select(F.col("doc_id").alias("id"), F.col("is_valid").alias("tv"))
    v = varnt.annotated.select(F.col("jid").alias("id"), F.col("is_valid").alias("vv"))
    disagreements = t.join(v, "id").where(F.col("tv") != F.col("vv")).count()
    assert disagreements == 0


def test_verdicts_rollup(spark, docs):
    engine = ValidationEngine(spark)
    result = engine.validate_typed(docs, documents_json_schema(CFG), id_cols=["doc_id"])
    verdicts = result.verdicts.collect()
    assert sum(r["docs"] for r in verdicts) == CFG.n_docs
    assert all(r["docs"] == r["valid_docs"] + r["invalid_docs"] for r in verdicts)


def test_verdict_only_mode_agrees(spark, docs):
    """verdict_only (fail-fast analog) and full mode give identical verdicts."""
    engine = ValidationEngine(spark)
    schema = documents_json_schema(CFG)
    full = engine.validate_typed(docs, schema, id_cols=["doc_id"])
    fast = engine.validate_typed(docs, schema, id_cols=["doc_id"], verdict_only=True)
    f = full.annotated.select(F.col("doc_id").alias("id"), F.col("is_valid").alias("fv"))
    v = fast.annotated.select(F.col("doc_id").alias("id"), F.col("is_valid").alias("vv"))
    assert f.join(v, "id").where(F.col("fv") != F.col("vv")).count() == 0
    assert fast.counts()["valid_docs"] == full.counts()["valid_docs"]


def test_span_sequence_invariant(spark, docs):
    engine = ValidationEngine(spark)
    result = engine.validate_typed(docs, documents_json_schema(CFG), id_cols=["doc_id"])
    surviving = result.annotated.where("is_valid").select("doc_id", "spans")
    original_valid = docs.join(surviving.select("doc_id"), "doc_id", "left_semi")
    assert span_sequence_mismatches(original_valid, surviving) == 0
