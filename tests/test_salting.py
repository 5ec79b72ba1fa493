"""Salted-join skew defense: correctness under a deliberately hot key, and
the salt actually spreads the hot key across reducer partitions."""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.checks.salting import (duplicate_key_rows_salted,
                                              salt_probe, salted_join)
from json_schema_spark.checks.uniqueness import duplicate_key_rows
from json_schema_spark.datagen import DocGenConfig, generate_documents, generate_media
from json_schema_spark.checks.referential import extract_refs


@pytest.fixture(scope="module")
def skewed_docs(spark):
    # skew=0.5: half of all media spans point at ONE hot media_ref
    cfg = DocGenConfig(n_docs=4000, seed=23, skew=0.5, dup_rate=0.02, partitions=8)
    return generate_documents(spark, cfg).cache()


def test_skew_exists(spark, skewed_docs):
    refs = extract_refs(skewed_docs)
    top = refs.groupBy("media_ref").count().orderBy(F.desc("count")).first()
    total = refs.count()
    assert top["count"] > 0.3 * total  # the generator really is skewed


def test_salted_dup_rows_match_plain(spark, skewed_docs):
    plain = duplicate_key_rows(skewed_docs, "doc_id").select("doc_id")
    salted = duplicate_key_rows_salted(skewed_docs, "doc_id").select("doc_id")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salt_spreads_hot_key(spark, skewed_docs):
    refs = extract_refs(skewed_docs)
    hot = refs.groupBy("media_ref").count().orderBy(F.desc("count")).first()["media_ref"]
    salted = salt_probe(refs.where(F.col("media_ref") == hot), salt_buckets=8,
                        entropy_cols=["doc_id", "span_idx"])
    buckets = salted.groupBy("__salt").count().collect()
    assert len(buckets) == 8  # the hot key occupies all salt buckets
    counts = [r["count"] for r in buckets]
    assert max(counts) < 2.5 * min(counts)  # roughly even spread


def test_salted_semi_join_counts(spark, skewed_docs):
    media = generate_media(spark, DocGenConfig(n_docs=4000, seed=23, partitions=8))
    refs = extract_refs(skewed_docs)
    plain = refs.join(media.select("media_ref"), "media_ref", "left_semi")
    salted = salted_join(refs, media.select("media_ref"), ["media_ref"],
                         "left_semi", salt_buckets=8,
                         probe_entropy=["doc_id", "span_idx"])
    assert plain.count() == salted.count()
