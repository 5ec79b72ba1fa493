"""Corpus-level check tests over the seeded generator (FIXTURES.md §6)."""

import math

import pytest
from pyspark.sql import functions as F

from json_schema_spark.checks import (column_stats, dangling_ref_keys,
                                      dangling_refs, drift_report,
                                      duplicate_key_rows, duplicate_keys,
                                      per_partition_stats, uniqueness_report)
from json_schema_spark.datagen import DocGenConfig, generate_documents, generate_media

CFG = DocGenConfig(
    n_docs=3000,
    seed=11,
    dup_rate=0.02,
    dangling_rate=0.02,
    media_coverage=1.0,
    partitions=8,
)


@pytest.fixture(scope="module")
def docs(spark):
    return generate_documents(spark, CFG).cache()


@pytest.fixture(scope="module")
def media(spark):
    return generate_media(spark, CFG).cache()


def test_uniqueness(spark, docs):
    report = uniqueness_report(docs, "doc_id")
    assert report["rows"] == CFG.n_docs
    assert not report["unique"]
    # ~2% dup rate over 3000 docs
    assert 20 <= report["duplicate_rows"] <= 120

    dups = duplicate_keys(docs, "doc_id")
    assert dups.count() == report["duplicate_rows"]  # each dup key appears twice
    assert dups.agg(F.max("dup_count")).collect()[0][0] >= 2

    rows = duplicate_key_rows(docs, "doc_id")
    assert rows.count() == 2 * report["duplicate_rows"]


def test_uniqueness_clean(spark):
    clean = generate_documents(spark, DocGenConfig(n_docs=500, seed=3, partitions=4))
    assert uniqueness_report(clean, "doc_id")["unique"]


def test_referential(spark, docs, media):
    dangling = dangling_refs(docs, media)
    n = dangling.count()
    assert n > 0
    # all dangling refs point beyond the catalog key space (>= n_media)
    bad_idx = dangling.select(
        F.regexp_extract("media_ref", r"media_(\d+)", 1).cast("int").alias("i"))
    assert bad_idx.agg(F.min("i")).collect()[0][0] >= CFG.n_media

    keys = dangling_ref_keys(docs, media)
    assert keys.count() <= n
    assert keys.agg(F.sum("occurrences")).collect()[0][0] == n


def test_referential_clean(spark, media):
    clean = generate_documents(
        spark, DocGenConfig(n_docs=500, seed=11, media_coverage=1.0, partitions=4))
    assert dangling_refs(clean, generate_media(
        spark, DocGenConfig(n_docs=500, seed=11, media_coverage=1.0, partitions=4))).count() == 0


def test_referential_broadcast_plan(spark, docs, media):
    plan = dangling_refs(docs, media)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_column_stats(spark, docs):
    flat = docs.select(F.explode("spans").alias("s")).select(
        F.col("s.offset").alias("offset"), F.col("s.kind").alias("kind"))
    stats = {r["column"]: r for r in column_stats(flat, ["offset", "kind"]).collect()}
    n = flat.count()
    assert stats["offset"]["count"] == n
    assert stats["offset"]["nulls"] == 0
    assert stats["offset"]["mean"] is not None and stats["offset"]["stddev"] > 0
    # 4 kinds (+ the injected 'blob')
    assert 4 <= stats["kind"]["approx_distinct"] <= 6
    # cross-check mean exactly
    true_mean = flat.agg(F.avg("offset")).collect()[0][0]
    assert abs(stats["offset"]["mean"] - true_mean) < 1e-9


def test_per_partition_stats(spark, docs):
    flat = docs.select(F.explode("spans").alias("s")).select(F.col("s.offset").alias("offset"))
    pp = per_partition_stats(flat, "offset").collect()
    assert sum(r["rows"] for r in pp) == flat.count()


def test_drift_no_shift(spark):
    a = generate_documents(spark, DocGenConfig(n_docs=2000, seed=21, partitions=4))
    b = generate_documents(spark, DocGenConfig(n_docs=2000, seed=22, partitions=4))
    fa = a.select(F.explode("spans.offset").alias("offset"))
    fb = b.select(F.explode("spans.offset").alias("offset"))
    rep = drift_report(fa, fb, "offset", bins=64)
    assert rep["ks_statistic"] < 0.05
    assert rep["psi"] < 0.05


def test_drift_with_shift(spark):
    a = generate_documents(spark, DocGenConfig(n_docs=2000, seed=21, partitions=4))
    fa = a.select(F.explode("spans.offset").alias("offset"))
    fb = fa.select((F.col("offset") * 2 + 50).alias("offset"))  # shifted epoch
    rep = drift_report(fa, fb, "offset", bins=64)
    assert rep["ks_statistic"] > 0.2
    assert rep["psi"] > 0.25


def test_column_quantiles_default_is_bounded_memory(spark):
    """r3 VERDICT #5: the stats-level quantile default must be the
    sketch-based approx_percentile (bounded per-group state, mergeable
    partials); the full-buffering exact percentile is opt-in only."""
    from json_schema_spark.checks.stats import column_quantiles

    df = spark.range(0, 1001).selectExpr("id % 2 AS g",
                                         "CAST(id AS DOUBLE) AS v")
    approx = column_quantiles(df, "v", group_by="g")
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "approx_percentile" in plan
    assert " percentile(" not in plan  # no exact full-buffer aggregate

    exact = column_quantiles(df, "v", group_by="g", exact=True)
    eplan = exact._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" in eplan.replace("approx_percentile", "")

    # at this accuracy the sketch is rank-exact; it returns an actual
    # element while exact percentile interpolates, and within-group values
    # step by 2 — so they agree to within one step
    a = {r.g: (r.p25, r.p50, r.p75) for r in approx.collect()}
    e = {r.g: (r.p25, r.p50, r.p75) for r in exact.collect()}
    for g in a:
        for x, y in zip(a[g], e[g]):
            assert abs(x - y) <= 2.0
