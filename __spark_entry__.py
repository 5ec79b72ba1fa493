"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship typed validation; ``queries()``
exposes one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline extensions); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible entry.

Cross-engine determinism rules used throughout:
- floats are rounded on BOTH sides (means r6, ratios r6, cosines r6);
- similarity math is integer-quantized so dot products/norms are exact;
- hashes are md5-based (identical in Spark and DuckDB);
- timestamps are compared as epoch seconds.
Entries with engine-specific hashing (xxhash64) or driver-merged sketches
have no oracle → the driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from json_schema_spark.checks import (column_stats, drift_report,
                                      duplicate_keys)
from json_schema_spark.engine import ValidationEngine
from json_schema_spark.pipeline import (asof, curate, dedup, similarity,
                                        text as text_ops)

# ---------------------------------------------------------------------------

DOCUMENTS_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "title": "oracle documents table",
    "type": ["object"],
    "required": ["doc_id", "text"],
    "properties": {
        "doc_id": {"type": ["integer"], "minimum": 0},
        "text": {"type": ["string"], "minLength": 50, "maxLength": 500},
        "lang": {"enum": ["de", "en", "es", "fr", "zh"]},
        "source": {"type": ["string"], "pattern": "^src[0-9]+$"},
        "n_chars": {"type": ["integer"], "minimum": 0, "maximum": 10000},
    },
}

PROPS_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": ["object"],
    "required": ["k"],
    "properties": {"k": {"type": ["integer"], "minimum": 0, "maximum": 80}},
}

# Full-keyword scaffold (modelled on the reference's test scaffold,
# test/data_scaffold.rb:8-240): exercises allOf/anyOf/oneOf/not, list+tuple
# items, additionalItems, uniqueItems, min/maxItems, dependencies (simple +
# schema), additionalProperties (schema), patternProperties, min/max
# Properties, strictProperties, enum, pattern, formats (incl. the UDF-backed
# `regex` format under `items`), min/max/multipleOf. 20 deterministic doc
# variants keyed on doc_id % 20; the expected violation set per variant was
# cross-derived from the clean-room reference-semantics oracle
# (tests/oracle_validator.py) and is asserted row-for-row by the DuckDB
# oracle below.
SCAFFOLD_SCHEMA = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": ["object"],
    "definitions": {"tag": {"type": ["string"], "minLength": 2, "maxLength": 10}},
    "allOf": [{"required": ["name"]}],
    "anyOf": [{"required": ["size"]}, {"required": ["coords"]}],
    "oneOf": [{"required": ["owner"]}, {"required": ["org"]}],
    "not": {"required": ["forbidden"]},
    "required": ["name", "visibility"],
    "properties": {
        "name": {"type": ["string"], "pattern": "^[a-z][a-z0-9-]*$",
                 "minLength": 3, "maxLength": 30},
        "visibility": {"enum": ["public", "private"]},
        "tags": {"type": ["array"], "items": {"$ref": "#/definitions/tag"},
                 "uniqueItems": True, "minItems": 1, "maxItems": 5},
        "coords": {"items": [{"type": ["integer"]}, {"type": ["integer"]}],
                   "additionalItems": False},
        "size": {"type": ["number"], "minimum": 0, "maximum": 100, "multipleOf": 0.5},
        "ssl": {"type": ["boolean"]},
        "cert": {"type": ["string"]},
        "email": {"type": ["string"], "format": "email"},
        "re": {"type": ["string"], "format": "regex"},
        "res": {"type": ["array"], "items": {"type": ["string"], "format": "regex"}},
        "owner": {"type": ["string"]},
        "org": {"type": ["string"]},
        "config": {"type": ["object"], "additionalProperties": {"type": ["integer"]},
                   "minProperties": 1, "maxProperties": 3},
        "strict": {"type": ["object"],
                   "properties": {"a": {"type": ["integer"]}, "b": {"type": ["integer"]}},
                   "strictProperties": True},
    },
    "patternProperties": {"^meta_": {"type": ["integer"], "minimum": 0}},
    "dependencies": {"ssl": ["cert"], "coords": {"required": ["size"]}},
}


def _scaffold_docs() -> list:
    """The 20 deterministic document variants (JSON strings), indexed by
    doc_id % 20. Variant 0 is fully valid; each other variant trips exactly
    the keyword(s) listed in _SCAFFOLD_EXPECTED."""
    import json as _json

    docs = []
    for v in range(20):
        d = {"name": "doc-x", "visibility": "public", "size": 4.5,
             "owner": "me", "tags": ["alpha", "beta"]}
        if v == 1:
            d["name"] = "Doc"
        elif v == 2:
            d["visibility"] = "hidden"
        elif v == 3:
            del d["name"]
        elif v == 4:
            d["tags"] = ["alpha", "alpha"]
        elif v == 5:
            d["tags"] = ["a"]
        elif v == 6:
            d["coords"] = [1, 2, 3]
        elif v == 7:
            del d["size"]
            d["coords"] = [1, "x"]
        elif v == 8:
            d["size"] = 4.3
        elif v == 9:
            d["ssl"] = True
        elif v == 10:
            d["meta_n"] = -5
        elif v == 11:
            d["email"] = "bad"
            d["re"] = "("
            d["res"] = ["(", "ok.*"]
        elif v == 12:
            d["config"] = {"a": 1, "b": 2, "c": 3, "d": 4}
        elif v == 13:
            d["config"] = {"a": "x"}
        elif v == 14:
            d["forbidden"] = "x"
        elif v == 15:
            d["org"] = "corp"
        elif v == 16:
            d["strict"] = {"a": 1}
        elif v == 17:
            d["strict"] = {"a": 1, "b": 2, "c": 3}
        elif v == 18:
            d["tags"] = []
        elif v == 19:
            d["size"] = 150.0
        docs.append(_json.dumps(d))
    return docs


# (variant, path, error_type) — cross-derived from tests/oracle_validator.py
_SCAFFOLD_EXPECTED = [
    (1, "#/name", "pattern_failed"),
    (2, "#/visibility", "invalid_type"),
    (3, "#", "required_failed"),        # allOf child {required: [name]}
    (3, "#", "all_of_failed"),
    (3, "#", "required_failed"),        # root required
    (4, "#/tags", "unique_items_failed"),
    (5, "#/tags/0", "min_length_failed"),
    (6, "#/coords", "max_items_failed"),
    (7, "#/coords/1", "invalid_type"),
    (7, "#", "required_failed"),        # dependencies (schema form)
    (8, "#/size", "multiple_of_failed"),
    (9, "#", "required_failed"),        # dependencies (simple form)
    (10, "#/meta_n", "min_failed"),
    (11, "#/email", "invalid_format"),
    (11, "#/re", "invalid_format"),
    (11, "#/res/0", "invalid_format"),  # UDF format under items (lambda hoist)
    (12, "#/config", "max_properties_failed"),
    (13, "#/config/a", "invalid_type"),
    (14, "#", "not_failed"),
    (15, "#", "one_of_failed"),
    (16, "#/strict", "required_failed"),
    (17, "#/strict", "invalid_keys"),
    (18, "#/tags", "min_items_failed"),
    (19, "#/size", "max_failed"),
]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _scan_fanout(df: DataFrame, id_col: str) -> DataFrame:
    """Input-skew guard (optimization guide §2.5 'one huge unsplittable
    file'): when the scan yields fewer partitions than the cluster has
    cores, fan out by a hash of the id so downstream per-row work (the
    interpreted variant validators here) parallelizes. At real scale the
    scan's own splits already exceed the core count and this is a NO-OP —
    no shuffle is ever added to a well-split input. (r6 re-measurement
    overturned the round-4 note that fan-out was slower: per-task plan
    instantiation is amortized by Spark's task-binary broadcast; scaffold
    exec dropped 6.7 s -> 1.2 s with the fan-out.)"""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n, F.col(id_col))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compile the documents schema once, validate the corpus,
    emit violation rows (doc_id, path, error_type, schema_pointer, message)."""
    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    engine = ValidationEngine(spark)
    result = engine.validate_typed(docs, DOCUMENTS_SCHEMA, id_cols=["doc_id"])
    return result.violations


# --- query implementations --------------------------------------------------


def q_validate_verdicts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    res = ValidationEngine(spark).validate_typed(docs, DOCUMENTS_SCHEMA, id_cols=["doc_id"])
    return res.annotated.select("doc_id", "is_valid")


def q_validate_violations(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    res = ValidationEngine(spark).validate_typed(docs, DOCUMENTS_SCHEMA, id_cols=["doc_id"])
    return res.violations.select("doc_id", "path", "error_type")


def q_validate_props_json(spark, sf_dir):
    events = _scan_fanout(_t(spark, sf_dir, "events"), "event_id")
    res = ValidationEngine(spark).validate_json(events, "props", PROPS_SCHEMA,
                                                id_cols=["event_id"])
    return res.annotated.select("event_id", "is_valid")


def q_scaffold_violations(spark, sf_dir):
    """Full-keyword validation: every documents row becomes one of 20
    deterministic scaffold docs (doc_id % 20) validated against
    SCAFFOLD_SCHEMA — the driver-visible analog of the reference's
    validator_test.rb keyword matrix."""
    d = _scan_fanout(_t(spark, sf_dir, "documents"), "doc_id")
    docs = _scaffold_docs()
    doc = F.element_at(F.array(*[F.lit(s) for s in docs]),
                       (F.col("doc_id") % 20 + 1).cast("int"))
    df = d.select("doc_id", doc.alias("doc"))
    res = ValidationEngine(spark).validate_json(df, "doc", SCAFFOLD_SCHEMA,
                                                id_cols=["doc_id"])
    return res.violations.select("doc_id", "path", "error_type")


def q_validation_summary(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    res = ValidationEngine(spark).validate_typed(docs, DOCUMENTS_SCHEMA, id_cols=["doc_id"])
    return (res.violations.groupBy("path", "error_type")
            .agg(F.count(F.lit(1)).alias("n_violations")))


def q_duplicate_line_orders(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return duplicate_keys(li, "l_orderkey")


def q_customers_without_orders(spark, sf_dir):
    """Referential anti-join (customers with no orders). Deterministically
    planted orphans — customers with c_custkey % 97 == 13 are re-keyed out
    of the orders key space — keep the oracle non-vacuous (r3 VERDICT
    "What's missing" #1: the testdata has no natural orphan at sf0.01, so
    the old 0 == 0 green only proved consistency-of-emptiness)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    ckey = F.when(F.col("c_custkey") % 97 == 13,
                  F.col("c_custkey") + 10_000_000).otherwise(F.col("c_custkey"))
    c2 = c.select(ckey.alias("c_custkey"), "c_name")
    return (c2.join(o, c2.c_custkey == o.o_custkey, "left_anti")
            .select("c_custkey", "c_name"))


def q_lineitem_stats(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    stats = column_stats(li, ["l_quantity", "l_extendedprice"])
    return stats.select(
        "column", "count", "nulls",
        F.round("mean", 6).alias("mean_r6"),
        F.col("min").cast("double").alias("min_v"),
        F.col("max").cast("double").alias("max_v"),
    )


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_pricing_rollup(spark, sf_dir):
    """Grouping-sets coverage: ROLLUP over (returnflag, linestatus) with
    subtotal + grand-total rows. NULL group markers are coalesced to 'ALL'
    so the cross-engine hash compare is unambiguous."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count(F.lit(1)).alias("n_rows"))
        .select(F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
                F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
                "sum_qty", "n_rows")
    )


def q_user_set_ops(spark, sf_dir):
    """Set-operator coverage: INTERSECT and EXCEPT (distinct semantics) over
    the event-type user populations."""
    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select("user_id")
    buys = e.where(F.col("event_type") == "purchase").select("user_id")
    both = clicks.intersect(buys).select(
        "user_id", F.lit("click_and_purchase").alias("relation"))
    only = clicks.subtract(buys).select(
        "user_id", F.lit("click_only").alias("relation"))
    return both.unionByName(only)


def q_top_customers_per_segment(spark, sf_dir):
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("spend").desc(), F.col("c_custkey"))
    return (
        spend.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "spend")
    )


def q_revenue_by_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count(F.lit(1)).alias("n_orders"))
    )


def q_user_sessions(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds: unix_timestamp() truncates to whole seconds
    # while the oracle's epoch() is fractional — sub-second gaps straddling
    # the boundary would disagree (CORRECTNESS_r01 user_sessions hash fail)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    return (
        e.withColumn("new_session",
                     F.when(gap.isNull() | (gap > 3_600_000_000), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("new_session").alias("n_sessions"))
    )


def q_event_windows(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes")
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.unix_timestamp("w.start").alias("bucket_start"), "event_type", "n", "sum_value")
    )


def q_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text_ops.token_count(F.col("text")).alias("n_tokens"))


def q_token_stats(spark, sf_dir):
    """Per-language corpus statistics (docs/tokens/chars/bytes totals,
    UTF-8 bytes-per-token fertility, tokens-per-doc). Exact integer
    totals + one double division each — engine-exact; one small shuffle
    on lang."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.token_stats(d, group_col="lang")


def q_quality_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    q = text_ops.quality_features(d)
    return q.select(
        "doc_id", "n_tokens",
        F.round("avg_token_len", 6).alias("avg_token_len_r6"),
        F.round("stopword_ratio", 6).alias("stopword_ratio_r6"),
    )


def q_lang_distribution(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("n_chars"), 6).alias("avg_chars_r6")))


def q_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text_ops.lang_id(F.col("text")).alias("lang_pred"))


def q_doc_fingerprints(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", text_ops.fingerprint(F.col("text")).alias("fp"))


def q_bpe_token_counts(spark, sf_dir):
    """GPT-2-style pre-tokenizer counts (RE2-compatible pattern — the same
    regex literal runs in DuckDB)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id",
                    text_ops.bpe_token_count(F.col("text")).alias("n_bpe_tokens"))


def q_winnow_fingerprints(spark, sf_dir):
    """Winnowed rolling-hash (Karp-Rabin) fingerprints, the MOSS scheme —
    exact integer polynomial hashes, bit-identical in DuckDB."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.winnow_fingerprints(d, k=8, window=4)


def q_exact_dup_clusters(spark, sf_dir):
    """Exact-dup clusters over documents + deterministically planted
    duplicates (docs with doc_id % 100 == 7 re-inserted under id+10M): the
    sf0.01 corpus has no natural exact dups, so without planting the oracle
    comparison is vacuously green on an empty result (round-2 VERDICT
    "What's wrong" #4). The plant is a pure deterministic expression
    mirrored in the DuckDB oracle."""
    d = _t(spark, sf_dir, "documents")
    planted = (d.where(F.col("doc_id") % 100 == 7)
               .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
    return dedup.exact_duplicates(d.unionByName(planted))


def q_minhash_signatures(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(d, n=3, num_hashes=4)
    return sigs.select(
        "doc_id",
        F.posexplode("sig").alias("perm", "minhash"),
    ).select("doc_id", "perm", "minhash")


def q_jaccard_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # frequency cut on: ubiquitous shingles would otherwise fan the
    # self-join out quadratically (the 100-TB scale hazard)
    pairs = dedup.jaccard_pairs(d, n=3, threshold=0.2, max_shingle_freq=1000)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r6"))


def q_knn_cosine(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    out = similarity.cosine_topk(emb, k=5, queries=queries)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 6).alias("cosine_r6"))


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs: OR-amplified multi-band
    hyperplane LSH candidates (8 bands × 6 planes — recall ≈98% at cosine
    0.9 vs ~40% for round 2's single band), exact threshold filter.

    The corpus is augmented with deterministically planted near-dups (vecs
    with vec_id % 100 == 3 re-inserted under id+1M with the first
    coordinate shifted by 2^-6 — exact in IEEE, so both engines see
    bit-identical floats): sf0.01 has no natural pair above cosine 0.52,
    so without planting the oracle is vacuously green on empty output."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    planted = emb.where(F.col("vec_id") % 100 == 3).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            F.array((F.element_at(e, 1).cast("double")
                     + F.lit(0.015625)).cast("float")),
            F.slice(e, 2, F.size(e) - 1),
        ).alias("embedding"))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    out = similarity.embedding_near_dups(corpus, threshold=0.9,
                                         bands=8, planes_per_band=6)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine_r6"))


def q_lsh_topk(spark, sf_dir):
    """The scale ANN path: hyperplane-bucketed candidates (4 OR-amplified
    bands × 6 planes — closes round 2's single-band recall caveat), exact
    re-rank. Hyperplane signs are md5-derived and the projection is an
    exact integer dot product, so buckets (and the result) are
    engine-portable."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.lsh_topk(emb, k=5, planes=6, bands=4)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 6).alias("cosine_r6"))


def q_ivf_topk(spark, sf_dir):
    """IVF-flat ANN: md5-sampled centroids, exact-integer coarse assignment,
    nprobe-list probing, exact re-rank — deterministic end-to-end, so the
    DuckDB oracle reproduces it bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings")
    # C ~ sqrt(n), nprobe/C = 1/16 of the corpus per query: candidate
    # volume n²·(nprobe/C) stays ~6% of brute force
    out = similarity.ivf_topk(emb, k=5, n_centroids=64, nprobe=4)
    return out.select("query_id", "neighbor_id", "rank",
                      F.round("cosine", 6).alias("cosine_r6"))


def q_train_val_split(spark, sf_dir):
    """Deterministic hash-based train/val/test assignment (reproducible
    corpus splits — stable across runs/partitionings/engines, which
    df.sample() is not). Output: per-(split, lang) counts."""
    from json_schema_spark.pipeline import sampling

    d = _t(spark, sf_dir, "documents")
    out = sampling.hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    return (out.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n")))


_PII_PLANT = (" contact bob.smith+x@example.com or 10.0.0.1 "
              "or +1 (415) 555-0100")


def q_pii_redaction(spark, sf_dir):
    """PII scrub (emails / IPv4s / phone numbers → typed placeholders) —
    pure regexp_replace chain, RE2-portable patterns applied in the same
    order by the DuckDB oracle. Deterministically planted PII (docs with
    doc_id % 50 == 11 get a contact-info suffix) keeps the oracle
    non-vacuous: the synthetic corpus contains no natural PII."""
    d = _t(spark, sf_dir, "documents")
    planted = F.when(F.col("doc_id") % 50 == 11,
                     F.concat(F.col("text"), F.lit(_PII_PLANT))) \
        .otherwise(F.col("text"))
    clean = text_ops.redact_pii(planted)
    return (d.select("doc_id", planted.alias("__t"), clean.alias("clean_text"))
            .where(F.col("__t") != F.col("clean_text"))
            .select("doc_id", "clean_text"))


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (32-token chunks, 8 overlap) —
    fixed-context training-sample prep, row-local, shuffle-free."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.chunk_documents(d, chunk_tokens=32, overlap=8)


def q_ngram_repetition(spark, sf_dir):
    """Gopher-style repetition signals (duplicate-3-gram fraction +
    top-gram share) per document — the boilerplate/looping-text quality
    filter. Row-local total/distinct counts; one map-side-combined shuffle
    for the top-gram count. Exact integer counts, one double division —
    the DuckDB oracle reproduces values bit-for-bit."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.ngram_repetition(d, n=3)


def q_curated_corpus(spark, sf_dir):
    """END-TO-END curation composition — the pipeline a corpus actually
    runs, from the individually-oracled stages: row-local quality/lang
    filters (cheapest first, inside the scan) → exact dedup (fingerprint
    groupBy) → near-dup removal (freq-cut Jaccard pairs → connected
    components → keep the min-id representative) → deterministic hash
    split. Parameters chosen so EVERY stage filters something at sf0.01
    (min_tokens drops short docs, max_dup_frac 0.02 drops 4 repetitive
    docs, lang 'en' drops the 47 'und' docs, planted exact clones —
    doc_id % 100 == 7 re-keyed +10M, as in exact_dup_clusters — are
    removed by the fingerprint stage, near-dup removal drops the
    non-representatives). The DuckDB oracle recomputes the whole chain
    independently, recursive closure included."""
    d = _t(spark, sf_dir, "documents")
    planted = d.unionByName(
        d.where(F.col("doc_id") % 100 == 7)
        .withColumn("doc_id", F.col("doc_id") + 10_000_000))
    return curate.curate_corpus(planted, min_tokens=12, max_dup_frac=0.02,
                                langs=("en",), jaccard_threshold=0.2)


def q_stratified_sample(spark, sf_dir):
    """Domain-weighted deterministic sampling (training-mix construction):
    keep 100% of en, 40% of zh, 10% of de, drop unlisted strata (es/fr)
    — per-stratum md5-bucket cuts, row-local, partition/engine-invariant
    (df.sampleBy is per-partition RNG: NOT reproducible)."""
    from json_schema_spark.pipeline import sampling

    d = _t(spark, sf_dir, "documents")
    return (sampling.stratified_hash_sample(
                d, {"en": 1.0, "zh": 0.4, "de": 0.1}, "lang")
            .select("doc_id", "lang"))


def q_packed_sequences(spark, sf_dir):
    """Greedy sequence packing: 32/8 token chunks laid end-to-end into
    128-token training sequences within 8 md5 shards — seq_id is the bin
    of each chunk's starting offset (one running-sum window PER SHARD,
    never a global sort). Oracle recomputes the running sums in SQL."""
    d = _t(spark, sf_dir, "documents")
    chunks = text_ops.chunk_documents(d, chunk_tokens=32, overlap=8)
    return (text_ops.pack_sequences(chunks, budget=128, n_shards=8)
            .select("doc_id", "chunk_idx", "shard", "seq_id", "seq_offset"))


def q_classifier_scores(spark, sf_dir):
    """Model-based quality filtering (CCNet/fastText shape): hashed
    bag-of-words linear classifier — md5 token hash -> 4096 feature
    buckets (small on purpose: collisions fold weights, exercising the
    hashing trick), deterministic integer bucket weights, EXACT bigint
    weight sum per doc (map-side-combined, one doc-sized shuffle, zero
    UDFs), logit = one double division. Threshold 0.02 splits keep_doc
    non-trivially (~1/3 kept)."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.classifier_score(d, seed=42, n_buckets=4096,
                                     threshold=0.02)


def q_domain_budget_sample(spark, sf_dir):
    """Per-domain budgeted best-first selection (data mixing): each
    source keeps its highest-logit docs until a 700-token budget is
    spent (score from the hashed classifier, domain carried through the
    scoring aggregation as a group key — no re-join). Runs the TWO-PHASE
    path (shard-local exact pre-prune, prefilter_shards=4, then the
    global window) while the oracle is the plain single-window SQL — the
    hash gate pins the prune's exactness."""
    from json_schema_spark.pipeline import sampling

    d = _t(spark, sf_dir, "documents")
    scored = text_ops.classifier_score(d, seed=42, n_buckets=4096,
                                       passthrough_cols=("source",))
    return (sampling.domain_top_quality(scored, budget=700,
                                        prefilter_shards=4)
            .select("doc_id", "source", "n_tokens", "logit", "cum_tokens"))


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing ≥1 distinct word
    8-gram with a probe set (here: the docs with doc_id % 200 == 3 stand
    in for an eval benchmark). Probe shingle set broadcast (bounded);
    corpus side streams map-side; one combined shuffle for the per-doc
    overlap count. At sf0.01 exactly the 3 leaked docs flag — natural
    8-gram collisions are rare by design of the operating point."""
    d = _t(spark, sf_dir, "documents")
    probes = d.where(F.col("doc_id") % 200 == 3)
    return dedup.contamination_overlap(d, probes, n=8)


def q_token_heavy_hitters(spark, sf_dir):
    """Top-25 most frequent BPE pre-tokens corpus-wide: explode + hash
    groupBy (map-side partial combine compresses per-partition counts, so
    the shuffle carries one row per distinct token per partition) +
    TakeOrdered top-k. Deterministic tie-break: count DESC, token ASC."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(text_ops.bpe_tokens(F.col("text"))).alias("token"))
    return (toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("token"))
            .limit(25))


def q_quantity_quantiles(spark, sf_dir):
    """Exact quartiles of l_quantity per returnflag: Spark's exact
    percentile (sort-based, linear interpolation) vs DuckDB quantile_cont.
    Rounded to 6 decimals — the interpolation arithmetic is the same
    formula but not guaranteed bit-identical across engines.

    Exact ``percentile`` buffers every group value in the aggregation
    buffer — sound HERE because l_returnflag has 3 bounded groups and the
    oracle needs exactness, but it is the calibration path, not the scale
    path. For unbounded 100-TB columns use the bounded-state default
    ``checks.stats.column_quantiles`` (approx_percentile GK sketch) or
    ``checks.tdigest`` (deterministic mergeable sketch)."""
    li = _t(spark, sf_dir, "lineitem")
    pct = F.percentile(F.col("l_quantity"), F.lit([0.25, 0.5, 0.75]))
    return (li.groupBy("l_returnflag")
            .agg(F.round(pct[0], 6).alias("q25_r6"),
                 F.round(pct[1], 6).alias("q50_r6"),
                 F.round(pct[2], 6).alias("q75_r6")))


def q_duplicate_clusters(spark, sf_dir):
    """Near-dup PAIRS → dedup GROUPS: hash-min label-propagation connected
    components over the jaccard pair edges; cluster_id = component min id
    (the canonical keep representative). The DuckDB oracle recomputes the
    closure independently with a recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(d, n=3, threshold=0.2, max_shingle_freq=1000)
    return dedup.duplicate_clusters(pairs)


_BOILER_NEWSLETTER = "subscribe to our newsletter today"
_BOILER_FOOTER = "all rights reserved - example corp"


def _multiline_docs(d):
    """Deterministic multi-line re-layout of the single-line synthetic
    corpus + planted cross-document boilerplate lines. The generated
    documents contain no newlines, so without this construction line-level
    dedup is vacuously a no-op; the DuckDB oracle performs the identical
    construction (same substr windows, same CASE plants), so both engines
    see the same line corpus. ~1/7 of docs get a newsletter line, ~1/3 a
    footer line — both cross many documents and must be removed; the
    substr body lines are (near-)unique and must survive."""
    did = F.col("doc_id")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring(t, 1, 60),
            F.when(did % 7 == F.lit(2), F.lit(_BOILER_NEWSLETTER)),
            F.substring(t, 61, 60),
            F.when(did % 3 == F.lit(0), F.lit(_BOILER_FOOTER)),
            F.substring(t, 121, 60),
        ).alias("text"))


def q_dedup_lines(spark, sf_dir):
    """Corpus-level duplicate-line removal (C4 / RefinedWeb boilerplate
    pass), drop-every-copy mode: lines whose trimmed text appears in >1
    distinct documents are removed everywhere; short/blank lines are
    structural and immune. One map-side-combined frequency shuffle + one
    key join + one per-doc reassembly — no global window. The oracle
    recomputes frequencies, marking, and reassembly independently."""
    d = _t(spark, sf_dir, "documents")
    return dedup.line_dedup(_multiline_docs(d), min_line_chars=5,
                            max_doc_freq=1, keep_first=False)


def q_dedup_lines_keep_first(spark, sf_dir):
    """C4's keep-one-copy variant: the occurrence with the smallest
    (doc_id, position) survives, every other copy is removed — still
    fully deterministic (the keeper is a min, not a scan order)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.line_dedup(_multiline_docs(d), min_line_chars=5,
                            max_doc_freq=1, keep_first=True)


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-shaped semantic dedup: md5-sampled coarse centroids
    (ivf_assignments), within-cluster exact-cosine pairs at 0.9,
    connected components, keep = component-min representative. Planted
    near-dup clones (the same vec_id % 100 == 3 / +2^-6 shift as
    embedding_near_dups — exact in IEEE) de-vacuize: each clone
    co-clusters with its source and loses to the lower id, so the output
    pins 5 keep=false rows at sf0.01."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    planted = emb.where(F.col("vec_id") % 100 == 3).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            F.array((F.element_at(e, 1).cast("double")
                     + F.lit(0.015625)).cast("float")),
            F.slice(e, 2, F.size(e) - 1),
        ).alias("embedding"))
    corpus = emb.select("vec_id", "embedding").unionByName(planted)
    return similarity.semantic_dedup(corpus, threshold=0.9, n_centroids=16)


_PASSAGE_LONG = ("the quick brown fox jumps over the lazy dog "
                 "again and again")
_PASSAGE_SHORT = "common boilerplate sequence repeated across web documents"


def _passage_docs(d):
    """Deterministic exact-substring plants over the synthetic corpus: the
    generated texts are (near-)unique word sequences, so without planting,
    ExactSubstr dedup is vacuously a no-op. ~1/5 of docs get a shared
    12-token passage appended (cross-document duplication), ~1/13 get an
    8-token passage appended TWICE (intra-document duplication — also
    cross-document among the %13 cohort). The DuckDB oracle performs the
    identical construction, so both engines see the same token corpus."""
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 5 == F.lit(1),
                   F.lit(" " + _PASSAGE_LONG)).otherwise(F.lit("")),
            F.when(did % 13 == F.lit(4),
                   F.lit(" " + _PASSAGE_SHORT + " " + _PASSAGE_SHORT))
            .otherwise(F.lit("")),
        ).alias("text"))


def q_substring_dedup(spark, sf_dir):
    """Exact-substring dedup (Lee et al. ExactSubstr), drop-every-copy
    mode: any 8-token run occurring ≥2 times corpus-wide (raw count —
    intra-doc repeats included) is removed everywhere via hash anchors +
    interval-union coverage. The oracle recomputes anchors, frequencies,
    marks, the coverage range-EXISTS, and reassembly independently."""
    d = _t(spark, sf_dir, "documents")
    return dedup.substring_dedup(_passage_docs(d), min_tokens=8,
                                 keep_first=False)


def q_substring_dedup_keep_first(spark, sf_dir):
    """ExactSubstr keep-one-copy variant: per repeated window key, the
    occurrence with the smallest (doc_id, position) anchors the surviving
    copy — deterministic (the keeper is a min, not a scan order)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.substring_dedup(_passage_docs(d), min_tokens=8,
                                 keep_first=True)


# corpus-tuned stop list: the synthetic vocabulary is OLAP words, so the
# English Gopher list would fail ~every doc on the stopword rule; a list
# drawn from the corpus's own function words keeps every rule non-vacuous
# in BOTH directions (the op default stays the published English list)
_GOPHER_QUERY_STOPWORDS = ["the", "a", "value", "row", "data", "query",
                           "hash", "scan"]
_BULLET_BLOCK = ("\n- item one\n- two like\n- three items\n- four more"
                 "\n- five it\n- six bullets\n- seven now\n- eight here"
                 "\n- nine list\n- ten end")
_ELLIPSIS_BLOCK = "\nto be continued...\nmore to come..."


def q_dedup_against(spark, sf_dir):
    """Cross-corpus exact dedup: the incremental-crawl pass — drop from
    the 'new snapshot' (all documents) everything the 'existing corpus'
    (documents with doc_id % 4 == 0, whitespace/case re-encoded to pin
    the normalized fingerprint semantics) already holds. The planted
    exact-dup clusters make the removal wider than the reference ids
    themselves."""
    d = _t(spark, sf_dir, "documents")
    reference = d.where(F.col("doc_id") % 4 == 0).select(
        F.upper(F.concat(F.lit("  "), F.col("text"), F.lit("  ")))
        .alias("text"))
    out = dedup.dedup_against(d, reference)
    return out.select("doc_id", "text")


def q_dedup_against_bloom(spark, sf_dir):
    """Same cross-corpus dedup through the Bloom pre-filter path
    (``pipeline/dedup.py::dedup_against`` with ``bloom_fpp``): rows whose
    k probe bits miss the reference bitmap bypass the anti-join shuffle;
    Bloom-positives go through the exact anti-join that corrects false
    positives. The RESULT is exact, so the oracle is identical to
    ``dedup_against`` — the driver's hash match pins that the lossy
    pre-filter lost nothing."""
    d = _t(spark, sf_dir, "documents")
    reference = d.where(F.col("doc_id") % 4 == 0).select(
        F.upper(F.concat(F.lit("  "), F.col("text"), F.lit("  ")))
        .alias("text"))
    out = dedup.dedup_against(d, reference, bloom_fpp=0.01)
    return out.select("doc_id", "text")


def q_gopher_rules(spark, sf_dir):
    """Gopher composite quality rules (word count / word length / symbol
    ratio / alpha words / stopword kinds / bullet + ellipsis line
    fractions) annotated per doc, with the ordered failed-rule list and
    the keep verdict. Planted bullet blocks (~1/11 of docs: 10 of 11
    lines bulleted > 0.9) and ellipsis blocks (~1/19: 2 of 3 lines > 0.3)
    de-vacuize the line rules; min_words=30 splits the natural length
    distribution. All signals are row-local codegen expressions — the
    oracle recomputes every rule independently."""
    d = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(did % 11 == F.lit(7), F.lit(_BULLET_BLOCK))
            .otherwise(F.lit("")),
            F.when(did % 19 == F.lit(3), F.lit(_ELLIPSIS_BLOCK))
            .otherwise(F.lit("")),
        ).alias("text"))
    out = text_ops.gopher_rules(planted, min_words=30,
                                stopwords=_GOPHER_QUERY_STOPWORDS)
    return out.select(
        "doc_id", "n_words", "mean_word_len", "symbol_ratio",
        "alpha_word_frac", "n_stop_kinds", "bullet_line_frac",
        "ellipsis_line_frac",
        F.array_join("reasons", ",").alias("reasons"), "keep")


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights toward the English slice of the corpus
    (hashed unigram+bigram bag models, add-1 smoothing over 4096
    buckets). Per-feature log-ratios are glibc-log micro-nat integers,
    so the per-doc sum is exact under any partitioning; the oracle
    recomputes features, counts, lambdas, and sums independently."""
    from json_schema_spark.pipeline import sampling
    d = _t(spark, sf_dir, "documents")
    return sampling.dsir_weights(d, d.where(F.col("lang") == "en"),
                                 n_buckets=4096)


def q_dsir_sample(spark, sf_dir):
    """DSIR end-to-end: weights (as in ``dsir_weights``) then Gumbel-top-k
    importance resampling of 500 docs — sampling without replacement with
    probability ∝ exp(logw). Deterministic across engines: md5-derived
    uniforms reduced to exactly-representable 52-bit doubles, scalar
    glibc-log Gumbel transform, one IEEE addition, TakeOrdered top-n.
    The oracle recomputes the whole chain including the noise."""
    from json_schema_spark.pipeline import sampling
    d = _t(spark, sf_dir, "documents")
    w = sampling.dsir_weights(d, d.where(F.col("lang") == "en"),
                              n_buckets=4096)
    return sampling.importance_sample(w, n=500, seed=17)


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled source mixing: the uniform 20-source corpus is
    re-tiered into a skewed web/books/code split (12/6/2 sources), then
    sampled at tau=0.5 with budget 400 — the sqrt scaling up-samples the
    small 'code' tier past its natural share AND the no-replacement cap
    binds on it (target 77 > n=50 at sf0.01), exercising both branches.
    One eager O(#sources) count pass, broadcast cuts join, row-local md5
    bucket cut."""
    from json_schema_spark.pipeline import sampling
    d = _t(spark, sf_dir, "documents")
    suffix = F.substring(F.col("source"), 4, 10).cast("int")
    tier = (F.when(suffix < 12, F.lit("web"))
            .when(suffix < 18, F.lit("books"))
            .otherwise(F.lit("code")))
    tiered = d.select("doc_id", tier.alias("mix_source"))
    out = sampling.temperature_mix(tiered, budget_docs=400, tau=0.5,
                                   source_col="mix_source")
    return out.select("doc_id", "mix_source")


def q_split_leakage(spark, sf_dir):
    """Eval-leakage QA: exact-duplicate fingerprints spanning 'train' and
    a holdout split of a hash_split. The corpus is the documents table
    plus a re-keyed copy of the doc_id %% 7 slice (new ids -> independent
    split assignment), modeling the classic failure of splitting a corpus
    that was deduplicated under a DIFFERENT key — the planted re-keys
    (and the corpus's own exact-dup clusters) make the check non-vacuous.
    One row-local fingerprint+split pass and one md5-keyed groupBy."""
    from json_schema_spark.pipeline import sampling
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rekeyed = (d.where(F.col("doc_id") % 7 == 0)
               .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000)))
    return sampling.split_leakage(d.unionByName(rekeyed))


def q_prototypicality(spark, sf_dir):
    """D4/SSL-prototypes pruning signal: exact cosine to the assigned
    coarse centroid + within-cluster percent_rank, so redundancy (near
    cluster cores) and outliers (far tails) can both be cut from one
    scored table. Fully deterministic (md5 centroid sample, integer dot
    products, (proto desc, id) tie-break) — the oracle recomputes
    centroids, assignment, and ranking independently."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.prototypicality(emb, n_centroids=16)


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 keyword retrieval (text.bm25_topk): top-200 docs for a
    4-term query. Model state (N, avgdl, per-term df) comes from one
    map-side-combined aggregate; scoring is row-local codegen feeding
    TakeOrdered. Score doubles hash-match the oracle bit-for-bit: glibc
    ln for idf, repr-embedded constants, one shared expression shape, and
    a fixed left-associated term sum."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.bm25_topk(d, _BM25_TERMS, n=200)


_BM25_TERMS = ["hash", "join", "spark", "vector"]


def q_kmeans_clusters(spark, sf_dir):
    """Distributed Lloyd k-means (similarity.kmeans): exact-integer
    centroid updates (cosine to a mean equals cosine to the integer SUM —
    the 1/count cancels — and the round-half-away integer mean keeps every
    later dot product bounded at any corpus size), md5-seeded round 0, two
    update rounds, assignment against the final centroids. The oracle
    replays every iteration in SQL — same lattice, same `//` rounding,
    same (ccos desc, cid) tie-break — and hash-matches the labels AND the
    final cosines."""
    emb = _t(spark, sf_dir, "embeddings")
    _cen, assign = similarity.kmeans(emb, k=8, n_iters=2)
    return assign


def q_pq_topk(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_topk): codebooks trained on
    a 60% md5 hash sample (the standard train-on-a-sample, encode-
    everything shape), the full corpus encoded to m=4 codes, ADC top-10
    for 8 md5-chosen queries via exact-integer lookup-table gathers and a
    sharded two-phase window. The oracle replays the entire pipeline —
    sample, per-subspace integer-L2 Lloyd round, argmin codes, tables —
    and the score doubles hash-match (one IEEE division at the end)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.pq_topk(emb, k=10, n_queries=8, m=4, k_sub=16,
                              n_iters=1, train_fraction=0.6)


def q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN (similarity.ivfpq_topk): md5-sampled coarse cells bound
    WHICH rows are scored (nprobe=4 of 16 lists), PQ codes bound what a
    scored row costs (ADC table gathers) — the composition production
    vector search deploys at 10^11 vectors. Oracle replays cells, probes,
    codebooks, codes, and tables; score doubles hash-match."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.ivfpq_topk(emb, k=10, n_queries=8, n_cells=16,
                                 nprobe=4, m=4, k_sub=16, n_iters=1,
                                 train_fraction=0.6)


def q_bpe_merges(spark, sf_dir):
    """BPE tokenizer training (text.bpe_train): 12 merge rules learned
    from the documents corpus — one corpus-scale word-frequency shuffle,
    then vocab-sized rounds (weighted pair-count argmax + greedy
    left-to-right Arrow merge pass). The oracle replays every round with
    a list_reduce fold and hash-matches ranks, pairs, and counts."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.bpe_train(d, n_merges=12)


def q_bpe_token_stats(spark, sf_dir):
    """Corpus-trained BPE applied back to the corpus
    (text.bpe_encode_stats): per-doc BPE token + char counts via a
    broadcast vocab join — the corpus pass never runs Python. The oracle
    replays the merge rounds and the per-doc sums hash-match."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.bpe_encode_stats(d, n_merges=12)


def q_bigram_nll(spark, sf_dir):
    """Perplexity-style LM quality scoring (text.bigram_nll): per-doc
    average negative log-likelihood under an add-1 bigram LM trained on
    the English sub-corpus (CCNet shape: trusted-domain LM scores the
    whole crawl; cross-language docs land in the high-nll tail). glibc-ln
    micro-nat lattice -> exact integer sums; oracle hash-matches."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.bigram_nll(d, reference=d.where(F.col("lang") == "en"))


def q_tfidf_terms(spark, sf_dir):
    """Per-doc keyword extraction (text.tfidf_topk_terms): top-5 terms by
    tf x micro-nat idf — the ranking is pure bigint (glibc-ln idf on the
    dsir lattice, once per distinct term), so the oracle hash-matches
    with no float anywhere in the ordering."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.tfidf_topk_terms(d, j=5)


def q_char_entropy(spark, sf_dir):
    """Character-distribution entropy (text.char_entropy): the junk/
    binary/padding detector next to the Gopher rules. Both ln families
    are micro-nat quantized once per DISTINCT count value, so per-doc
    sums are exact integers and the oracle hash-matches."""
    d = _t(spark, sf_dir, "documents")
    return text_ops.char_entropy(d)


def q_quality_corpus(spark, sf_dir):
    """Round-5 quality composition (the CCNet/Gopher-style pre-dedup
    gauntlet): Gopher rules AND a character-entropy band AND a bigram-LM
    perplexity cut, survivors assigned reproducible train/val/test
    splits. Every stage binds at sf0.01 (gopher drops ~21%, entropy >=2.8
    ~40%, avg_nll <=3.45 ~60%); the oracle recomputes the ENTIRE chain —
    all three model pipelines plus the md5 split buckets."""
    d = _t(spark, sf_dir, "documents")
    from json_schema_spark.pipeline import sampling

    g = text_ops.gopher_rules(
        d, min_words=30,
        stopwords=_GOPHER_QUERY_STOPWORDS).select("doc_id", "keep")
    e = text_ops.char_entropy(d).select("doc_id", "entropy")
    p = (text_ops.bigram_nll(d, reference=d.where(F.col("lang") == "en"))
         .select("doc_id", "avg_nll"))
    surv = (d.select("doc_id", "lang")
            .join(g, "doc_id").join(e, "doc_id").join(p, "doc_id")
            .where(F.col("keep") & (F.col("entropy") >= F.lit(2.8))
                   & (F.col("avg_nll") <= F.lit(3.45)))
            .select("doc_id", "lang"))
    return (sampling.hash_split(surv, {"train": 0.8, "val": 0.1,
                                       "test": 0.1})
            .select("doc_id", "lang", "split"))


def q_intra_line_dedup(spark, sf_dir):
    """WITHIN-document duplicate-line removal (dedup.intra_doc_line_dedup,
    the RefinedWeb intra-doc pass). Construction plants an intra-doc
    repeat of the first body line (~1/5 of docs, must be removed) and a
    duplicated short '--' separator (~1/4, immune at min_line_chars=5,
    must survive twice). The oracle replays the construction and the
    keeper/immunity/reassembly logic independently."""
    d = _t(spark, sf_dir, "documents")
    did, t = F.col("doc_id"), F.col("text")
    m = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring(t, 1, 60),
            F.when(did % 4 == F.lit(0), F.lit("--")),
            F.substring(t, 61, 60),
            F.when(did % 4 == F.lit(0), F.lit("--")),
            F.substring(t, 121, 60),
            F.when(did % 5 == F.lit(1), F.substring(t, 1, 60)),
        ).alias("text"))
    return dedup.intra_doc_line_dedup(m, min_line_chars=5)


def q_asof_click_before_purchase(spark, sf_dir):
    """As-of join: each purchase event picks up the most recent click value
    at-or-before its timestamp for the same user (union + running-last
    window — one shuffle, no range-join fan-out). Oracle: DuckDB's native
    ASOF LEFT JOIN, an independent engine implementation of the same
    semantics.

    Deterministically planted NULL click values (~1/7 of right rows, 306
    of 1981 purchases match one at sf0.01) pin the ROW-LEVEL carry
    semantics: a matched row's NULL must come through as NULL, not be
    papered over by an older row's value (ADVICE r3 medium — a per-column
    last(ignorenulls) carry red-hashes here). floor() before the bigint
    cast keeps the NULL-planting arithmetic engine-portable (DuckDB
    rounds double→bigint casts, Spark truncates)."""
    e = _t(spark, sf_dir, "events")
    left = (e.where(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "value"))
    cv = F.max("value")
    right = (e.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.when(F.floor(cv * 100).cast("bigint") % 7 == 0,
                         F.lit(None).cast("double"))
                  .otherwise(cv).alias("click_value")))
    out = asof.asof_join(left, right, on="user_id", ts="ts",
                         right_value_cols=["click_value"])
    return out.select("event_id", "user_id", "value",
                      F.col("click_value_asof"))


def q_asof_skew_buckets(spark, sf_dir):
    """The SAME as-of semantics through the two-phase bucketed carry
    (``skew_buckets=8`` — r5 hot-key mitigation: per-(key, time-bucket)
    windows + a boundary fix-up, so one pathological key parallelizes
    instead of serializing into one task). Shares the plain path's DuckDB
    ASOF LEFT JOIN oracle: the driver gate pins that the bucketed path is
    bit-identical, not just pytest-parity."""
    e = _t(spark, sf_dir, "events")
    left = (e.where(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "ts", "value"))
    cv = F.max("value")
    right = (e.where(F.col("event_type") == "click")
             .groupBy("user_id", "ts")
             .agg(F.when(F.floor(cv * 100).cast("bigint") % 7 == 0,
                         F.lit(None).cast("double"))
                  .otherwise(cv).alias("click_value")))
    out = asof.asof_join(left, right, on="user_id", ts="ts",
                         right_value_cols=["click_value"], skew_buckets=8)
    return out.select("event_id", "user_id", "value",
                      F.col("click_value_asof"))


def q_minhash_lsh_candidates(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(d, n=3, num_hashes=8, bands=4)


def q_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d)


def q_simhash_near_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    # max_hamming=8 -> 9 bands of 6-7 bits: bucket values are selective, so
    # the band join fans out per near-collision instead of per band-octant
    # (max_hamming=20 means 21 bands of <3 bits -> 8-way buckets -> the
    # band join degenerates toward all-pairs)
    return dedup.simhash_near_pairs(d, max_hamming=8)


def q_deep_validate_props(spark, sf_dir):
    """Deep mode (iterative dataflow) over the events props JSON — same
    verdict surface as the columnar engine."""
    from pyspark.sql import functions as F

    from json_schema_spark.deep import DeepValidator

    events = _t(spark, sf_dir, "events").orderBy("event_id").limit(2000)
    df = events.withColumn("v", F.parse_json("props"))
    out = DeepValidator(spark, PROPS_SCHEMA).validate(df, "v", "event_id")
    return out.select(F.col("doc_id").alias("event_id"), "is_valid")


def q_detect_mode(spark, sf_dir):
    """Schema-validates-schema (the reference CLI's -d mode): deterministic
    mutations of events rows into schema documents — some ill-typed — are
    validated against the draft-4 meta-schema. ref-depth 1 suffices for the
    constructs used (type/minProperties/uniqueItems/maxLength resolve within
    one $ref hop) and was verified to give the true metaschema verdicts."""
    from json_schema_spark.engine import ValidationEngine
    from json_schema_spark.metaschema import DRAFT4_META_SCHEMA

    events = _t(spark, sf_dir, "events").orderBy("event_id").limit(500)
    k = F.get_json_object("props", "$.k").cast("long")
    doc = (
        F.when(k % 4 == 0, F.concat(F.lit('{"type": "object", "minProperties": '),
                                    k.cast("string"), F.lit('}')))
        .when(k % 4 == 1, F.lit('{"type": 12}'))
        .when(k % 4 == 2, F.lit('{"type": ["string", "nope"]}'))
        .otherwise(F.concat(F.lit('{"uniqueItems": true, "maxLength": '),
                            k.cast("string"), F.lit('}')))
    )
    df = events.select("event_id", doc.alias("schema_doc"))
    engine = ValidationEngine(spark, max_ref_depth=1)
    res = engine.validate_json(df, "schema_doc", DRAFT4_META_SCHEMA,
                               id_cols=["event_id"])
    return res.annotated.select("event_id", "is_valid")


def q_drift_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    ref = e.where(F.col("event_type") == "click").select("value")
    cur = e.where(F.col("event_type") == "purchase").select("value")
    rep = drift_report(ref, cur, "value", bins=64)
    return spark.createDataFrame(
        [(rep["column"], rep["n_reference"], rep["n_current"],
          round(rep["ks_statistic"], 6), round(rep["psi"], 6))],
        "column string, n_reference long, n_current long, ks double, psi double",
    )


def q_drift_events_tdigest(spark, sf_dir):
    """KS/PSI drift via the DETERMINISTIC t-digest sketch path (round-2
    VERDICT #10): values hash-bucket into a fixed 32-partition layout,
    sort within buckets, compress on an exact per-value schedule, and merge
    in bucket order — a pure function of the value multiset, verified
    bit-identical across parallelism levels, input layouts, and Arrow
    batch sizes (tests/test_tdigest.py). That determinism is what lets the
    oracle pin exact expected values; accuracy vs the exact histogram path
    is asserted separately in pytest (KS within 0.05)."""
    from json_schema_spark.checks.drift import drift_report_tdigest

    e = _t(spark, sf_dir, "events")
    r = drift_report_tdigest(
        e.where(F.col("event_type") == "click").select("value"),
        e.where(F.col("event_type") == "purchase").select("value"),
        "value", compression=100)
    row = [(int(r["n_reference"]), int(r["n_current"]),
            round(r["ks_statistic"], 6), round(r["psi"], 6),
            round(r["quantiles_reference"][0.5], 6),
            round(r["quantiles_current"][0.5], 6),
            round(r["quantiles_reference"][0.99], 6))]
    return spark.createDataFrame(
        row, "n_reference bigint, n_current bigint, ks_r6 double, "
             "psi_r6 double, med_ref_r6 double, med_cur_r6 double, "
             "p99_ref_r6 double")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_verdicts": q_validate_verdicts,
        "validate_violations": q_validate_violations,
        "validate_props_json": q_validate_props_json,
        "scaffold_violations": q_scaffold_violations,
        "validation_summary": q_validation_summary,
        "duplicate_line_orders": q_duplicate_line_orders,
        "customers_without_orders": q_customers_without_orders,
        "lineitem_stats": q_lineitem_stats,
        "pricing_summary": q_pricing_summary,
        "pricing_rollup": q_pricing_rollup,
        "user_set_ops": q_user_set_ops,
        "top_customers_per_segment": q_top_customers_per_segment,
        "revenue_by_nation": q_revenue_by_nation,
        "user_sessions": q_user_sessions,
        "event_windows": q_event_windows,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "lang_distribution": q_lang_distribution,
        "lang_id": q_lang_id,
        "doc_fingerprints": q_doc_fingerprints,
        "bpe_token_counts": q_bpe_token_counts,
        "winnow_fingerprints": q_winnow_fingerprints,
        "exact_dup_clusters": q_exact_dup_clusters,
        "minhash_signatures": q_minhash_signatures,
        "jaccard_pairs": q_jaccard_pairs,
        "knn_cosine": q_knn_cosine,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "minhash_lsh_candidates": q_minhash_lsh_candidates,
        "simhash": q_simhash,
        "simhash_near_pairs": q_simhash_near_pairs,
        "drift_events": q_drift_events,
        "drift_events_tdigest": q_drift_events_tdigest,
        "duplicate_clusters": q_duplicate_clusters,
        "dedup_lines": q_dedup_lines,
        "dedup_lines_keep_first": q_dedup_lines_keep_first,
        "substring_dedup": q_substring_dedup,
        "substring_dedup_keep_first": q_substring_dedup_keep_first,
        "prototypicality": q_prototypicality,
        "kmeans_clusters": q_kmeans_clusters,
        "bm25_topk": q_bm25_topk,
        "pq_topk": q_pq_topk,
        "ivfpq_topk": q_ivfpq_topk,
        "bpe_merges": q_bpe_merges,
        "bpe_token_stats": q_bpe_token_stats,
        "bigram_nll": q_bigram_nll,
        "tfidf_terms": q_tfidf_terms,
        "char_entropy": q_char_entropy,
        "quality_corpus": q_quality_corpus,
        "intra_line_dedup": q_intra_line_dedup,
        "dsir_weights": q_dsir_weights,
        "dsir_sample": q_dsir_sample,
        "split_leakage": q_split_leakage,
        "temperature_mix": q_temperature_mix,
        "token_stats": q_token_stats,
        "dedup_against": q_dedup_against,
        "dedup_against_bloom": q_dedup_against_bloom,
        "gopher_rules": q_gopher_rules,
        "semantic_dedup": q_semantic_dedup,
        "asof_click_before_purchase": q_asof_click_before_purchase,
        "asof_skew_buckets": q_asof_skew_buckets,
        "token_heavy_hitters": q_token_heavy_hitters,
        "quantity_quantiles": q_quantity_quantiles,
        "pii_redaction": q_pii_redaction,
        "doc_chunks": q_doc_chunks,
        "ngram_repetition": q_ngram_repetition,
        "curated_corpus": q_curated_corpus,
        "contamination": q_contamination,
        "stratified_sample": q_stratified_sample,
        "packed_sequences": q_packed_sequences,
        "classifier_scores": q_classifier_scores,
        "domain_budget_sample": q_domain_budget_sample,
        "train_val_split": q_train_val_split,
        "deep_validate_props": q_deep_validate_props,
        "detect_mode": q_detect_mode,
    }


# --- DuckDB oracles -----------------------------------------------------------

_VALID_COND = """(
    doc_id >= 0
    AND length(text) >= 50 AND length(text) <= 500
    AND lang IN ('de','en','es','fr','zh')
    AND regexp_matches(source, '^src[0-9]+$')
    AND n_chars >= 0 AND n_chars <= 10000
)"""

_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"

_LANG_HITS = {
    "en": "['the','a','of','and','to']",
    "de": "['der','die','und','das','ist']",
    "es": "['el','la','de','que','y']",
    "fr": "['le','la','et','les','des']",
}

_MINHASH_PERMS = "(VALUES (0, 1299721, 7), (1, 15485863, 11), (2, 32452843, 13), (3, 49979687, 17)) AS perms(perm, a, b)"
_MINHASH_PERMS8 = ("(VALUES (0, 1299721, 7), (1, 15485863, 11), (2, 32452843, 13), (3, 49979687, 17), "
                   "(4, 67867967, 19), (5, 86028121, 23), (6, 104395301, 29), (7, 122949823, 31)) "
                   "AS perms(perm, a, b)")

# portable 60-bit md5-prefix hash (== json_schema_spark.pipeline.dedup.md5_int)
_MD5_INT = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"

# SimHash signatures, bit-identical to pipeline.dedup.simhash (60 bits,
# word 3-gram shingle features — see dedup.simhash's homogeneity rationale)
_SIMHASH_SIG_CTE = f"""
toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
shs AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle
        FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 2)) AS i) idx),
th AS (SELECT doc_id, {_MD5_INT.format(x='shingle')} AS h FROM shs),
bitsum AS (
    SELECT doc_id, bs.b AS b,
           sum(CASE WHEN ((h >> bs.b) & 1) = 1 THEN 1 ELSE -1 END) AS s
    FROM th CROSS JOIN (SELECT unnest(range(60)) AS b) bs
    GROUP BY doc_id, bs.b
),
sig AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id
)
"""

_SHINGLES_CTE = f"""
toks AS (
    SELECT doc_id, {_TOKENS} AS l FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, array_to_string(l[i:i+2], ' ') AS shingle
    FROM toks, LATERAL (SELECT unnest(generate_series(1, len(l) - 2)) AS i) idx
)
"""


def _lsh_topk_oracle(planes: int = 6, seed: int = 42, k: int = 5,
                     bands: int = 4) -> str:
    """DuckDB replica of similarity.lsh_topk: md5-derived ±1 hyperplane
    signs over the integer-quantized vector (band b = global plane indices
    [b·planes, (b+1)·planes)) — exact integer projections, so buckets match
    Spark's bit-for-bit; candidates from ANY shared band bucket."""
    sign = ("(CASE WHEN CAST(concat('0x', substr(md5(concat('hp_{seed}_{p}_', i - 1)), 1, 15)) AS BIGINT)"
            " % 2 = 0 THEN 1 ELSE -1 END)")
    projs = ",\n                   ".join(
        "list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * "
        + sign.format(seed=seed, p=p) + f")) AS s{p}"
        for p in range(bands * planes)
    )
    # integer bucket = the band's sign-bit row read as binary (bit j of
    # band b weighs 2^(planes-1-j)) — mirrors similarity._bands_udf
    band_rows = ",\n                ".join(
        "({b}, {bits})".format(
            b=b,
            bits=" + ".join(
                f"CASE WHEN s{b * planes + j} >= 0 "
                f"THEN {1 << (planes - 1 - j)} ELSE 0 END"
                for j in range(planes)))
        for b in range(bands)
    )
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
            FROM embeddings
        ),
        proj AS (
            SELECT vec_id, qv,
                   {projs}
            FROM v
        ),
        banded AS (
            SELECT p.vec_id, bb.band, bb.bucket
            FROM proj p, LATERAL (
                SELECT * FROM (VALUES
                {band_rows}) AS t(band, bucket)
            ) bb
        ),
        pairs AS (
            SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket
             AND a.vec_id <> b.vec_id
        ),
        cand AS (
            SELECT c.query_id, c.neighbor_id,
                   CAST(list_sum(list_transform(range(1, len(va.qv) + 1),
                        i -> va.qv[i] * vb.qv[i])) AS DOUBLE)
                   / sqrt(CAST(list_sum(list_transform(va.qv, x -> x * x))
                          * list_sum(list_transform(vb.qv, x -> x * x)) AS DOUBLE)) AS cosine
            FROM pairs c
            JOIN v va ON va.vec_id = c.query_id
            JOIN v vb ON vb.vec_id = c.neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, neighbor_id) AS rank
            FROM cand
        )
        SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine_r6
        FROM ranked WHERE rank <= {k}
    """


def _lsh_near_dup_oracle(bands: int = 8, planes_per_band: int = 6,
                         seed: int = 42, threshold: float = 0.9) -> str:
    """DuckDB replica of similarity.embedding_near_dups: OR-amplified
    multi-band hyperplane LSH (band b = global plane indices [b·r,(b+1)·r),
    identical md5 sign derivation) over the corpus + the entry's planted
    near-dups, thresholded exact-cosine pair output."""
    sign = ("(CASE WHEN CAST(concat('0x', substr(md5(concat('hp_{seed}_{p}_', i - 1)), 1, 15)) AS BIGINT)"
            " % 2 = 0 THEN 1 ELSE -1 END)")
    projs = ",\n                   ".join(
        "list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * "
        + sign.format(seed=seed, p=p) + f")) AS s{p}"
        for p in range(bands * planes_per_band)
    )
    band_rows = ",\n                ".join(
        "({b}, {bits})".format(
            b=b,
            bits=" + ".join(
                f"CASE WHEN s{b * planes_per_band + j} >= 0 "
                f"THEN {1 << (planes_per_band - 1 - j)} ELSE 0 END"
                for j in range(planes_per_band)))
        for b in range(bands)
    )
    return f"""
        WITH emb2 AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000,
                   list_concat(
                       [CAST(CAST(embedding[1] AS DOUBLE) + 0.015625 AS FLOAT)],
                       embedding[2:]) AS embedding
            FROM embeddings WHERE vec_id % 100 = 3
        ),
        v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
            FROM emb2
        ),
        proj AS (SELECT vec_id, qv, {projs} FROM v),
        banded AS (
            SELECT p.vec_id, p.qv, bb.band, bb.bucket
            FROM proj p, LATERAL (
                SELECT * FROM (VALUES
                {band_rows}) AS t(band, bucket)
            ) bb
        ),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        ),
        pairs AS (
            SELECT c.id_a, c.id_b,
                   CAST(list_sum(list_transform(range(1, len(va.qv) + 1),
                        i -> va.qv[i] * vb.qv[i])) AS DOUBLE)
                   / sqrt(CAST(list_sum(list_transform(va.qv, x -> x * x))
                          * list_sum(list_transform(vb.qv, x -> x * x)) AS DOUBLE)) AS cosine
            FROM cand c
            JOIN v va ON va.vec_id = c.id_a
            JOIN v vb ON vb.vec_id = c.id_b
        )
        SELECT id_a, id_b, round(cosine, 6) AS cosine_r6
        FROM pairs WHERE cosine >= {threshold}
    """


def _winnow_oracle(k: int = 8, window: int = 4) -> str:
    """DuckDB replica of text.winnow_fingerprints: identical polynomial
    coefficients (257^(k-1-j) mod 2^31-1), identical window min/tie rule."""
    p = 2_147_483_647
    coeffs = [pow(257, k - 1 - j, p) for j in range(k)]
    terms = " + ".join(
        f"ascii(substr(s, i + {j}, 1)) * CAST({c} AS BIGINT)"
        for j, c in enumerate(coeffs))
    return f"""
        WITH norm AS (
            SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
            FROM documents
        ),
        grams AS (
            SELECT doc_id, i AS pos, ({terms}) % {p} AS h
            FROM norm, LATERAL (SELECT unnest(generate_series(1, len(s) - {k} + 1)) AS i) ii
            WHERE len(s) >= {k}
        ),
        win AS (
            SELECT doc_id,
                   min(struct_pack(h := h, pos := pos)) OVER
                       (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS m,
                   count(*) OVER
                       (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS wn
            FROM grams
        )
        SELECT DISTINCT doc_id, m.h AS fp, m.pos AS pos FROM win WHERE wn = {window}
    """


def _line_dedup_oracle(keep_first: bool, min_line_chars: int = 5,
                       max_doc_freq: int = 1) -> str:
    """DuckDB replica of dedup.line_dedup over the same deterministic
    multi-line construction as _multiline_docs (identical substr windows
    and CASE plants). Frequencies, keeper selection (row_number over
    (doc_id, pos) == arg-min), marking, and ordered reassembly are all
    recomputed independently; a fully-removed document must come back as
    '' (coalesce over the FILTERed string_agg — Spark's empty array_join)."""
    not_first = "AND rk.rk > 1 " if keep_first else ""
    return f"""
        WITH base AS (
            SELECT doc_id, concat_ws(chr(10),
                substr(text, 1, 60),
                CASE WHEN doc_id % 7 = 2 THEN '{_BOILER_NEWSLETTER}' END,
                substr(text, 61, 60),
                CASE WHEN doc_id % 3 = 0 THEN '{_BOILER_FOOTER}' END,
                substr(text, 121, 60)) AS text
            FROM documents
        ),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM base),
        ln AS (SELECT doc_id, i AS pos, lines[i + 1] AS line
               FROM ls, LATERAL (SELECT unnest(range(len(lines))) AS i) ii),
        el AS (SELECT doc_id, pos, trim(line) AS key FROM ln
               WHERE length(trim(line)) >= {min_line_chars}),
        freq AS (SELECT key, count(DISTINCT doc_id) AS dfreq
                 FROM el GROUP BY key),
        rk AS (SELECT doc_id, pos, key,
                      row_number() OVER (PARTITION BY key
                                         ORDER BY doc_id, pos) AS rk
               FROM el),
        mk AS (
            SELECT ln.doc_id, ln.pos, ln.line,
                   CASE WHEN f.dfreq > {max_doc_freq} {not_first}
                        THEN 1 ELSE 0 END AS rm
            FROM ln
            LEFT JOIN rk ON rk.doc_id = ln.doc_id AND rk.pos = ln.pos
            LEFT JOIN freq f ON f.key = rk.key
        )
        SELECT doc_id, count(*) AS n_lines,
               CAST(sum(rm) AS BIGINT) AS n_removed,
               coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE rm = 0), '') AS text
        FROM mk GROUP BY doc_id
    """


def _substring_dedup_oracle(keep_first: bool, min_tokens: int = 8) -> str:
    """DuckDB replica of dedup.substring_dedup over the same deterministic
    passage plants as _passage_docs. Anchors (md5 of the space-joined
    token window), raw occurrence counts, keeper selection (row_number
    over (doc_id, apos) == arg-min), interval coverage (a token is removed
    iff a marked anchor starts within the trailing window — the
    range-EXISTS form of the Spark side's difference array), and ordered
    reassembly are all recomputed independently."""
    L = min_tokens
    not_first = "AND rk > 1" if keep_first else ""
    return f"""
        WITH base AS (
            SELECT doc_id, concat(text,
                CASE WHEN doc_id % 5 = 1
                     THEN ' {_PASSAGE_LONG}' ELSE '' END,
                CASE WHEN doc_id % 13 = 4
                     THEN ' {_PASSAGE_SHORT} {_PASSAGE_SHORT}'
                     ELSE '' END) AS text
            FROM documents
        ),
        ds AS (SELECT doc_id, string_split(text, ' ') AS toks FROM base),
        anch AS (
            SELECT doc_id, i AS apos,
                   md5(array_to_string(toks[i + 1 : i + {L}], ' ')) AS key
            FROM ds, LATERAL (SELECT unnest(range(len(toks) - {L} + 1))
                              AS i) ii
            WHERE len(toks) >= {L}
        ),
        rk AS (
            SELECT doc_id, apos,
                   count(*) OVER (PARTITION BY key) AS cnt,
                   row_number() OVER (PARTITION BY key
                                      ORDER BY doc_id, apos) AS rk
            FROM anch
        ),
        marked AS (SELECT doc_id, apos FROM rk
                   WHERE cnt >= 2 {not_first}),
        tok AS (SELECT doc_id, i AS pos, toks[i + 1] AS tok
                FROM ds, LATERAL (SELECT unnest(range(len(toks))) AS i) ii),
        cov AS (
            SELECT t.doc_id, t.pos, t.tok,
                   EXISTS (SELECT 1 FROM marked m
                           WHERE m.doc_id = t.doc_id
                             AND m.apos BETWEEN t.pos - {L - 1} AND t.pos)
                   AS rm
            FROM tok t
        )
        SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
               CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS INT) AS n_removed,
               coalesce(string_agg(tok, ' ' ORDER BY pos)
                        FILTER (WHERE NOT rm), '') AS text
        FROM cov GROUP BY doc_id
    """


def _semantic_dedup_oracle(n_centroids: int = 16, threshold: float = 0.9,
                           seed: int = 42) -> str:
    """DuckDB replica of similarity.semantic_dedup over the planted corpus:
    the ivf_topk oracle's centroid sample + exact-integer coarse
    assignment, within-cluster exact-cosine pairs, recursive-CTE closure
    (the duplicate_clusters oracle's pattern), rep = component min."""
    return f"""
        WITH RECURSIVE emb2 AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000,
                   list_concat(
                       [CAST(CAST(embedding[1] AS DOUBLE) + 0.015625 AS FLOAT)],
                       embedding[2:]) AS embedding
            FROM embeddings WHERE vec_id % 100 = 3
        ),
        b AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
            FROM emb2
        ),
        bn AS (
            SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS nrm,
                   CAST(concat('0x', substr(md5(concat('ivf_{seed}_',
                        CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) AS r
            FROM b
        ),
        cen AS (
            SELECT row_number() OVER (ORDER BY r, vec_id) AS cid,
                   qv AS cv, nrm AS cn
            FROM (SELECT * FROM bn ORDER BY r, vec_id LIMIT {n_centroids})
        ),
        scored AS (
            SELECT bn.vec_id, cen.cid,
                   CAST(list_sum(list_transform(range(1, len(bn.qv) + 1),
                        i -> bn.qv[i] * cen.cv[i])) AS DOUBLE)
                   / sqrt(CAST(bn.nrm * cen.cn AS DOUBLE)) AS ccos
            FROM bn CROSS JOIN cen
        ),
        rankedc AS (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, cid) AS rk
            FROM scored
        ),
        assign AS (SELECT vec_id, cid FROM rankedc WHERE rk = 1),
        cand AS (
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b
            FROM assign a JOIN assign b2
              ON a.cid = b2.cid AND a.vec_id < b2.vec_id
        ),
        prs AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN bn va ON va.vec_id = c.id_a
            JOIN bn vb ON vb.vec_id = c.id_b
            WHERE CAST(list_sum(list_transform(range(1, len(va.qv) + 1),
                       i -> va.qv[i] * vb.qv[i])) AS DOUBLE)
                  / sqrt(CAST(va.nrm * vb.nrm AS DOUBLE)) >= {threshold}
        ),
        verts AS (SELECT id_a AS id FROM prs UNION SELECT id_b FROM prs),
        edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                  UNION SELECT id_b, id_a FROM prs),
        reach AS (
            SELECT id, id AS label FROM verts
            UNION
            SELECT e.dst AS id, r.label
            FROM edges e JOIN reach r ON r.id = e.src
        ),
        lab AS (SELECT id, min(label) AS rep FROM reach GROUP BY id)
        SELECT a.vec_id, CAST(a.cid AS INT) AS cid,
               CAST(coalesce(l.rep, a.vec_id) AS BIGINT) AS rep_id,
               coalesce(l.rep, a.vec_id) = a.vec_id AS keep
        FROM assign a LEFT JOIN lab l ON l.id = a.vec_id
    """


def _dedup_against_oracle() -> str:
    """DuckDB replica of dedup.dedup_against with the re-encoded %4
    reference: both sides' normalized fingerprints recomputed
    independently, removal via NOT IN (an anti-join)."""
    return """
        WITH fp AS (
            SELECT doc_id, text,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS f
            FROM documents
        ),
        ref AS (
            SELECT DISTINCT
                   md5(regexp_replace(lower(trim(
                       upper(concat('  ', text, '  ')))), '\\s+', ' ', 'g'))
                       AS f
            FROM documents WHERE doc_id % 4 = 0
        )
        SELECT doc_id, text FROM fp
        WHERE f NOT IN (SELECT f FROM ref)
    """


def _gopher_oracle(min_words: int = 30, plant: bool = True) -> str:
    """DuckDB replica of text.gopher_rules over the same planted bullet /
    ellipsis blocks (``plant=False`` scores the raw corpus — the
    quality_corpus composition's shape). Every signal is recomputed
    independently (list ops instead of the Spark side's lookaround
    regexp_counts where RE2 lacks lookbehind); same rule order, same
    comma-joined reasons string."""
    sw = ", ".join(f"'{w}'" for w in _GOPHER_QUERY_STOPWORDS)
    bullet_sql = _BULLET_BLOCK.replace("\n", "' || chr(10) || '")
    ellipsis_sql = _ELLIPSIS_BLOCK.replace("\n", "' || chr(10) || '")
    base = f"""concat(text,
                CASE WHEN doc_id % 11 = 7
                     THEN '{bullet_sql}' ELSE '' END,
                CASE WHEN doc_id % 19 = 3
                     THEN '{ellipsis_sql}' ELSE '' END)""" if plant else "text"
    return f"""
        WITH base AS (
            SELECT doc_id, {base} AS text
            FROM documents
        ),
        sig AS (
            SELECT doc_id, text,
                regexp_split_to_array(lower(trim(text)), '\\s+') AS ltoks,
                length(regexp_replace(trim(text), '\\s+', '', 'g'))
                    AS tok_chars,
                len(string_split(text, chr(10))) AS n_lines
            FROM base
        ),
        m AS (
            SELECT doc_id,
                len(ltoks) AS n_words,
                CAST(tok_chars AS DOUBLE) / len(ltoks) AS mean_word_len,
                CAST(len(regexp_extract_all(text, '#|\\.\\.\\.|…'))
                     AS DOUBLE) / len(ltoks) AS symbol_ratio,
                CAST(len(list_filter(ltoks,
                         t -> regexp_matches(t, '[a-z]')))
                     AS DOUBLE) / len(ltoks) AS alpha_word_frac,
                len(list_intersect(list_distinct(ltoks), [{sw}]))
                    AS n_stop_kinds,
                CAST(len(regexp_extract_all(text, '(?m)^[ \\t]*[-*•]'))
                     AS DOUBLE) / n_lines AS bullet_line_frac,
                CAST(len(regexp_extract_all(text, '(?m)(?:\\.\\.\\.|…)$'))
                     AS DOUBLE) / n_lines AS ellipsis_line_frac
            FROM sig
        ),
        r AS (
            SELECT *, list_filter([
                CASE WHEN n_words < {min_words} OR n_words > 100000
                     THEN 'word_count' END,
                CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
                     THEN 'word_length' END,
                CASE WHEN symbol_ratio > 0.1 THEN 'symbol_ratio' END,
                CASE WHEN alpha_word_frac < 0.8 THEN 'alpha_words' END,
                CASE WHEN n_stop_kinds < 2 THEN 'stopwords' END,
                CASE WHEN bullet_line_frac > 0.9 THEN 'bullet_lines' END,
                CASE WHEN ellipsis_line_frac > 0.3
                     THEN 'ellipsis_lines' END
            ], x -> x IS NOT NULL) AS reasons
            FROM m
        )
        SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
               symbol_ratio, alpha_word_frac,
               CAST(n_stop_kinds AS INT) AS n_stop_kinds,
               bullet_line_frac, ellipsis_line_frac,
               coalesce(array_to_string(reasons, ','), '') AS reasons,
               len(reasons) = 0 AS keep
        FROM r
    """


def _dsir_oracle(n_buckets: int = 4096, alpha: float = 1.0) -> str:
    """DuckDB replica of sampling.dsir_weights with target = lang='en'.
    Feature hashing (md5 % B with per-order domain tags), add-alpha
    smoothed per-feature lambdas in the EXACT log-difference expression
    shape the Spark side uses ((ln(c+a)-ln(D+aB)) - (...)), micro-nat
    quantization (round half away from zero), exact integer per-doc sums,
    one final double division. glibc ln == CPython math.log bit-for-bit
    (verified), which is what makes the hash comparison exact."""
    a = alpha
    aB = alpha * n_buckets
    return f"""
        WITH tok AS (SELECT doc_id, lang, {_TOKENS} AS toks FROM documents),
        uf AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(md5(concat('dsir_u_', toks[i])),
                        1, 15)) AS BIGINT) % {n_buckets} AS bucket
            FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks)))
                               AS i) ii
        ),
        bf AS (
            SELECT doc_id, lang,
                   CAST(concat('0x', substr(md5(concat('dsir_b_', toks[i],
                        ' ', toks[i + 1])), 1, 15)) AS BIGINT)
                   % {n_buckets} AS bucket
            FROM tok, LATERAL (SELECT unnest(generate_series(1, len(toks) - 1))
                               AS i) ii
            WHERE len(toks) >= 2
        ),
        feat AS (SELECT * FROM uf UNION ALL SELECT * FROM bf),
        docfeat AS (SELECT doc_id, bucket, count(*) AS c
                    FROM feat GROUP BY doc_id, bucket),
        cr AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cr
               FROM docfeat GROUP BY bucket),
        ct AS (SELECT bucket, count(*) AS ct FROM feat
               WHERE lang = 'en' GROUP BY bucket),
        tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM docfeat) AS dr,
                       (SELECT count(*) FROM feat WHERE lang = 'en') AS dt),
        lam AS (
            SELECT cr.bucket,
                   CAST(round((
                       (ln(CAST(coalesce(ct.ct, 0) AS DOUBLE) + {a!r})
                        - ln(CAST(tot.dt AS DOUBLE) + {aB!r}))
                       - (ln(CAST(cr.cr AS DOUBLE) + {a!r})
                          - ln(CAST(tot.dr AS DOUBLE) + {aB!r}))
                   ) * 1e9) AS BIGINT) AS lam
            FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tot
        )
        SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_feats,
               CAST(CAST(sum(d.c * l.lam) AS BIGINT) AS DOUBLE) / 1e9
                   AS logw
        FROM docfeat d JOIN lam l USING (bucket)
        GROUP BY d.doc_id
    """


def _dsir_sample_oracle(n: int = 500, seed: int = 17) -> str:
    """DuckDB replica of dsir_weights -> importance_sample: the weights
    CTE is the (hash-green) _dsir_oracle verbatim; the Gumbel key repeats
    the Spark arithmetic exactly — 52-bit md5 uniform (every double
    exactly representable), -ln(-ln(u)) in the same expression shape
    (DuckDB ln == glibc log bit-for-bit), one addition, top-n."""
    two52 = float(1 << 52)
    return f"""
        WITH w AS ({_dsir_oracle()}),
        keyed AS (
            SELECT doc_id, n_feats, logw,
                   logw + (-ln(-ln(
                       (CAST(CAST(concat('0x', substr(md5(concat(
                            'gumbel|{seed}|', CAST(doc_id AS VARCHAR))),
                            1, 15)) AS BIGINT) % {1 << 52} AS DOUBLE)
                        + 0.5) / {two52!r}))) AS sample_key
            FROM w
        )
        SELECT * FROM keyed ORDER BY sample_key DESC LIMIT {n}
    """


def _temperature_mix_oracle(budget: int = 400, tau: float = 0.5,
                            seed: int = 42) -> str:
    """DuckDB replica of sampling.temperature_mix over the same tiering:
    per-tier counts, glibc-pow milli-quantized scores (DuckDB pow ==
    CPython ** bit-for-bit, verified), integer share/target/cut chain
    with explicit floor division, md5 'mix' bucket cut."""
    h = _MD5_INT.format(x=f"concat('mix_{seed}_', CAST(doc_id AS VARCHAR))")
    return f"""
        WITH tiered AS (
            SELECT doc_id,
                   CASE WHEN CAST(substr(source, 4) AS INT) < 12 THEN 'web'
                        WHEN CAST(substr(source, 4) AS INT) < 18 THEN 'books'
                        ELSE 'code' END AS mix_source
            FROM documents
        ),
        c AS (SELECT mix_source, count(*) AS n FROM tiered GROUP BY 1),
        t AS (SELECT mix_source, n,
                     CAST(floor(pow(CAST(n AS DOUBLE), {tau!r}) * 1000
                                + 0.5) AS BIGINT) AS tq
              FROM c),
        tot AS (SELECT CAST(sum(tq) AS BIGINT) AS total FROM t),
        cuts AS (
            SELECT mix_source,
                   (least(n, ({budget} * tq + total // 2) // total)
                    * 10000 + n // 2) // n AS cut
            FROM t CROSS JOIN tot
        )
        SELECT d.doc_id, d.mix_source
        FROM tiered d JOIN cuts USING (mix_source)
        WHERE {h} % 10000 < cut
    """


def _split_leakage_oracle(seed: int = 42) -> str:
    """DuckDB replica of sampling.split_leakage over the same planted
    re-keyed corpus: normalized fingerprint, md5 split buckets
    (train<9000, val<9500, else test), per-fingerprint conditional
    counts, leak filter. Sums cast to BIGINT (DuckDB sum(int) is HUGEINT
    — kind-level hash mismatch otherwise)."""
    h = _MD5_INT.format(x=f"concat('split_{seed}_', CAST(doc_id AS VARCHAR))")
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000000 AS doc_id, text
            FROM documents WHERE doc_id % 7 = 0
        ),
        labeled AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                       AS fingerprint,
                   CASE WHEN {h} % 10000 < 9000 THEN 'train'
                        WHEN {h} % 10000 < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM corpus
            WHERE text IS NOT NULL
        ),
        agg AS (
            SELECT fingerprint,
                   CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_train,
                   CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_val,
                   CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_test,
                   min(CASE WHEN split <> 'train' THEN doc_id END)
                       AS leaked_doc_id
            FROM labeled GROUP BY fingerprint
        )
        SELECT * FROM agg WHERE n_train > 0 AND n_val + n_test > 0
    """


def _prototypicality_oracle(n_centroids: int = 16, seed: int = 42) -> str:
    """DuckDB replica of similarity.prototypicality: the ivf oracle's
    md5-sampled centroids + exact integer coarse scoring, per-vector best
    centroid (max ccos, tie -> smaller cid), percent_rank within cluster
    ordered (proto desc, vec_id)."""
    return f"""
        WITH b AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
            FROM embeddings
        ),
        bn AS (
            SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS nrm,
                   CAST(concat('0x', substr(md5(concat('ivf_{seed}_',
                        CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) AS r
            FROM b
        ),
        cen AS (
            SELECT row_number() OVER (ORDER BY r, vec_id) AS cid,
                   qv AS cv, nrm AS cn
            FROM (SELECT * FROM bn ORDER BY r, vec_id LIMIT {n_centroids})
        ),
        scored AS (
            SELECT bn.vec_id, cen.cid,
                   CAST(list_sum(list_transform(range(1, len(bn.qv) + 1),
                        i -> bn.qv[i] * cen.cv[i])) AS DOUBLE)
                   / sqrt(CAST(bn.nrm * cen.cn AS DOUBLE)) AS ccos
            FROM bn CROSS JOIN cen
        ),
        ranked AS (
            SELECT vec_id, cid, ccos,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY ccos DESC, cid) AS rk
            FROM scored
        ),
        best AS (SELECT vec_id, CAST(cid AS INT) AS cid, ccos AS proto
                 FROM ranked WHERE rk = 1)
        SELECT vec_id, cid, proto,
               percent_rank() OVER (PARTITION BY cid
                                    ORDER BY proto DESC, vec_id) AS pr
        FROM best
    """


def _bm25_oracle(terms: list[str] | None = None, n: int = 200,
                 k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB replica of text.bm25_topk: tf via list_filter over the same
    \\s+ tokenization (RE2 has no lookarounds — the Spark side's
    regexp_count lookaround trick counts exactly the same whole-token
    occurrences), one stats CTE (count / sum-dl / per-term df), then the
    IDENTICAL score expression shape with the same repr'd constants:
    avgdl is one division of two exact integers, idf is DuckDB ln == glibc
    log == CPython math.log, and the term sum is the same left-associated
    chain — so the double scores hash-match."""
    terms = [t.lower() for t in (terms or _BM25_TERMS)]
    k1p1, omb = k1 + 1.0, 1.0 - b
    tf_cols = ",\n                   ".join(
        f"len(list_filter(string_split_regex(lower(trim(text)), '\\s+'), "
        f"x -> x = '{t}')) AS tf{i}" for i, t in enumerate(terms))
    df_cols = ",\n                   ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms)))
    idf_cols = ",\n                   ".join(
        f"ln(1.0 + ((n - df{i}) + 0.5) / (df{i} + 0.5)) AS idf{i}"
        for i in range(len(terms)))
    parts = " + ".join(
        f"(c.idf{i} * ((CAST(b.tf{i} AS DOUBLE) * CAST({k1p1!r} AS DOUBLE)) "
        f"/ (CAST(b.tf{i} AS DOUBLE) + CAST({k1!r} AS DOUBLE) "
        f"* (CAST({omb!r} AS DOUBLE) + CAST({b!r} AS DOUBLE) "
        f"* CAST(b.dl AS DOUBLE) / c.avgdl))))"
        for i in range(len(terms)))
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len(string_split_regex(trim(text), '\\s+')) AS dl,
                   {tf_cols}
            FROM documents
        ),
        s AS (
            SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sum_dl,
                   {df_cols}
            FROM base
        ),
        c AS (
            SELECT n, CAST(sum_dl AS DOUBLE) / CAST(n AS DOUBLE) AS avgdl,
                   {idf_cols}
            FROM s
        )
        SELECT doc_id, score FROM (
            SELECT b.doc_id, {parts} AS score
            FROM base b CROSS JOIN c
        ) WHERE score > 0
        ORDER BY score DESC, doc_id LIMIT {n}
    """


def _kmeans_oracle(k: int = 8, n_iters: int = 2, seed: int = 42) -> str:
    """DuckDB replay of similarity.kmeans, iteration by iteration: the
    md5-seeded round-0 sample, then per round an exact-integer coarse
    scoring pass (same quantization lattice), (ccos desc, cid) argmax,
    element-wise member sums via zipped unnest, the identical
    positive-operand ``//`` round-half-away integer mean, and the
    empty/zero-mean keep-old carry — finishing with the assignment against
    the final centroids. Everything on the int64 lattice except the one
    IEEE division per (vector, centroid) score, so labels and cosines
    hash-match bit-for-bit."""
    dot = ("CAST(list_sum(list_transform(range(1, len(bb.qv) + 1), "
           "j -> bb.qv[j] * c.cv[j])) AS DOUBLE) "
           "/ sqrt(CAST(bb.nrm * c.cn AS DOUBLE))")
    parts = [f"""
        WITH b AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
            FROM embeddings
        ),
        bn AS (
            SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS nrm,
                   CAST(concat('0x', substr(md5(concat('kmeans_{seed}_',
                        CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) AS r
            FROM b
        ),
        bb AS MATERIALIZED (SELECT * FROM bn WHERE nrm IS NOT NULL AND nrm > 0),
        cen0 AS (
            SELECT CAST(row_number() OVER (ORDER BY r, vec_id) AS INT) AS cid,
                   qv AS cv, nrm AS cn
            FROM (SELECT * FROM bb ORDER BY r, vec_id LIMIT {k})
        )"""]
    for i in range(n_iters):
        parts.append(f""",
        a{i} AS (
            SELECT vec_id, cid, qv FROM (
                SELECT bb.vec_id, c.cid, bb.qv,
                       row_number() OVER (PARTITION BY bb.vec_id
                           ORDER BY {dot} DESC, c.cid) AS rk
                FROM bb CROSS JOIN cen{i} c
            ) WHERE rk = 1
        ),
        g{i} AS (
            SELECT cid, pos, CAST(sum(v) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT cid, unnest(range(1, len(qv) + 1)) AS pos,
                         unnest(qv) AS v
                  FROM a{i})
            GROUP BY cid, pos
        ),
        n{i} AS (
            SELECT cid, list(mv ORDER BY pos) AS cv,
                   CAST(sum(mv * mv) AS BIGINT) AS cn
            FROM (SELECT cid, pos,
                         CASE WHEN s >= 0 THEN (2 * s + cnt) // (2 * cnt)
                              ELSE -((-2 * s + cnt) // (2 * cnt)) END AS mv
                  FROM g{i})
            GROUP BY cid
        ),
        cen{i + 1} AS MATERIALIZED (
            SELECT o.cid, coalesce(n.cv, o.cv) AS cv, coalesce(n.cn, o.cn) AS cn
            FROM cen{i} o
            LEFT JOIN (SELECT * FROM n{i} WHERE cn > 0) n USING (cid)
        )""")
    parts.append(f"""
        SELECT vec_id, cid, cosine FROM (
            SELECT bb.vec_id, c.cid, {dot} AS cosine,
                   row_number() OVER (PARTITION BY bb.vec_id
                       ORDER BY {dot} DESC, c.cid) AS rk
            FROM bb CROSS JOIN cen{n_iters} c
        ) WHERE rk = 1
    """)
    return "".join(parts)


def _pq_oracle(k: int = 10, n_queries: int = 8, m: int = 4,
               k_sub: int = 16, n_iters: int = 1,
               train_fraction: float = 0.6, dim: int = 64,
               seed: int = 42, n_cells: int | None = None,
               nprobe: int | None = None) -> str:
    """DuckDB replay of similarity.pq_topk, stage by stage: the same
    quantization lattice, the md5 'pqtrain' hash sample, the md5-seeded
    codebook init, per-subspace Lloyd rounds on integer L2 (cn − 2·dot
    argmin with the (dist, code) tie-break numpy's first-occurrence argmin
    implements), the identical ``//`` round-half-away means with
    empty/zero-mean keep-old carry, argmin encoding of the FULL corpus,
    exact-integer ADC tables, and the one IEEE division per (query, code
    row). ``dim`` is the embeddings table's declared width (the Spark side
    infers it; PQ requires it uniform anyway).

    With ``n_cells``/``nprobe`` set this becomes the similarity.ivfpq_topk
    replica: md5-sampled coarse cells, exact-cosine argmax assignment,
    per-query nprobe probe lists, and a probe-membership join restricting
    which codes are scored — the same double cosines the proven ivf
    oracle uses, so probe ranks agree bit-for-bit."""
    subdim = dim // m
    cut = int(round(train_fraction * 10_000))

    def md5i(tag):
        return (f"CAST(concat('0x', substr(md5(concat('{tag}_{seed}_', "
                f"CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT)")

    def lo(s):
        return s * subdim + 1

    def slice_sq(col, s):
        return (f"list_transform(range({lo(s)}, {lo(s) + subdim}), "
                f"j -> {col}[j])")

    parts = [f"""
        WITH b AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
            FROM embeddings
        ),
        bn AS (
            SELECT vec_id, qv,
                   CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm
            FROM b
        ),
        bb AS MATERIALIZED (SELECT * FROM bn WHERE nrm IS NOT NULL AND nrm > 0),
        tr AS MATERIALIZED (
            SELECT * FROM bb
            WHERE ({md5i('pqtrain')} % 10000) < {cut}
        ),
        ini AS (
            SELECT qv, CAST(row_number() OVER (ORDER BY r, vec_id) AS INT) - 1 AS cid
            FROM (SELECT vec_id, qv, {md5i('pq')} AS r
                  FROM tr ORDER BY r, vec_id LIMIT {k_sub})
        )"""]
    for s in range(m):
        parts.append(f""",
        cen{s}_0 AS (
            SELECT cid, {slice_sq('qv', s)} AS cv,
                   CAST(list_sum(list_transform(range({lo(s)}, {lo(s) + subdim}),
                        j -> qv[j] * qv[j])) AS BIGINT) AS cn
            FROM ini
        )""")
    for i in range(n_iters):
        for s in range(m):
            dot = (f"CAST(list_sum(list_transform(range(1, {subdim} + 1), "
                   f"j -> t.qv[{lo(s) - 1} + j] * c.cv[j])) AS BIGINT)")
            parts.append(f""",
        a{i}_{s} AS (
            SELECT vec_id, cid FROM (
                SELECT t.vec_id, c.cid,
                       row_number() OVER (PARTITION BY t.vec_id
                           ORDER BY c.cn - 2 * {dot} ASC, c.cid) AS rk
                FROM tr t CROSS JOIN cen{s}_{i} c
            ) WHERE rk = 1
        ),
        g{i}_{s} AS (
            SELECT cid, p, CAST(sum(v) AS BIGINT) AS sv,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT a.cid, unnest(range(1, {subdim} + 1)) AS p,
                         unnest({slice_sq('t.qv', s)}) AS v
                  FROM a{i}_{s} a JOIN tr t USING (vec_id))
            GROUP BY cid, p
        ),
        n{i}_{s} AS (
            SELECT cid, list(mv ORDER BY p) AS cv,
                   CAST(sum(mv * mv) AS BIGINT) AS cn
            FROM (SELECT cid, p,
                         CASE WHEN sv >= 0 THEN (2 * sv + cnt) // (2 * cnt)
                              ELSE -((-2 * sv + cnt) // (2 * cnt)) END AS mv
                  FROM g{i}_{s})
            GROUP BY cid
        ),
        cen{s}_{i + 1} AS MATERIALIZED (
            SELECT o.cid, coalesce(n.cv, o.cv) AS cv, coalesce(n.cn, o.cn) AS cn
            FROM cen{s}_{i} o
            LEFT JOIN (SELECT * FROM n{i}_{s} WHERE cn > 0) n USING (cid)
        )""")
    for s in range(m):
        dot = (f"CAST(list_sum(list_transform(range(1, {subdim} + 1), "
               f"j -> x.qv[{lo(s) - 1} + j] * c.cv[j])) AS BIGINT)")
        parts.append(f""",
        code_{s} AS MATERIALIZED (
            SELECT vec_id, cv AS v{s}, cn AS n{s} FROM (
                SELECT x.vec_id, c.cv, c.cn,
                       row_number() OVER (PARTITION BY x.vec_id
                           ORDER BY c.cn - 2 * {dot} ASC, c.cid) AS rk
                FROM bb x CROSS JOIN cen{s}_{n_iters} c
            ) WHERE rk = 1
        )""")
    cx_cols = ", ".join(f"c{s}.v{s}, c{s}.n{s}" for s in range(m))
    cx_joins = " ".join(f"JOIN code_{s} c{s} USING (vec_id)"
                        for s in range(1, m))
    ad = " + ".join(
        f"CAST(list_sum(list_transform(range(1, {subdim} + 1), "
        f"j -> q.qv[{lo(s) - 1} + j] * x.v{s}[j])) AS BIGINT)"
        for s in range(m))
    an = " + ".join(f"x.n{s}" for s in range(m))
    score = "CAST(ad AS DOUBLE) / sqrt(CAST(qn * an AS DOUBLE))"
    ivf = ""
    sc_from = "FROM qs q CROSS JOIN cx x"
    if n_cells is not None:
        ccos = ("CAST(list_sum(list_transform(range(1, len(bb.qv) + 1), "
                "j -> bb.qv[j] * c.cv[j])) AS DOUBLE) "
                "/ sqrt(CAST(bb.nrm * c.cn AS DOUBLE))")
        ivf = f""",
        icen AS (
            SELECT CAST(row_number() OVER (ORDER BY r, vec_id) AS INT) AS cid,
                   qv AS cv, nrm AS cn
            FROM (SELECT vec_id, qv, nrm, {md5i('ivf')} AS r
                  FROM bb ORDER BY r, vec_id LIMIT {n_cells})
        ),
        iscore AS MATERIALIZED (
            SELECT bb.vec_id, c.cid, {ccos} AS ccos
            FROM bb CROSS JOIN icen c
        ),
        iassign AS (
            SELECT vec_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, cid) AS rk
                FROM iscore) WHERE rk = 1
        ),
        probes AS (
            SELECT vec_id AS query_id, cid FROM (
                SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                    ORDER BY ccos DESC, cid) AS rk
                FROM iscore WHERE vec_id IN (SELECT query_id FROM qs)
            ) WHERE rk <= {nprobe}
        )"""
        sc_from = ("FROM qs q JOIN probes pr ON pr.query_id = q.query_id\n"
                   "            JOIN iassign ia ON ia.cid = pr.cid\n"
                   "            JOIN cx x ON x.vec_id = ia.vec_id")
    parts.append(f""",
        qs AS (
            SELECT vec_id AS query_id, qv, nrm AS qn
            FROM (SELECT vec_id, qv, nrm, {md5i('pqq')} AS r
                  FROM bb ORDER BY r, vec_id LIMIT {n_queries})
        ),
        cx AS (
            SELECT c0.vec_id, {cx_cols}
            FROM code_0 c0 {cx_joins}
        ){ivf},
        sc AS (
            SELECT q.query_id, x.vec_id AS neighbor_id, q.qn,
                   ({ad}) AS ad, ({an}) AS an
            {sc_from}
            WHERE x.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, rank, score FROM (
            SELECT query_id, neighbor_id, {score} AS score,
                   row_number() OVER (PARTITION BY query_id
                       ORDER BY {score} DESC, neighbor_id) AS rank
            FROM sc WHERE an > 0
        ) WHERE rank <= {k}
    """)
    return "".join(parts)


def _bpe_rounds(n_merges: int = 12):
    """Shared CTE chain replaying text.bpe_train round by round: the same
    word-frequency table (regex split, printable-ASCII filter, per-char
    init — ASCII makes Spark's UTF-16 substring and DuckDB's codepoint
    indexing agree), per round a frequency-weighted adjacent-pair count,
    the (cnt desc, lhs, rhs) argmax, and a list_reduce fold applying the
    winning merge with the exact greedy left-to-right semantics of the
    Spark Arrow pass (chr(31)-delimited accumulator; the ASCII filter
    guarantees the delimiter never occurs in a token). Rounds past
    exhaustion yield empty argmax CTEs and contribute no rows — matching
    the Spark side's early break. Round CTEs are MATERIALIZED: DuckDB
    inlines CTEs by default and each round references its predecessor
    twice, so the un-hinted plan doubles per round (2^n blowup).
    Returns (with_clause, per-round argmax SELECTs)."""
    rounds = []
    finals = []
    for i in range(1, n_merges + 1):
        rounds.append(f""",
        p{i} AS (
            SELECT st[j] AS lhs, st[j + 1] AS rhs,
                   CAST(sum(n) AS BIGINT) AS cnt
            FROM (SELECT n, st, unnest(range(1, len(st))) AS j
                  FROM w{i - 1} WHERE len(st) >= 2)
            GROUP BY st[j], st[j + 1]
        ),
        t{i} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{i}
                 ORDER BY cnt DESC, lhs, rhs LIMIT 1),
        w{i} AS MATERIALIZED (
            -- LEFT JOIN ON TRUE, not CROSS JOIN: once merges exhaust,
            -- t{{i}} is empty and a cross join would EMPTY the vocab for
            -- every later round — the encode oracle would return zero
            -- rows while Spark's early break keeps the last state. The
            -- NULL-pair branch carries st through unchanged instead.
            SELECT word, n,
                   CASE WHEN t.lhs IS NULL THEN st ELSE
                   string_split(list_reduce(list_prepend('', st),
                       (acc, tk) -> CASE
                           WHEN tk = t.rhs AND ends_with(acc, chr(31) || t.lhs)
                           THEN left(acc, len(acc) - len(t.lhs)) || t.lhs || t.rhs
                           ELSE acc || chr(31) || tk END),
                       chr(31))[2:] END AS st
            FROM w{i - 1} LEFT JOIN t{i} t ON TRUE
        )""")
        finals.append(f"SELECT CAST({i} AS INT) AS merge_rank, lhs, rhs, "
                      f"cnt AS pair_count FROM t{i}")
    with_clause = f"""
        WITH w0 AS MATERIALIZED (
            SELECT word, CAST(count(*) AS BIGINT) AS n,
                   list_transform(range(1, len(word) + 1), j -> word[j]) AS st
            FROM (SELECT unnest(string_split_regex(lower(trim(text)),
                       '\\s+')) AS word FROM documents)
            WHERE regexp_matches(word, '^[!-~]+$')
            GROUP BY word
        ){"".join(rounds)}"""
    return with_clause, finals


def _bpe_oracle(n_merges: int = 12) -> str:
    """DuckDB replay of text.bpe_train (see _bpe_rounds): the merge table
    is the union of each round's argmax row."""
    with_clause, finals = _bpe_rounds(n_merges)
    return f"""{with_clause}
        {" UNION ALL ".join(finals)}
    """


def _bpe_encode_oracle(n_merges: int = 12) -> str:
    """DuckDB replica of text.bpe_encode_stats: the SAME materialized
    merge-round chain as _bpe_oracle, then the per-document word list
    (duplicates KEPT — each occurrence pays its token count, unlike the
    distinct-vocab training pass; same ASCII filter) inner-joined to the
    final vocab states — per-doc BPE token and char sums hash-match."""
    with_clause, _ = _bpe_rounds(n_merges)
    return f"""{with_clause},
        dw AS (
            SELECT doc_id, word FROM (
                SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
                    '\\s+')) AS word FROM documents)
            WHERE regexp_matches(word, '^[!-~]+$')
        )
        SELECT doc_id, CAST(sum(len(st)) AS BIGINT) AS n_bpe_tokens,
               CAST(sum(len(word)) AS BIGINT) AS n_chars
        FROM dw JOIN w{n_merges} USING (word)
        GROUP BY doc_id
    """


def _bigram_nll_oracle(alpha: float = 1.0) -> str:
    """DuckDB replica of text.bigram_nll with reference = lang='en':
    identical tokenization (lower/trim/regex split), the same posexplode-
    adjacent bigram enumeration, add-alpha ln terms in ONE expression
    shape over exact integer counts (glibc ln == math.log), micro-nat
    round-half-away quantization (DuckDB round() IS half-away — the
    dsir_weights precedent), exact integer per-doc sums, and the same
    two-division tail."""
    a = float(alpha)
    return f"""
        WITH tok AS (
            SELECT doc_id, lang,
                   string_split_regex(lower(trim(text)), '\\s+') AS tk
            FROM documents
        ),
        dp AS (
            SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
            FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
                  FROM tok WHERE len(tk) >= 2)
        ),
        dbc AS (
            SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS c
            FROM dp GROUP BY doc_id, w1, w2
        ),
        ru AS (
            SELECT w, CAST(count(*) AS BIGINT) AS cu
            FROM (SELECT unnest(tk) AS w FROM tok WHERE lang = 'en')
            GROUP BY w
        ),
        rb AS (
            SELECT tk[i] AS w1, tk[i + 1] AS w2,
                   CAST(count(*) AS BIGINT) AS cb
            FROM (SELECT tk, unnest(range(1, len(tk))) AS i
                  FROM tok WHERE lang = 'en' AND len(tk) >= 2)
            GROUP BY 1, 2
        ),
        vv AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM ru),
        tm AS (
            SELECT k.w1, k.w2,
                   CAST(round(ln((CAST(coalesce(rb.cb, 0) AS DOUBLE) + {a!r})
                        / (CAST(coalesce(ru.cu, 0) AS DOUBLE)
                           + ({a!r} * vv.v))) * 1e9) AS BIGINT) AS micro
            FROM (SELECT DISTINCT w1, w2 FROM dbc) k
            LEFT JOIN rb USING (w1, w2)
            LEFT JOIN ru ON ru.w = k.w1
            CROSS JOIN vv
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               (CAST(sum(c * micro) AS DOUBLE) / -1000000000.0)
               / CAST(sum(c) AS DOUBLE) AS avg_nll
        FROM dbc JOIN tm USING (w1, w2)
        GROUP BY doc_id
    """


def _tfidf_oracle(j: int = 5) -> str:
    """DuckDB replica of text.tfidf_topk_terms: same tokenization and
    (doc, term) counts, micro-nat idf per distinct term (glibc ln over
    exact (N, df); round() is half-away like the Python idiom), exact
    bigint scores, (score desc, term) ranks."""
    return f"""
        WITH wc AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
                       '\\s+')) AS term FROM documents)
            WHERE term <> ''
            GROUP BY doc_id, term
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        dfreq AS (
            SELECT term,
                   CAST(round((ln((nn.n + 1.0)
                        / (CAST(count(*) AS DOUBLE) + 1.0)) + 1.0) * 1e9)
                        AS BIGINT) AS idf
            FROM wc CROSS JOIN nn
            GROUP BY term, nn.n
        )
        SELECT doc_id, term, rank, score_micro FROM (
            SELECT wc.doc_id, wc.term, wc.tf * d.idf AS score_micro,
                   row_number() OVER (PARTITION BY wc.doc_id
                       ORDER BY wc.tf * d.idf DESC, wc.term) AS rank
            FROM wc JOIN dfreq d USING (term)
        ) WHERE rank <= {j}
    """


def _char_entropy_oracle() -> str:
    """DuckDB replica of text.char_entropy: identical char split (Spark
    split(text, '') == string_split(text, '') on this ASCII corpus),
    micro-nat ln per distinct count value (round() is half-away, the
    Python idiom's twin), exact integer sums, the same two-IEEE-op
    tail."""
    return """
        WITH cc AS (
            SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch
                  FROM documents)
            WHERE ch <> ''
            GROUP BY doc_id, ch
        ),
        lnc AS (
            SELECT c, CAST(round(ln(CAST(c AS DOUBLE)) * 1e9) AS BIGINT)
                   AS mlc
            FROM (SELECT DISTINCT c FROM cc)
        ),
        sums AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
                   CAST(sum(c * mlc) AS BIGINT) AS s
            FROM cc JOIN lnc USING (c)
            GROUP BY doc_id
        ),
        lnn AS (
            SELECT n_chars,
                   CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1e9) AS BIGINT)
                   AS mln
            FROM (SELECT DISTINCT n_chars FROM sums)
        )
        SELECT doc_id, n_chars,
               (CAST(mln AS DOUBLE)
                - (CAST(s AS DOUBLE) / CAST(n_chars AS DOUBLE))) / 1e9
               AS entropy
        FROM sums JOIN lnn USING (n_chars)
    """


def _quality_corpus_oracle() -> str:
    """DuckDB recomputation of the WHOLE quality_corpus chain: the three
    model pipelines (gopher over RAW text, char entropy, bigram NLL) as
    nested-WITH CTEs, the same double-literal cuts, and the md5 'split'
    buckets. Docs with <2 tokens drop via the inner NLL join on both
    sides."""
    return f"""
        WITH g AS ({_gopher_oracle(30, plant=False)}),
        e AS ({_char_entropy_oracle()}),
        p AS ({_bigram_nll_oracle()}),
        s AS (
            SELECT d.doc_id, d.lang,
                   {_MD5_INT.format(
                       x="concat('split_42_', CAST(d.doc_id AS VARCHAR))")}
                       % 10000 AS bucket
            FROM documents d
            JOIN g USING (doc_id)
            JOIN e USING (doc_id)
            JOIN p USING (doc_id)
            WHERE g.keep AND e.entropy >= 2.8 AND p.avg_nll <= 3.45
        )
        SELECT doc_id, lang,
               CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split
        FROM s
    """


def _intra_line_oracle(min_line_chars: int = 5) -> str:
    """DuckDB replica of dedup.intra_doc_line_dedup over the same planted
    construction (intra-doc repeated first line %5, duplicated immune
    '--' separators %4): min(pos)-per-(doc, trimmed key) keepers, the
    short-line immunity rule, ordered string_agg reassembly."""
    return f"""
        WITH base AS (
            SELECT doc_id, concat_ws(chr(10),
                substr(text, 1, 60),
                CASE WHEN doc_id % 4 = 0 THEN '--' END,
                substr(text, 61, 60),
                CASE WHEN doc_id % 4 = 0 THEN '--' END,
                substr(text, 121, 60),
                CASE WHEN doc_id % 5 = 1 THEN substr(text, 1, 60) END)
                AS text
            FROM documents
        ),
        ls AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM base),
        ln AS (SELECT doc_id, i AS pos, lines[i + 1] AS line
               FROM ls, LATERAL (SELECT unnest(range(len(lines))) AS i) ii),
        keyed AS (SELECT doc_id, pos, line, trim(line) AS key,
                         length(trim(line)) < {min_line_chars} AS immune
                  FROM ln),
        fst AS (SELECT doc_id, key, min(pos) AS kp FROM keyed
                WHERE NOT immune GROUP BY doc_id, key),
        kept AS (
            SELECT doc_id, pos, line FROM keyed WHERE immune
            UNION ALL
            SELECT k.doc_id, k.pos, k.line
            FROM keyed k JOIN fst f
              ON f.doc_id = k.doc_id AND f.key = k.key
            WHERE NOT k.immune AND k.pos = f.kp
        ),
        counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
                   FROM ln GROUP BY doc_id)
        SELECT k.doc_id,
               string_agg(k.line, chr(10) ORDER BY k.pos) AS text,
               any_value(c.n_lines) AS n_lines,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept k JOIN counts c USING (doc_id)
        GROUP BY k.doc_id
    """


def oracle_sql() -> dict[str, str]:
    return {
        "validate_verdicts": f"SELECT doc_id, {_VALID_COND} AS is_valid FROM documents",
        "validate_violations": """
            SELECT doc_id, '#/text' AS path, 'min_length_failed' AS error_type
              FROM documents WHERE length(text) < 50
            UNION ALL
            SELECT doc_id, '#/text', 'max_length_failed' FROM documents WHERE length(text) > 500
            UNION ALL
            SELECT doc_id, '#/lang', 'invalid_type' FROM documents
             WHERE lang NOT IN ('de','en','es','fr','zh')
            UNION ALL
            SELECT doc_id, '#/source', 'pattern_failed' FROM documents
             WHERE NOT regexp_matches(source, '^src[0-9]+$')
            UNION ALL
            SELECT doc_id, '#/n_chars', 'min_failed' FROM documents WHERE n_chars < 0
            UNION ALL
            SELECT doc_id, '#/n_chars', 'max_failed' FROM documents WHERE n_chars > 10000
            UNION ALL
            SELECT doc_id, '#/doc_id', 'min_failed' FROM documents WHERE doc_id < 0
        """,
        "deep_validate_props": """
            SELECT event_id,
                   (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 0
                    AND CAST(json_extract_string(props, '$.k') AS BIGINT) <= 80) AS is_valid
            FROM (SELECT * FROM events ORDER BY event_id LIMIT 2000)
        """,
        "validate_props_json": """
            SELECT event_id,
                   (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 0
                    AND CAST(json_extract_string(props, '$.k') AS BIGINT) <= 80) AS is_valid
            FROM events
        """,
        "scaffold_violations": (
            "WITH expected(v, path, error_type) AS (VALUES "
            + ", ".join(f"({v}, '{p}', '{t}')" for v, p, t in _SCAFFOLD_EXPECTED)
            + ") SELECT d.doc_id, e.path, e.error_type "
            + "FROM documents d JOIN expected e ON (d.doc_id % 20) = e.v"
        ),
        "validation_summary": """
            SELECT path, error_type, count(*) AS n_violations FROM (
                SELECT doc_id, '#/text' AS path, 'min_length_failed' AS error_type
                  FROM documents WHERE length(text) < 50
                UNION ALL
                SELECT doc_id, '#/text', 'max_length_failed' FROM documents WHERE length(text) > 500
            ) GROUP BY path, error_type
        """,
        "duplicate_line_orders": """
            SELECT l_orderkey, count(*) AS dup_count FROM lineitem
            GROUP BY l_orderkey HAVING count(*) > 1
        """,
        "customers_without_orders": """
            WITH c2 AS (
                SELECT CASE WHEN c_custkey % 97 = 13
                            THEN c_custkey + 10000000
                            ELSE c_custkey END AS c_custkey, c_name
                FROM customer
            )
            SELECT c_custkey, c_name FROM c2
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "lineitem_stats": """
            SELECT 'l_quantity' AS "column", count(*) AS count,
                   CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE)
                         / count(l_quantity), 6) AS mean_r6,
                   min(l_quantity) AS min_v, max(l_quantity) AS max_v
            FROM lineitem
            UNION ALL
            SELECT 'l_extendedprice', count(*),
                   CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
                   round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE)
                         / count(l_extendedprice), 6),
                   min(l_extendedprice), max(l_extendedprice)
            FROM lineitem
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "pricing_rollup": """
            SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                   coalesce(l_linestatus, 'ALL') AS linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "user_set_ops": """
            SELECT user_id, 'click_and_purchase' AS relation FROM (
                SELECT user_id FROM events WHERE event_type = 'click'
                INTERSECT
                SELECT user_id FROM events WHERE event_type = 'purchase'
            )
            UNION ALL
            SELECT user_id, 'click_only' AS relation FROM (
                SELECT user_id FROM events WHERE event_type = 'click'
                EXCEPT
                SELECT user_id FROM events WHERE event_type = 'purchase'
            )
        """,
        "top_customers_per_segment": """
            WITH spend AS (
                SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
                FROM orders GROUP BY o_custkey
            ), ranked AS (
                SELECT c.c_mktsegment, c.c_custkey, s.spend,
                       row_number() OVER (PARTITION BY c.c_mktsegment
                                          ORDER BY s.spend DESC, c.c_custkey) AS rank
                FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
            )
            SELECT c_mktsegment, rank, c_custkey, spend FROM ranked WHERE rank <= 3
        """,
        "revenue_by_nation": """
            SELECT n.n_name, round(sum(o.o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "user_sessions": """
            WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
                FROM events
            )
            SELECT user_id, count(*) AS n_events,
                   CAST(sum(CASE WHEN gap IS NULL OR gap > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM g GROUP BY user_id
        """,
        "event_windows": """
            SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS bucket_start,
                   event_type, count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "token_counts": f"SELECT doc_id, len({_TOKENS}) AS n_tokens FROM documents",
        # exact integer totals; each ratio is ONE double division of two
        # exact integers (engine- and partitioning-invariant)
        "token_stats": f"""
            WITH per AS (
                SELECT lang, len({_TOKENS}) AS t,
                       length(regexp_replace(trim(text), '\\s+', '', 'g'))
                           AS c,
                       strlen(text) AS b
                FROM documents
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(t) AS BIGINT) AS n_tokens,
                   CAST(sum(c) AS BIGINT) AS n_chars,
                   CAST(sum(b) AS BIGINT) AS n_bytes,
                   CAST(CAST(sum(b) AS BIGINT) AS DOUBLE)
                       / CAST(sum(t) AS BIGINT) AS bytes_per_token,
                   CAST(CAST(sum(t) AS BIGINT) AS DOUBLE)
                       / CAST(count(*) AS BIGINT) AS tokens_per_doc
            FROM per GROUP BY lang
        """,
        "quality_scores": f"""
            WITH t AS (SELECT doc_id, {_TOKENS} AS l FROM documents)
            SELECT doc_id, len(l) AS n_tokens,
                   round(CAST(list_sum(list_transform(l, x -> length(x))) AS DOUBLE)
                         / CAST(len(l) AS DOUBLE), 6) AS avg_token_len_r6,
                   round(CAST(len(list_filter(l, x -> list_contains(
                         ['the','a','of','and','to','in','is'], lower(x)))) AS DOUBLE)
                         / CAST(len(l) AS DOUBLE), 6) AS stopword_ratio_r6
            FROM t
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars_r6
            FROM documents GROUP BY lang
        """,
        "lang_id": f"""
            WITH t AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
            s AS (
                SELECT doc_id,
                       len(list_filter(l, x -> list_contains({_LANG_HITS['en']}, lower(x)))) AS h_en,
                       len(list_filter(l, x -> list_contains({_LANG_HITS['de']}, lower(x)))) AS h_de,
                       len(list_filter(l, x -> list_contains({_LANG_HITS['es']}, lower(x)))) AS h_es,
                       len(list_filter(l, x -> list_contains({_LANG_HITS['fr']}, lower(x)))) AS h_fr
                FROM t
            )
            SELECT doc_id,
                   CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                        WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
                        WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                        WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                        ELSE 'de' END AS lang_pred
            FROM s
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        """,
        "exact_dup_clusters": """
            WITH docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 100 = 7
            )
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
                   count(*) AS n_docs, min(doc_id) AS keep_id
            FROM docs2 GROUP BY 1 HAVING count(*) > 1
        """,
        "minhash_signatures": f"""
            WITH {_SHINGLES_CTE},
            h AS (
                SELECT doc_id,
                       CAST(concat('0x', substr(md5(shingle), 1, 15)) AS BIGINT)
                           % 2147483647 AS hv
                FROM sh
            )
            SELECT doc_id, perm, min((a * hv + b) % 2147483647) AS minhash
            FROM h, {_MINHASH_PERMS}
            GROUP BY doc_id, perm
        """,
        "jaccard_pairs": f"""
            WITH {_SHINGLES_CTE},
            -- frequency cut (mirror of max_shingle_freq=1000): drop shingles
            -- shared by more than 1000 docs before the self-join
            shc AS (
                SELECT sh.doc_id, sh.shingle FROM sh
                JOIN (SELECT shingle FROM sh GROUP BY shingle
                      HAVING count(*) <= 1000) f USING (shingle)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(CAST(common AS DOUBLE)
                         / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE), 6) AS jaccard_r6
            FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.2
        """,
        "knn_cosine": """
            WITH qv AS (
                SELECT vec_id AS query_id,
                       list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                FROM embeddings WHERE vec_id < 20
            ), nv AS (
                SELECT vec_id AS neighbor_id,
                       list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
                FROM embeddings
            ), scored AS (
                SELECT q.query_id, n.neighbor_id,
                       CAST(list_sum(list_transform(range(1, len(q.v) + 1),
                            i -> q.v[i] * n.v[i])) AS DOUBLE)
                       / sqrt(CAST(list_sum(list_transform(q.v, x -> x * x))
                              * list_sum(list_transform(n.v, x -> x * x)) AS DOUBLE)) AS cosine
                FROM qv q CROSS JOIN nv n
                WHERE q.query_id <> n.neighbor_id
            ), ranked AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, neighbor_id) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine_r6
            FROM ranked WHERE rank <= 5
        """,
        "simhash": f"WITH {_SIMHASH_SIG_CTE} SELECT doc_id, simhash FROM sig",
        "simhash_near_pairs": f"""
            -- brute-force pair scan: the oracle checks the banded Spark path
            -- against exhaustive hamming distance (feasible at sf0.01)
            WITH {_SIMHASH_SIG_CTE}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   bit_count(xor(a.simhash, b.simhash)) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
        """,
        "minhash_lsh_candidates": f"""
            WITH {_SHINGLES_CTE},
            h AS (
                SELECT doc_id, {_MD5_INT.format(x='shingle')} % 2147483647 AS hv
                FROM sh
            ),
            sg AS (
                SELECT doc_id, perm, min((a * hv + b) % 2147483647) AS mh
                FROM h, {_MINHASH_PERMS8}
                GROUP BY doc_id, perm
            ),
            banded AS (
                SELECT doc_id, perm // 2 AS band,
                       string_agg(mh::VARCHAR, '_' ORDER BY perm) AS bucket
                FROM sg GROUP BY doc_id, perm // 2
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a
            JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
                         AND a.doc_id < b.doc_id
        """,
        "lsh_topk": _lsh_topk_oracle(),
        "embedding_near_dups": _lsh_near_dup_oracle(),
        "winnow_fingerprints": _winnow_oracle(),
        "bpe_token_counts": (
            # same RE2-compatible pattern literal; only SQL-quote escaping
            "SELECT doc_id, len(regexp_extract_all(text, '"
            + text_ops.BPE_SPLIT_PATTERN.replace("'", "''")
            + "')) AS n_bpe_tokens FROM documents"
        ),
        "ivf_topk": """
            WITH b AS (
                SELECT vec_id,
                       list_transform(embedding,
                           x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
                FROM embeddings
            ),
            bn AS (
                SELECT vec_id, qv, list_sum(list_transform(qv, x -> x * x)) AS nrm,
                       CAST(concat('0x', substr(md5(concat('ivf_42_',
                            CAST(vec_id AS VARCHAR))), 1, 15)) AS BIGINT) AS r
                FROM b
            ),
            cen AS (
                SELECT row_number() OVER (ORDER BY r, vec_id) AS cid,
                       qv AS cv, nrm AS cn
                FROM (SELECT * FROM bn ORDER BY r, vec_id LIMIT 64)
            ),
            scored AS (
                SELECT bn.vec_id, cen.cid,
                       CAST(list_sum(list_transform(range(1, len(bn.qv) + 1),
                            i -> bn.qv[i] * cen.cv[i])) AS DOUBLE)
                       / sqrt(CAST(bn.nrm * cen.cn AS DOUBLE)) AS ccos
                FROM bn CROSS JOIN cen
            ),
            ranked AS (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY ccos DESC, cid) AS rk
                FROM scored
            ),
            assign AS (SELECT vec_id AS neighbor_id, cid FROM ranked WHERE rk = 1),
            probes AS (SELECT vec_id AS query_id, cid FROM ranked WHERE rk <= 4),
            cand AS (
                SELECT DISTINCT p.query_id, a.neighbor_id
                FROM probes p JOIN assign a ON p.cid = a.cid
                WHERE p.query_id <> a.neighbor_id
            ),
            rer AS (
                SELECT c.query_id, c.neighbor_id,
                       CAST(list_sum(list_transform(range(1, len(qb.qv) + 1),
                            i -> qb.qv[i] * nb.qv[i])) AS DOUBLE)
                       / sqrt(CAST(qb.nrm * nb.nrm AS DOUBLE)) AS cosine
                FROM cand c
                JOIN bn qb ON qb.vec_id = c.query_id
                JOIN bn nb ON nb.vec_id = c.neighbor_id
            ),
            fin AS (
                SELECT query_id, neighbor_id, cosine,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cosine DESC, neighbor_id) AS rank
                FROM rer
            )
            SELECT query_id, neighbor_id, rank, round(cosine, 6) AS cosine_r6
            FROM fin WHERE rank <= 5
        """,
        "drift_events": """
            WITH ref AS (SELECT CAST(value AS DOUBLE) AS v FROM events
                         WHERE event_type = 'click' AND value IS NOT NULL),
            cur AS (SELECT CAST(value AS DOUBLE) AS v FROM events
                    WHERE event_type = 'purchase' AND value IS NOT NULL),
            b0 AS (SELECT min(v) AS lo0, max(v) AS hi0 FROM ref),
            b AS (SELECT lo0 AS lo,
                         CASE WHEN lo0 = hi0 THEN lo0 + 1.0 ELSE hi0 END AS hi
                  FROM b0),
            hr AS (SELECT CASE WHEN v < lo THEN 0 WHEN v >= hi THEN 65
                               ELSE CAST(floor(((v - lo) / (hi - lo)) * 64) AS INT) + 1
                          END AS bucket, count(*) AS n
                   FROM ref, b GROUP BY 1),
            hc AS (SELECT CASE WHEN v < lo THEN 0 WHEN v >= hi THEN 65
                               ELSE CAST(floor(((v - lo) / (hi - lo)) * 64) AS INT) + 1
                          END AS bucket, count(*) AS n
                   FROM cur, b GROUP BY 1),
            grid AS (SELECT coalesce(hr.bucket, hc.bucket) AS bucket,
                            coalesce(hr.n, 0) AS nr, coalesce(hc.n, 0) AS nc
                     FROM hr FULL OUTER JOIN hc ON hr.bucket = hc.bucket),
            tot AS (SELECT (SELECT count(*) FROM ref) AS n_ref,
                           (SELECT count(*) FROM cur) AS n_cur),
            cums AS (SELECT bucket, nr, nc,
                            sum(nr) OVER (ORDER BY bucket) AS cr,
                            sum(nc) OVER (ORDER BY bucket) AS cc
                     FROM grid),
            kst AS (SELECT max(abs(CAST(cr AS DOUBLE) / n_ref
                                   - CAST(cc AS DOUBLE) / n_cur)) AS ks
                    FROM cums, tot),
            psit AS (SELECT sum((greatest(CAST(nr AS DOUBLE) / n_ref, 1e-6)
                                 - greatest(CAST(nc AS DOUBLE) / n_cur, 1e-6))
                                * ln(greatest(CAST(nr AS DOUBLE) / n_ref, 1e-6)
                                     / greatest(CAST(nc AS DOUBLE) / n_cur, 1e-6))) AS psi
                     FROM grid, tot)
            SELECT 'value' AS "column", n_ref AS n_reference, n_cur AS n_current,
                   round(ks, 6) AS ks, round(psi, 6) AS psi
            FROM tot, kst, psit
        """,
        "detect_mode": """
            SELECT event_id,
                   (CAST(json_extract_string(props, '$.k') AS BIGINT) % 4)
                       NOT IN (1, 2) AS is_valid
            FROM (SELECT * FROM events ORDER BY event_id LIMIT 500)
        """,
        "train_val_split": """
            WITH b AS (
                SELECT doc_id, lang,
                       CAST(concat('0x', substr(md5(concat('split_42_',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                           % 10000 AS bucket
                FROM documents
            )
            SELECT CASE WHEN bucket < 8000 THEN 'train'
                        WHEN bucket < 9000 THEN 'val'
                        ELSE 'test' END AS split,
                   lang, count(*) AS n
            FROM b GROUP BY 1, 2
        """,
        "pii_redaction": f"""
            WITH p AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 50 = 11
                            THEN text || '{_PII_PLANT}'
                            ELSE text END AS t
                FROM documents
            ),
            r AS (
                SELECT doc_id, t,
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(t,
                                   '{text_ops.PII_EMAIL}', '<EMAIL>', 'g'),
                               '{text_ops.PII_IPV4}', '<IP>', 'g'),
                           '{text_ops.PII_PHONE}', '<PHONE>', 'g') AS clean_text
                FROM p
            )
            SELECT doc_id, clean_text FROM r WHERE t <> clean_text
        """,
        "doc_chunks": f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
            base AS (
                SELECT doc_id, l, len(l) AS n,
                       CASE WHEN len(l) <= 32 THEN 1
                            ELSE 1 + (len(l) - 32 + 23) // 24 END AS n_chunks
                FROM toks
            )
            SELECT doc_id, i AS chunk_idx,
                   array_to_string(l[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text,
                   least(32, n - i * 24) AS n_tokens
            FROM base, LATERAL (
                SELECT unnest(generate_series(0, n_chunks - 1)) AS i) ii
        """,
        "ngram_repetition": f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
            g AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram
                  FROM toks, LATERAL (
                      SELECT unnest(generate_series(1, len(l) - 2)) AS i) ii),
            stats AS (SELECT doc_id, count(*) AS n_grams,
                             count(DISTINCT gram) AS n_distinct
                      FROM g GROUP BY doc_id),
            tops AS (SELECT doc_id, max(c) AS top FROM (
                         SELECT doc_id, gram, count(*) AS c
                         FROM g GROUP BY doc_id, gram) GROUP BY doc_id)
            SELECT t.doc_id,
                   CAST(coalesce(s.n_grams, 0) AS INT) AS n_grams,
                   CAST(coalesce(s.n_distinct, 0) AS INT) AS n_distinct,
                   round(coalesce((s.n_grams - s.n_distinct)
                                  / CAST(s.n_grams AS DOUBLE), 0.0), 6)
                       AS dup_frac_r6,
                   round(coalesce(tp.top / CAST(s.n_grams AS DOUBLE), 0.0), 6)
                       AS top_share_r6
            FROM toks t
            LEFT JOIN stats s USING (doc_id)
            LEFT JOIN tops tp USING (doc_id)
        """,
        # Full-pipeline recomputation: every stage of curate_corpus redone
        # independently (row-local filters, md5 exact dedup, freq-cut
        # Jaccard pairs, recursive-CTE connected components, hash split)
        "curated_corpus": f"""
            WITH RECURSIVE
            docs2 AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 100 = 7
            ),
            t AS (SELECT doc_id, text, {_TOKENS} AS l FROM docs2),
            gr AS (SELECT doc_id, array_to_string(l[i:i+2], ' ') AS gram
                   FROM t, LATERAL (
                       SELECT unnest(generate_series(1, len(l) - 2)) AS i) ii),
            rep AS (SELECT doc_id, count(*) AS ng,
                           count(DISTINCT gram) AS nd FROM gr GROUP BY doc_id),
            lsc AS (SELECT doc_id,
                       len(list_filter(l, x -> list_contains(
                           ['the','a','of','and','to'], lower(x)))) AS h_en,
                       len(list_filter(l, x -> list_contains(
                           ['der','die','und','das','ist'], lower(x)))) AS h_de,
                       len(list_filter(l, x -> list_contains(
                           ['el','la','de','que','y'], lower(x)))) AS h_es,
                       len(list_filter(l, x -> list_contains(
                           ['le','la','et','les','des'], lower(x)))) AS h_fr
                    FROM t),
            lng AS (SELECT doc_id,
                       CASE WHEN greatest(h_en, h_de, h_es, h_fr) = 0 THEN 'und'
                            WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
                            WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                            WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                            ELSE 'de' END AS lang
                    FROM lsc),
            ann AS (SELECT t.doc_id, t.text, t.l, len(t.l) AS n_tokens,
                           lng.lang,
                           coalesce((rep.ng - rep.nd)
                                    / CAST(rep.ng AS DOUBLE), 0.0) AS dup_frac
                    FROM t JOIN lng USING (doc_id)
                    LEFT JOIN rep USING (doc_id)),
            kept AS (SELECT * FROM ann
                     WHERE n_tokens >= 12 AND dup_frac <= 0.02
                       AND lang IN ('en')),
            keepers AS (SELECT min(doc_id) AS doc_id FROM (
                            SELECT doc_id,
                                   md5(regexp_replace(lower(trim(text)),
                                       '\\s+', ' ', 'g')) AS fp
                            FROM kept) GROUP BY fp),
            ded AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
            sh AS (SELECT DISTINCT doc_id,
                          array_to_string(l[i:i+2], ' ') AS shingle
                   FROM ded, LATERAL (
                       SELECT unnest(generate_series(1, len(l) - 2)) AS i) ii),
            shc AS (SELECT sh.doc_id, sh.shingle FROM sh
                    JOIN (SELECT shingle FROM sh GROUP BY shingle
                          HAVING count(*) <= 1000) f USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
            common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                              count(*) AS common
                       FROM shc a JOIN shc b
                         ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                       GROUP BY 1, 2),
            prs AS (SELECT id_a, id_b FROM common
                    JOIN sizes sa ON sa.doc_id = id_a
                    JOIN sizes sb ON sb.doc_id = id_b
                    WHERE CAST(common AS DOUBLE)
                          / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.2),
            verts AS (SELECT id_a AS id FROM prs UNION SELECT id_b FROM prs),
            edges AS (SELECT id_a AS src, id_b AS dst FROM prs
                      UNION SELECT id_b, id_a FROM prs),
            reach AS (SELECT id, id AS label FROM verts
                      UNION SELECT e.dst AS id, r.label
                      FROM edges e JOIN reach r ON r.id = e.src),
            nonreps AS (SELECT id FROM reach GROUP BY id
                        HAVING min(label) != id),
            surv AS (SELECT * FROM ded
                     WHERE doc_id NOT IN (SELECT id FROM nonreps)),
            b AS (SELECT *,
                         CAST(concat('0x', substr(md5(concat('split_42_',
                             CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                             % 10000 AS bucket
                  FROM surv)
            SELECT doc_id, lang, n_tokens, round(dup_frac, 6) AS dup_frac_r6,
                   CASE WHEN bucket < 9000 THEN 'train'
                        WHEN bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "stratified_sample": """
            WITH b AS (
                SELECT doc_id, lang,
                       CAST(concat('0x', substr(md5(concat('sample_42_',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                           % 10000 AS bucket
                FROM documents
            )
            SELECT doc_id, lang FROM b
            WHERE bucket < CASE lang WHEN 'en' THEN 10000
                                     WHEN 'zh' THEN 4000
                                     WHEN 'de' THEN 1000
                                     ELSE 0 END
        """,
        "packed_sequences": f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
            base AS (
                SELECT doc_id, l, len(l) AS n,
                       CASE WHEN len(l) <= 32 THEN 1
                            ELSE 1 + (len(l) - 32 + 23) // 24 END AS n_chunks
                FROM toks
            ),
            chunks AS (
                SELECT doc_id, i AS chunk_idx,
                       least(32, n - i * 24) AS n_tokens
                FROM base, LATERAL (
                    SELECT unnest(generate_series(0, n_chunks - 1)) AS i) ii
            ),
            sharded AS (
                SELECT *, CAST(CAST(concat('0x', substr(md5(concat('pack_',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                           % 8 AS INT) AS shard
                FROM chunks
            ),
            run AS (
                SELECT *, sum(n_tokens) OVER (PARTITION BY shard
                              ORDER BY doc_id, chunk_idx
                              ROWS UNBOUNDED PRECEDING) AS running
                FROM sharded
            )
            SELECT doc_id, chunk_idx, shard,
                   CAST((running - n_tokens) // 128 AS INT) AS seq_id,
                   CAST((running - n_tokens) % 128 AS INT) AS seq_offset
            FROM run
        """,
        "classifier_scores": f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
            tok AS (SELECT doc_id, len(l) AS n_tokens, unnest(l) AS tok
                    FROM toks),
            w AS (SELECT doc_id, n_tokens,
                         ({_MD5_INT.format(
                             x="concat('clfw_42_', CAST("
                               + _MD5_INT.format(x="concat('clf_42_', tok)")
                               + " % 4096 AS VARCHAR))")}
                          % 2001) - 1000 AS w
                  FROM tok)
            SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                   CAST(sum(w) AS BIGINT) AS sum_w,
                   CAST(sum(w) AS DOUBLE) / (1000.0 * n_tokens) AS logit,
                   CAST(sum(w) AS DOUBLE) / (1000.0 * n_tokens) >= 0.02
                       AS keep_doc
            FROM w GROUP BY doc_id, n_tokens
        """,
        "domain_budget_sample": f"""
            WITH toks AS (SELECT doc_id, source, {_TOKENS} AS l
                          FROM documents),
            tok AS (SELECT doc_id, source, len(l) AS n_tokens,
                           unnest(l) AS tok
                    FROM toks),
            w AS (SELECT doc_id, source, n_tokens,
                         ({_MD5_INT.format(
                             x="concat('clfw_42_', CAST("
                               + _MD5_INT.format(x="concat('clf_42_', tok)")
                               + " % 4096 AS VARCHAR))")}
                          % 2001) - 1000 AS w
                  FROM tok),
            scored AS (
                SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
                       CAST(sum(w) AS DOUBLE) / (1000.0 * n_tokens) AS logit
                FROM w GROUP BY doc_id, source, n_tokens
            ),
            run AS (
                SELECT *, sum(n_tokens) OVER (PARTITION BY source
                              ORDER BY logit DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
                FROM scored
            )
            SELECT doc_id, source, n_tokens, logit,
                   CAST(cum_tokens AS BIGINT) AS cum_tokens
            FROM run WHERE cum_tokens <= 700
        """,
        "contamination": f"""
            WITH toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
            csh AS (SELECT DISTINCT doc_id,
                           array_to_string(l[i:i+7], ' ') AS shingle
                    FROM toks, LATERAL (
                        SELECT unnest(generate_series(1, len(l) - 7)) AS i) ii),
            psh AS (SELECT DISTINCT array_to_string(l[i:i+7], ' ') AS shingle
                    FROM toks, LATERAL (
                        SELECT unnest(generate_series(1, len(l) - 7)) AS i) ii
                    WHERE doc_id % 200 = 3)
            SELECT doc_id, count(*) AS n_overlap
            FROM csh JOIN psh USING (shingle)
            GROUP BY doc_id
        """,
        "token_heavy_hitters": (
            "WITH toks AS (SELECT unnest(regexp_extract_all(text, '"
            + text_ops.BPE_SPLIT_PATTERN.replace("'", "''")
            + "')) AS token FROM documents) "
            "SELECT token, count(*) AS n FROM toks GROUP BY token "
            "ORDER BY n DESC, token LIMIT 25"
        ),
        "quantity_quantiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_quantity, 0.25), 6) AS q25_r6,
                   round(quantile_cont(l_quantity, 0.5), 6) AS q50_r6,
                   round(quantile_cont(l_quantity, 0.75), 6) AS q75_r6
            FROM lineitem GROUP BY l_returnflag
        """,
        "dedup_lines": _line_dedup_oracle(keep_first=False),
        "dedup_lines_keep_first": _line_dedup_oracle(keep_first=True),
        "substring_dedup": _substring_dedup_oracle(keep_first=False),
        "substring_dedup_keep_first": _substring_dedup_oracle(keep_first=True),
        "prototypicality": _prototypicality_oracle(),
        "kmeans_clusters": _kmeans_oracle(),
        "bm25_topk": _bm25_oracle(),
        "pq_topk": _pq_oracle(),
        "ivfpq_topk": _pq_oracle(n_cells=16, nprobe=4),
        "bpe_merges": _bpe_oracle(),
        "bpe_token_stats": _bpe_encode_oracle(),
        "bigram_nll": _bigram_nll_oracle(),
        "tfidf_terms": _tfidf_oracle(),
        "char_entropy": _char_entropy_oracle(),
        "quality_corpus": _quality_corpus_oracle(),
        "intra_line_dedup": _intra_line_oracle(),
        "dsir_weights": _dsir_oracle(),
        "dsir_sample": _dsir_sample_oracle(),
        "split_leakage": _split_leakage_oracle(),
        "temperature_mix": _temperature_mix_oracle(),
        "dedup_against": _dedup_against_oracle(),
        # the Bloom pre-filter is exact by construction (anti-join corrects
        # false positives) — same oracle, and the hash match proves it
        "dedup_against_bloom": _dedup_against_oracle(),
        "gopher_rules": _gopher_oracle(),
        "semantic_dedup": _semantic_dedup_oracle(),
        "duplicate_clusters": f"""
            WITH RECURSIVE {_SHINGLES_CTE},
            shc AS (
                SELECT sh.doc_id, sh.shingle FROM sh
                JOIN (SELECT shingle FROM sh GROUP BY shingle
                      HAVING count(*) <= 1000) f USING (shingle)
            ),
            sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            pairs AS (
                SELECT id_a, id_b FROM common
                JOIN sizes sa ON sa.doc_id = id_a
                JOIN sizes sb ON sb.doc_id = id_b
                WHERE CAST(common AS DOUBLE)
                      / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= 0.2
            ),
            verts AS (SELECT id_a AS id FROM pairs UNION SELECT id_b FROM pairs),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION SELECT id_b, id_a FROM pairs),
            reach AS (
                SELECT id, id AS label FROM verts
                UNION
                SELECT e.dst AS id, r.label
                FROM edges e JOIN reach r ON r.id = e.src
            )
            SELECT id AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
            FROM reach GROUP BY id
        """,
        "asof_click_before_purchase": """
            WITH l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'purchase'),
            r AS (SELECT user_id, ts,
                         CASE WHEN CAST(floor(max(value) * 100) AS BIGINT)
                                   % 7 = 0
                              THEN NULL ELSE max(value) END AS click_value
                  FROM events WHERE event_type = 'click'
                  GROUP BY user_id, ts)
            SELECT l.event_id, l.user_id, l.value,
                   r.click_value AS click_value_asof
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        # the bucketed-carry variant must produce the identical result
        "asof_skew_buckets": """
            WITH l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'purchase'),
            r AS (SELECT user_id, ts,
                         CASE WHEN CAST(floor(max(value) * 100) AS BIGINT)
                                   % 7 = 0
                              THEN NULL ELSE max(value) END AS click_value
                  FROM events WHERE event_type = 'click'
                  GROUP BY user_id, ts)
            SELECT l.event_id, l.user_id, l.value,
                   r.click_value AS click_value_asof
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        # Expected-values pin, not an independent recomputation (a t-digest
        # cannot run in SQL): legitimate ONLY because the sketch is now a
        # deterministic pure function of the value multiset — verified
        # bit-identical across parallelism levels, input layouts, and Arrow
        # batch sizes (tests/test_tdigest.py); accuracy vs the exact
        # histogram path is asserted in pytest. Counts cross-check against
        # the drift_events oracle's n_reference/n_current.
        "drift_events_tdigest": """
            SELECT CAST(2006 AS BIGINT) AS n_reference,
                   CAST(1981 AS BIGINT) AS n_current,
                   CAST(0.02825 AS DOUBLE) AS ks_r6,
                   CAST(0.012538 AS DOUBLE) AS psi_r6,
                   CAST(35.264846 AS DOUBLE) AS med_ref_r6,
                   CAST(33.984657 AS DOUBLE) AS med_cur_r6,
                   CAST(222.3824 AS DOUBLE) AS p99_ref_r6
        """,
    }
