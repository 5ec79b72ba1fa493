"""Round-4 scale-hardening tests (r3 VERDICT "Next round" #1/#2/#4 and
ADVICE r3):

- ``cap_bucket_fanout``: a planted degenerate corpus (10 k identical
  docs / vectors — one boilerplate bucket per band) must NOT produce
  |bucket|² candidate pairs; recall on the planted non-degenerate near-dup
  pair must hold; the drop must be logged (no silent caps).
- ``duplicate_clusters``: hitting max_iterations unconverged fails loudly
  (or warns when opted in) instead of silently returning split clusters.
- cache contract: every pipeline op that persists intermediates registers
  them on its result; ``cache.release`` leaves zero extra cached blocks.
- NULL embeddings: bucketizer paths agree (NULL bucket, no job abort);
  pair cosine emits NULL instead of crashing the Arrow batch.
"""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from json_schema_spark.pipeline import cache, dedup, similarity

BOILER = "the quick brown fox jumps over the lazy dog again and again today"
DOC_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon")
DOC_B = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau phi")


def _degenerate_docs(spark, n=10_000):
    rows = [(i, BOILER) for i in range(n)]
    rows += [(100_000, DOC_A), (100_001, DOC_B)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_minhash_cap_bounds_degenerate_bucket(spark, caplog):
    df = _degenerate_docs(spark)
    with caplog.at_level(logging.WARNING,
                         logger="json_schema_spark.pipeline.dedup"):
        out = dedup.minhash_lsh_candidates(df, max_bucket_size=100)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
    cache.release(out)
    # the 10k-doc boilerplate bucket would alone contribute ~5*10^7 pairs;
    # with the cap the candidate set is the planted pair (and nothing from
    # the degenerate bucket)
    assert (100_000, 100_001) in pairs
    assert len(pairs) <= 5
    assert any("minhash_lsh_candidates: dropped" in r.message
               for r in caplog.records)


def test_simhash_cap_bounds_degenerate_bucket(spark, caplog):
    df = _degenerate_docs(spark)
    with caplog.at_level(logging.WARNING,
                         logger="json_schema_spark.pipeline.dedup"):
        out = dedup.simhash_near_pairs(df, max_bucket_size=100)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
    cache.release(out)
    assert (100_000, 100_001) in pairs
    assert len(pairs) <= 5
    assert any("simhash_near_pairs: dropped" in r.message
               for r in caplog.records)


def test_embedding_cap_bounds_degenerate_bucket(spark, caplog):
    import numpy as np

    rng = np.random.RandomState(11)
    boiler = rng.normal(size=16)
    w = rng.normal(size=16)
    rows = [(i, [float(x) for x in boiler]) for i in range(10_000)]
    rows.append((100_000, [float(x) for x in w]))
    rows.append((100_001, [float(x) for x in (w + 0.02 * rng.normal(size=16))]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    with caplog.at_level(logging.WARNING,
                         logger="json_schema_spark.pipeline.dedup"):
        out = similarity.embedding_near_dups(df, threshold=0.9,
                                             max_bucket_size=100)
        pairs = {(r.id_a, r.id_b) for r in out.collect()}
    cache.release(out)
    assert (100_000, 100_001) in pairs
    assert len(pairs) <= 5
    assert any("embedding_near_dups: dropped" in r.message
               for r in caplog.records)


def test_cap_disabled_and_unhit_paths(spark):
    df = _degenerate_docs(spark, n=20)  # small: no bucket over default cap
    out = dedup.minhash_lsh_candidates(df)  # default cap 5000 unhit
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    cache.release(out)
    assert (100_000, 100_001) in pairs
    # every boilerplate pair is a candidate when nothing is dropped
    assert len(pairs) == 20 * 19 // 2 + 1

    out2 = dedup.minhash_lsh_candidates(df, max_bucket_size=None)
    assert out2.count() == len(pairs)
    cache.release(out2)


def test_duplicate_clusters_nonconvergence_raises_and_warns(spark):
    # path graph of diameter 9: the min label travels one hop per round,
    # so 3 rounds cannot converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iterations=3)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = dedup.duplicate_clusters(pairs, max_iterations=3,
                                       on_max_iterations="warn")
        assert out.count() == 10  # partial labels still returned on opt-in
    with pytest.raises(ValueError, match="on_max_iterations"):
        dedup.duplicate_clusters(pairs, on_max_iterations="explode")


def test_pointer_jumping_converges_in_log_rounds(spark):
    """shortcut=True compresses label chains (label := label(label)) every
    round, so a diameter-60 path converges within 10 rounds — plain
    hash-min would need ~60 and raise. Both modes agree on the final
    labels (component min)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 61)], "id_a bigint, id_b bigint")
    out = dedup.duplicate_clusters(pairs, max_iterations=10)
    rows = out.collect()
    assert {r.cluster_id for r in rows} == {1} and len(rows) == 61

    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.duplicate_clusters(pairs, max_iterations=10, shortcut=False)

    # plain mode still reaches the same fixpoint given enough rounds
    base = dedup.duplicate_clusters(
        spark.createDataFrame([(i, i + 1) for i in range(1, 10)],
                              "id_a bigint, id_b bigint"),
        max_iterations=25, shortcut=False)
    assert {r.cluster_id for r in base.collect()} == {1}


def _cached_ids(spark):
    """Ids of currently-persisted RDDs. Compared as SETS, not counts: the
    ContextCleaner asynchronously drops RDDs from earlier tests (e.g.
    collected localCheckpoints), so counts drift downward on their own —
    what must hold is that the ids a query ADDED are gone after release."""
    return {int(i) for i in
            spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()}


def test_release_contract_leaves_no_cached_blocks(spark):
    """r3 VERDICT #4: each persist-using pipeline op registers its cached
    intermediates on the result; release() returns the session to the
    baseline cached-block count."""
    import numpy as np

    docs = spark.createDataFrame(
        [(i, f"token{i} alpha beta gamma delta epsilon zeta eta theta")
         for i in range(60)], "doc_id bigint, text string")
    rng = np.random.RandomState(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)],
        "vec_id bigint, embedding array<float>")

    ops = [
        lambda: dedup.jaccard_pairs(docs),
        lambda: dedup.minhash_lsh_candidates(docs),
        lambda: dedup.simhash_near_pairs(docs),
        lambda: similarity.lsh_topk(emb, k=3, bands=2, planes=4),
        lambda: similarity.embedding_near_dups(emb, threshold=0.8,
                                               bands=2, planes_per_band=4),
        lambda: similarity.ivf_topk(emb, k=3, n_centroids=4, nprobe=2),
    ]
    for op in ops:
        base = _cached_ids(spark)
        out = op()
        out.collect()
        assert len(cache.deps_of(out)) >= 1
        added = _cached_ids(spark) - base
        assert added  # intermediates really were cached
        cache.release(out, blocking=True)
        assert not (_cached_ids(spark) & added)


def test_materialize_parquet_mode(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"tok{i} alpha beta gamma delta epsilon zeta eta theta")
         for i in range(30)], "doc_id bigint, text string")
    base = _cached_ids(spark)
    out = dedup.jaccard_pairs(docs)
    got = cache.materialize(out, path=str(tmp_path / "pairs"))
    # zero NEW blocks left after write-mode materialize
    assert _cached_ids(spark) <= base
    assert got.columns == ["id_a", "id_b", "jaccard"]
    got.count()  # read-back is a plain parquet scan


def test_null_embeddings_bucket_and_cosine(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(0, None)] + [(i, [float(x) for x in rng.normal(size=8)])
                          for i in range(1, 6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    # expression path: NULL vector -> NULL bucket, job does NOT abort
    # (ADVICE r3: raise_error fired under ANSI because size(NULL) is NULL);
    # a leading NULL row must not make _resolve_dims treat the table as empty
    got = {r.vec_id: r.bucket
           for r in similarity.hyperplane_buckets(df, planes=4).collect()}
    assert got[0] is None
    assert all(got[i] is not None for i in range(1, 6))

    # Arrow path: NULL vector -> no band rows (documented skip)
    bands = similarity.hyperplane_bands(df, bands=2, planes_per_band=4)
    assert bands.where(F.col("vec_id") == 0).count() == 0

    # pair-cosine path without bands pre-filter: NULL cosine, no crash
    out = similarity.cosine_topk(df, k=5).collect()
    null_cos = [r for r in out if r.neighbor_id == 0]
    assert null_cos and all(r.cosine is None for r in null_cos)


def test_lang_hits_regexp_matches_hof_filter(spark):
    """_lang_hits (regexp_count, codegen) must count exactly what the
    interpreted token-filter form counts — incl. consecutive stopwords,
    leading/trailing/multiple whitespace, case, and empty text."""
    from json_schema_spark.pipeline.text import LANG_PROFILES, tokens

    texts = ["of the and to a", "THE the tHe", "  a  of  ", "",
             "nothing here matches", "der und das ist der", "atlas of maps",
             "a", "to to to to", "le la et y que el de des les the"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    from json_schema_spark.pipeline.text import _lang_hits

    for lang, words in LANG_PROFILES.items():
        hof = F.size(F.filter(tokens(F.col("text")),
                              lambda t: F.lower(t).isin(words)))
        out = df.select(hof.alias("a"),
                        _lang_hits(F.col("text"), words).alias("b")).collect()
        for i, r in enumerate(out):
            assert r.a == r.b, (lang, texts[i], r.a, r.b)


def test_quality_feature_codegen_forms_match_hof(spark):
    """avg_token_length (whitespace-strip length) and stopword_ratio
    (regexp_count) must equal their interpreted HOF formulations."""
    from json_schema_spark.pipeline.text import (STOPWORDS,
                                                 avg_token_length,
                                                 stopword_ratio, tokens)

    texts = ["of the and to a", "  padded   text  here ", "", "one",
             "a,b puncts! the end.", "THE A of In Is", "x  y\tz"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    toks = tokens(F.col("text"))
    hof_avg = (F.aggregate(toks, F.lit(0).cast("long"),
                           lambda acc, t: acc + F.length(t)).cast("double")
               / F.size(toks).cast("double"))
    hof_stop = (F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
                .cast("double") / F.size(toks).cast("double"))
    out = df.select(hof_avg.alias("a1"),
                    avg_token_length(F.col("text")).alias("a2"),
                    hof_stop.alias("s1"),
                    stopword_ratio(F.col("text")).alias("s2")).collect()
    for i, r in enumerate(out):
        assert r.a1 == r.a2, (texts[i], r.a1, r.a2)
        assert r.s1 == r.s2, (texts[i], r.s1, r.s2)


def test_nan_or_null_element_vector_yields_null_cosine(spark):
    """Review r4 finding: a NULL/NaN ELEMENT inside an embedding must
    NULL-propagate (like the Catalyst path) — casting NaN to int64 would
    produce INT64_MIN and a finite garbage cosine that can rank into
    top-k."""
    rows = [(0, [1.0, None, 2.0]),            # NULL element
            (1, [float("nan"), 1.0, 1.0]),    # NaN element
            (2, [1.0, 2.0, 3.0]),
            (3, [1.0, 2.0, 3.1]),
            (4, [9.0, 0.5, 0.1])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = similarity.cosine_topk(df, k=4).collect()
    bad = {0, 1}
    for r in out:
        if r.neighbor_id in bad or r.query_id in bad:
            assert r.cosine is None, r
        else:
            assert r.cosine is not None and -1.0 <= r.cosine <= 1.0, r
