"""Semantic tests for product-quantization ANN (similarity.pq_topk).

Driver-gate parity (full DuckDB replay at sf0.01) is covered by
test_entry_oracle; these pin operator semantics on constructed corpora:
PQ recall against exact brute force on separable data, partitioning
invariance, the train-on-a-sample path, and degenerate corpora.
"""

import math

import pytest

from json_schema_spark.pipeline import similarity


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _cone_corpus():
    # 3 tight cones around orthogonal axis pairs in dim 8 — near neighbors
    # are intra-cone, so even a 1-round PQ codebook ranks them first
    rows = []
    for i in range(30):
        eps = (i % 6) * 0.02
        a = [1.0, eps, 0.0, 0.0, eps, 0.0, 0.0, 0.0]
        b = [0.0, 0.0, 1.0, eps, 0.0, 0.0, eps, 0.0]
        c = [0.0, eps, 0.0, 0.0, 0.0, 1.0, 0.0, eps]
        rows += [(i, a), (100 + i, b), (200 + i, c)]
    return rows


def test_pq_topk_recall_on_separable_cones(spark):
    rows = _cone_corpus()
    out = similarity.pq_topk(_vecs(spark, rows), k=5, n_queries=6,
                             m=4, k_sub=8, n_iters=2).collect()
    assert out, "no results"
    # every ranked neighbor of a cone member is from the same cone
    cone = lambda v: v // 100
    for r in out:
        assert cone(r["query_id"]) == cone(r["neighbor_id"]), r
    # each query got a full top-5 and ranks are 1..5
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 6)) for v in by_q.values())


def test_pq_topk_partitioning_invariant(spark):
    rows = [(i, [math.sin(i * 0.7 + d) for d in range(8)])
            for i in range(50)]
    a = similarity.pq_topk(_vecs(spark, rows).repartition(1),
                           k=4, n_queries=3, m=2, k_sub=4, n_iters=1)
    b = similarity.pq_topk(_vecs(spark, rows).repartition(11, "vec_id"),
                           k=4, n_queries=3, m=2, k_sub=4, n_iters=1)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    # shard count must not change results either (two-phase == one window)
    c = similarity.pq_topk(_vecs(spark, rows), k=4, n_queries=3, m=2,
                           k_sub=4, n_iters=1, shards=1)
    assert sorted(tuple(r) for r in c.collect()) == ra


def test_pq_train_fraction_encodes_full_corpus(spark):
    rows = [(i, [math.cos(i * 0.3 + d) for d in range(8)])
            for i in range(40)]
    _, codes_df, base = similarity.pq_train_encode(
        _vecs(spark, rows), m=2, k_sub=4, n_iters=1, train_fraction=0.4)
    try:
        # codebooks trained on ~40% but every corpus vector gets codes
        got = codes_df.collect()
        assert len(got) == 40
        assert all(r["codes"] is not None and len(r["codes"]) == 2
                   for r in got)
        assert all(0 <= c < 4 for r in got for c in r["codes"])
    finally:
        base.unpersist()


def test_pq_identical_corpus_degenerate(spark):
    # 10 identical vectors: all collapse to one code word; scores tie and
    # the (score desc, neighbor_id) tie-break must produce clean ranks
    rows = [(i, [1.0, 2.0, -1.0, 0.5]) for i in range(10)]
    out = similarity.pq_topk(_vecs(spark, rows), k=3, n_queries=2,
                             m=2, k_sub=4, n_iters=1).collect()
    by_q = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q, pairs in by_q.items():
        pairs.sort()
        assert [p[0] for p in pairs] == [1, 2, 3]
        # ties broken by ascending neighbor id
        nbrs = [p[1] for p in pairs]
        assert nbrs == sorted(nbrs)


def test_pq_rejects_indivisible_dims(spark):
    rows = [(i, [1.0, 0.0, 0.5]) for i in range(5)]
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_train_encode(_vecs(spark, rows), m=2, k_sub=2)


def test_pq_excludes_null_and_zero_vectors(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None),
            (4, [0.5, 0.5]), (5, [0.4, 0.6]), (6, [0.9, 0.1])]
    _, codes_df, base = similarity.pq_train_encode(
        _vecs(spark, rows), m=1, k_sub=2, n_iters=1)
    try:
        assert {r["vec_id"] for r in codes_df.collect()} == {1, 4, 5, 6}
    finally:
        base.unpersist()


def test_ivfpq_candidates_respect_probes(spark):
    # with nprobe == n_cells results equal the plain PQ scan; with a
    # smaller nprobe every returned neighbor must live in a probed cell
    rows = _cone_corpus()
    emb = _vecs(spark, rows)
    full = similarity.ivfpq_topk(emb, k=5, n_queries=4, n_cells=6,
                                 nprobe=6, m=4, k_sub=8, n_iters=1)
    plain = similarity.pq_topk(emb, k=5, n_queries=4, m=4, k_sub=8,
                               n_iters=1)
    assert sorted(tuple(r) for r in full.collect()) == \
        sorted(tuple(r) for r in plain.collect())

    pruned = similarity.ivfpq_topk(emb, k=5, n_queries=4, n_cells=6,
                                   nprobe=2, m=4, k_sub=8, n_iters=1)
    got = pruned.collect()
    assert got
    # own-cone neighbors still dominate (probing keeps the right lists)
    same = sum(1 for r in got if r["query_id"] // 100 == r["neighbor_id"] // 100)
    assert same >= len(got) * 0.8, got


def test_ivfpq_partitioning_invariant(spark):
    rows = [(i, [math.sin(i * 0.9 + d) for d in range(8)])
            for i in range(50)]
    a = similarity.ivfpq_topk(_vecs(spark, rows).repartition(1), k=4,
                              n_queries=3, n_cells=5, nprobe=2, m=2,
                              k_sub=4, n_iters=1)
    b = similarity.ivfpq_topk(_vecs(spark, rows).repartition(7, "vec_id"),
                              k=4, n_queries=3, n_cells=5, nprobe=2, m=2,
                              k_sub=4, n_iters=1)
    assert sorted(tuple(r) for r in a.collect()) == \
        sorted(tuple(r) for r in b.collect())


def test_pq_topk_string_ids(spark):
    # ids are opaque: the broadcast query frame must copy the corpus id
    # type instead of hardcoding bigint (review finding)
    rows = [(f"doc-{i}", [math.sin(i * 0.7 + d) for d in range(8)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    out = similarity.pq_topk(df, k=3, n_queries=2, m=2, k_sub=4,
                             n_iters=1).collect()
    assert out and all(isinstance(r["query_id"], str) for r in out)
    out2 = similarity.ivfpq_topk(df, k=3, n_queries=2, n_cells=4, nprobe=2,
                                 m=2, k_sub=4, n_iters=1).collect()
    assert out2 and all(isinstance(r["neighbor_id"], str) for r in out2)


def test_pq_rejects_zero_queries(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.5, 0.5])]
    with pytest.raises(ValueError, match="n_queries"):
        similarity.pq_topk(_vecs(spark, rows), n_queries=0, m=1, k_sub=2)
