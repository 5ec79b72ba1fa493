"""Semantic tests for the round-5 kmeans and bm25_topk operators.

The driver-gate parity (Spark vs DuckDB hash at sf0.01) is covered by the
parametrized test_entry_oracle::test_query_matches_oracle; these pin the
operator SEMANTICS on constructed corpora — cluster separation, the
empty-cluster keep-old carry, partitioning invariance, and a from-scratch
Python BM25 recomputation.
"""

import math

import pytest

from pyspark.sql import functions as F

from json_schema_spark.pipeline import similarity, text


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_separates_two_blobs(spark):
    # two tight cones around orthogonal axes — any sane k-means with k=2
    # puts each cone in one cluster regardless of seeding
    rows = []
    for i in range(20):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))
        rows.append((100 + i, [eps, 0.0, 1.0, 0.0]))
    cen, assign = similarity.kmeans(_vecs(spark, rows), k=2, n_iters=3)
    got = {r["vec_id"]: r["cid"] for r in assign.collect()}
    a_labels = {got[i] for i in range(20)}
    b_labels = {got[100 + i] for i in range(20)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    # cosines to the own-cone centroid are near 1
    assert all(r["cosine"] > 0.99 for r in assign.collect())
    assert cen.count() == 2


def test_kmeans_partitioning_invariant(spark):
    # exact integer lattice + driver-side rounding → labels AND cosines are
    # bit-identical under any input partitioning
    rows = [(i, [math.sin(i * 0.7 + d) for d in range(8)])
            for i in range(60)]
    df1 = _vecs(spark, rows).repartition(1)
    df2 = _vecs(spark, rows).repartition(13, "vec_id")
    _, a1 = similarity.kmeans(df1, k=4, n_iters=2)
    _, a2 = similarity.kmeans(df2, k=4, n_iters=2)
    r1 = sorted((r["vec_id"], r["cid"], r["cosine"]) for r in a1.collect())
    r2 = sorted((r["vec_id"], r["cid"], r["cosine"]) for r in a2.collect())
    assert r1 == r2


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # 3 distinct points, k=3, but two points are identical directions →
    # at most 2 clusters can hold members; the starved centroid must keep
    # its round-0 vector (no crash, no NULLs) and every vector stays
    # assigned
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]),
            (4, [0.0, 1.0])]
    cen, assign = similarity.kmeans(_vecs(spark, rows), k=3, n_iters=3)
    out = assign.collect()
    assert len(out) == 4
    assert all(r["cid"] is not None and r["cosine"] is not None for r in out)
    assert cen.count() == 3


def test_kmeans_excludes_null_and_zero_vectors(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, None),
            (4, [0.5, 0.5])]
    _, assign = similarity.kmeans(_vecs(spark, rows), k=2, n_iters=1)
    ids = {r["vec_id"] for r in assign.collect()}
    assert ids == {1, 4}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_matches_python_reference(spark):
    corpus = [
        (1, "spark join join hash"),
        (2, "hash table scan"),
        (3, "vector vector vector spark"),
        (4, "nothing relevant here"),
        (5, None),
    ]
    terms = ["join", "vector", "spark"]
    k1, b = 1.2, 0.75
    got = {r["doc_id"]: r["score"]
           for r in text.bm25_topk(_docs(spark, corpus), terms,
                                   n=10, k1=k1, b=b).collect()}

    # from-scratch reference (plain Python floats, same formula)
    toks = {d: t.split() for d, t in corpus if t is not None}
    # NULL-text rows DO count in N: the stats pass is count(lit(1))
    n_docs = len(corpus)
    dls = {d: len(tk) for d, tk in toks.items()}
    avgdl = sum(dls.values()) / n_docs
    exp = {}
    for d, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            dft = sum(1 for tk2 in toks.values() if t in tk2)
            idf = math.log(1.0 + ((n_docs - dft) + 0.5) / (dft + 0.5))
            s = s + idf * ((tf * (k1 + 1.0))
                           / (tf + k1 * ((1.0 - b)
                                         + b * dls[d] / avgdl)))
        if s > 0:
            exp[d] = s
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=0, abs=0), d


def test_bm25_limit_and_tiebreak(spark):
    # identical docs tie on score — the doc_id tie-break makes the cut
    # deterministic
    corpus = [(i, "spark hash") for i in range(10)]
    out = text.bm25_topk(_docs(spark, corpus), ["spark"], n=3).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]


def test_bm25_rejects_empty_query(spark):
    with pytest.raises(ValueError):
        text.bm25_topk(_docs(spark, [(1, "x")]), [])


def test_bm25_all_null_text(spark):
    # review finding: per-term df aggregates are NULL over an all-NULL
    # corpus; the guard must treat them as 0 instead of raising
    d = _docs(spark, [(1, None), (2, None)])
    assert text.bm25_topk(d, ["x"], n=5).collect() == []


def test_kmeans_centroids_plug_into_ivf_family(spark):
    # the docstring contract: kmeans output is a drop-in trained coarse
    # quantizer for ivf_topk / prototypicality / semantic_dedup
    rows = []
    for i in range(25):
        eps = (i % 5) * 0.01
        rows.append((i, [1.0, eps, 0.0, 0.0]))
        rows.append((100 + i, [eps, 0.0, 1.0, 0.0]))
    emb = _vecs(spark, rows)
    cen, _ = similarity.kmeans(emb, k=2, n_iters=2)
    cen = cen.persist()

    # prototypicality with trained centroids: every vector is near its
    # own cone's centroid
    pr = similarity.prototypicality(emb, centroids=cen).collect()
    assert len(pr) == 50
    assert all(r["proto"] > 0.98 for r in pr)
    by_cone = {}
    for r in pr:
        by_cone.setdefault(r["vec_id"] // 100, set()).add(r["cid"])
    assert all(len(v) == 1 for v in by_cone.values())
    assert by_cone[0] != by_cone[1]

    # ivf_topk with trained centroids: neighbors stay intra-cone
    nb = similarity.ivf_topk(emb, k=3, nprobe=1, centroids=cen).collect()
    assert nb and all(r["query_id"] // 100 == r["neighbor_id"] // 100
                      for r in nb)

    # semantic_dedup with trained centroids runs end-to-end
    sd = similarity.semantic_dedup(emb, threshold=0.995,
                                   centroids=cen).collect()
    assert {r["vec_id"] for r in sd} == {r[0] for r in rows}
