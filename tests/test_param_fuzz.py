"""Parameter fuzzing for the pipeline oracles (r4 VERDICT #6).

The driver oracles and the randomized replays pin operator PARAMETERS to
one golden set (n=3 shingles, 8 hashes / 4 bands, 32/8 chunks, ...), so
the parameter-handling code — band slicing, integer-ceil chunk counts,
sample-cut rounding, window arithmetic — only ever runs on one point of
its domain. Each test here draws a random parameter set per seed,
REGENERATES the DuckDB SQL for those parameters, and compares against the
pipeline function called with the same parameters. Corpus is the seeded
random-docs table (same generator as test_random_docs_oracles) plus a
seeded random embeddings table.

One test per family (dedup, text, sampling, similarity), >= 5 seeds each.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from json_schema_spark.pipeline import cache, dedup, sampling
from json_schema_spark.pipeline import text as text_ops
from json_schema_spark.pipeline import similarity
from tests.test_entry_oracle import duck_rows, spark_rows
from tests.test_random_docs_oracles import _random_docs

SEEDS = [101, 202, 303, 404, 505]

_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"
# same published affine-permutation constants as pipeline.dedup
_COEFFS = [(1299721, 7), (15485863, 11), (32452843, 13), (49979687, 17),
           (67867967, 19), (86028121, 23), (104395301, 29), (122949823, 31)]
_P = 2_147_483_647
_MD5_INT = "CAST(concat('0x', substr(md5({x}), 1, 15)) AS BIGINT)"


# ---------------------------------------------------------------- corpus

@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    rng = random.Random(424_242)
    d = tmp_path_factory.mktemp("fuzz_sf")
    spark.createDataFrame(
        _random_docs(rng, n=120),
        "doc_id bigint, text string, lang string, source string, n_chars bigint") \
        .repartition(4).write.parquet(str(d / "documents.parquet"))
    emb = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(12)])
           for i in range(60)]
    spark.createDataFrame(emb, "vec_id bigint, embedding array<double>") \
        .repartition(4).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{fuzz_dir}/{t}.parquet/*.parquet')")
    return con


def _docs(spark, fuzz_dir):
    return spark.read.parquet(f"{fuzz_dir}/documents.parquet")


def _check(df, con, sql, label):
    expected, oracle_cols = duck_rows(con, sql)
    assert sorted(df.columns) == oracle_cols, label
    actual = spark_rows(df)
    assert len(actual) == len(expected), \
        f"{label}: rows {len(actual)} != {len(expected)}"
    mism = [i for i, (a, e) in enumerate(zip(actual, expected)) if a != e]
    assert not mism, (f"{label}: {len(mism)} mismatched rows; "
                      f"first: {actual[mism[0]]} != {expected[mism[0]]}")


# ------------------------------------------------------------ SQL builders

def _shingles_cte(n: int) -> str:
    return f"""toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
        sh AS (SELECT DISTINCT doc_id, array_to_string(l[i:i+{n - 1}], ' ') AS shingle
               FROM toks, LATERAL (
                   SELECT unnest(generate_series(1, len(l) - {n - 1})) AS i) idx)"""


def _perms_values(num_hashes: int) -> str:
    rows = ", ".join(f"({i}, {a}, {b})"
                     for i, (a, b) in enumerate(_COEFFS[:num_hashes]))
    return f"(VALUES {rows}) AS perms(perm, a, b)"


def _minhash_signatures_sql(n: int, num_hashes: int) -> str:
    return f"""
        WITH {_shingles_cte(n)},
        h AS (SELECT doc_id, {_MD5_INT.format(x='shingle')} % {_P} AS hv FROM sh)
        SELECT doc_id, perm, min((a * hv + b) % {_P}) AS minhash
        FROM h, {_perms_values(num_hashes)}
        GROUP BY doc_id, perm
    """


def _lsh_candidates_sql(n: int, num_hashes: int, bands: int) -> str:
    rpb = num_hashes // bands
    return f"""
        WITH {_shingles_cte(n)},
        h AS (SELECT doc_id, {_MD5_INT.format(x='shingle')} % {_P} AS hv FROM sh),
        sg AS (SELECT doc_id, perm, min((a * hv + b) % {_P}) AS mh
               FROM h, {_perms_values(num_hashes)} GROUP BY doc_id, perm),
        banded AS (SELECT doc_id, perm // {rpb} AS band,
                          string_agg(mh::VARCHAR, '_' ORDER BY perm) AS bucket
                   FROM sg GROUP BY doc_id, perm // {rpb})
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


def _jaccard_sql(n: int, threshold: float, max_freq: int) -> str:
    return f"""
        WITH {_shingles_cte(n)},
        shc AS (SELECT sh.doc_id, sh.shingle FROM sh
                JOIN (SELECT shingle FROM sh GROUP BY shingle
                      HAVING count(*) <= {max_freq}) f USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
                   FROM shc a JOIN shc b
                     ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
        SELECT id_a, id_b,
               round(CAST(common AS DOUBLE)
                     / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE), 6) AS jaccard_r6
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - common AS DOUBLE) >= {threshold}
    """


def _chunks_cte(chunk: int, overlap: int) -> str:
    s = chunk - overlap
    return f"""toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
        base AS (SELECT doc_id, l, len(l) AS n,
                        CASE WHEN len(l) <= {chunk} THEN 1
                             ELSE 1 + (len(l) - {chunk} + {s - 1}) // {s} END AS n_chunks
                 FROM toks),
        chunks AS (SELECT doc_id, i AS chunk_idx,
                          array_to_string(l[i * {s} + 1 : i * {s} + {chunk}], ' ') AS chunk_text,
                          least({chunk}, n - i * {s}) AS n_tokens
                   FROM base, LATERAL (
                       SELECT unnest(generate_series(0, n_chunks - 1)) AS i) ii)"""


def _doc_chunks_sql(chunk: int, overlap: int) -> str:
    return (f"WITH {_chunks_cte(chunk, overlap)} "
            "SELECT doc_id, chunk_idx, chunk_text, n_tokens FROM chunks")


def _pack_sql(chunk: int, overlap: int, budget: int, n_shards: int) -> str:
    return f"""
        WITH {_chunks_cte(chunk, overlap)},
        sharded AS (SELECT doc_id, chunk_idx, n_tokens,
                           CAST({_MD5_INT.format(
                               x="concat('pack_', CAST(doc_id AS VARCHAR))")}
                                % {n_shards} AS INT) AS shard
                    FROM chunks),
        run AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard
                             ORDER BY doc_id, chunk_idx
                             ROWS UNBOUNDED PRECEDING) AS running
                FROM sharded)
        SELECT doc_id, chunk_idx, shard,
               CAST((running - n_tokens) // {budget} AS INT) AS seq_id,
               CAST((running - n_tokens) % {budget} AS INT) AS seq_offset
        FROM run
    """


def _ngram_repetition_sql(n: int) -> str:
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS l FROM documents),
        g AS (SELECT doc_id, array_to_string(l[i:i+{n - 1}], ' ') AS gram
              FROM toks, LATERAL (
                  SELECT unnest(generate_series(1, len(l) - {n - 1})) AS i) ii),
        stats AS (SELECT doc_id, count(*) AS n_grams,
                         count(DISTINCT gram) AS n_distinct FROM g GROUP BY doc_id),
        tops AS (SELECT doc_id, max(c) AS top FROM (
                     SELECT doc_id, gram, count(*) AS c
                     FROM g GROUP BY doc_id, gram) GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(coalesce(s.n_grams, 0) AS INT) AS n_grams,
               CAST(coalesce(s.n_distinct, 0) AS INT) AS n_distinct,
               round(coalesce((s.n_grams - s.n_distinct)
                              / CAST(s.n_grams AS DOUBLE), 0.0), 6) AS dup_frac_r6,
               round(coalesce(tp.top / CAST(s.n_grams AS DOUBLE), 0.0), 6)
                   AS top_share_r6
        FROM toks t
        LEFT JOIN stats s USING (doc_id)
        LEFT JOIN tops tp USING (doc_id)
    """


def _stratified_sql(fractions: dict, seed: int) -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {int(round(frac * 10000))}"
        for lang, frac in fractions.items())
    return f"""
        WITH b AS (SELECT doc_id, lang,
                          {_MD5_INT.format(
                              x=f"concat('sample_{seed}_', CAST(doc_id AS VARCHAR))")}
                              % 10000 AS bucket
                   FROM documents)
        SELECT doc_id, lang FROM b
        WHERE bucket < CASE lang {cases} ELSE 0 END
    """


def _split_sql(splits: dict, seed: int) -> str:
    cuts, cum = [], 0
    for name, frac in splits.items():
        cum += int(round(frac * 10000))
        cuts.append((name, cum))
    whens = " ".join(f"WHEN bucket < {c} THEN '{name}'" for name, c in cuts)
    last = list(splits.keys())[-1]
    return f"""
        WITH b AS (SELECT doc_id,
                          {_MD5_INT.format(
                              x=f"concat('split_{seed}_', CAST(doc_id AS VARCHAR))")}
                              % 10000 AS bucket
                   FROM documents)
        SELECT doc_id, CASE {whens} ELSE '{last}' END AS split FROM b
    """


# ----------------------------------------------------------------- tests

@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_dedup_family(spark, fuzz_dir, fuzz_duck, seed):
    rng = random.Random(seed)
    n = rng.choice([2, 3, 4])
    bands = rng.choice([1, 2, 4])
    rpb = rng.choice([1, 2])
    num_hashes = min(bands * rpb * rng.choice([1, 2]), 8)
    bands = max(b for b in (1, 2, 4) if num_hashes % b == 0 and b <= num_hashes)
    threshold = rng.choice([0.05, 0.1, 0.25, 0.4])
    max_freq = rng.choice([20, 100, 1000])
    d = _docs(spark, fuzz_dir)
    label = f"seed={seed} n={n} hashes={num_hashes} bands={bands}"

    sigs = dedup.minhash_signatures(d, n=n, num_hashes=num_hashes) \
        .select("doc_id", F.posexplode("sig").alias("perm", "minhash"))
    _check(sigs, fuzz_duck, _minhash_signatures_sql(n, num_hashes),
           f"minhash_signatures {label}")

    cands = dedup.minhash_lsh_candidates(
        d, n=n, num_hashes=num_hashes, bands=bands, max_bucket_size=None)
    _check(cands, fuzz_duck, _lsh_candidates_sql(n, num_hashes, bands),
           f"lsh_candidates {label}")
    cache.release(cands)

    pairs = dedup.jaccard_pairs(d, n=n, threshold=threshold,
                                max_shingle_freq=max_freq) \
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r6"))
    _check(pairs, fuzz_duck, _jaccard_sql(n, threshold, max_freq),
           f"jaccard {label} thr={threshold} freq={max_freq}")
    cache.release(pairs)

    # Bloom pre-filter exactness at a random fpp / reference slice: the
    # plain anti-join is the oracle — any false positive the correction
    # join misses, or any false negative at all, breaks set equality
    fpp = rng.choice([0.3, 0.1, 0.01, 0.001])
    mod = rng.choice([2, 3, 5])
    ref = d.where(F.col("doc_id") % mod == 0).select("text")
    plain = {r.doc_id for r in dedup.dedup_against(d, ref).collect()}
    res = dedup.dedup_against(d, ref, bloom_fpp=fpp)
    assert {r.doc_id for r in res.collect()} == plain, \
        f"bloom parity seed={seed} fpp={fpp} mod={mod}"
    cache.release(res)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_text_family(spark, fuzz_dir, fuzz_duck, seed):
    rng = random.Random(seed)
    chunk = rng.randrange(5, 41)
    overlap = rng.randrange(0, chunk)
    budget = rng.randrange(chunk, 4 * chunk + 1)
    n_shards = rng.choice([1, 3, 8])
    rep_n = rng.choice([2, 3, 4])
    k = rng.randrange(4, 11)
    window = rng.randrange(2, 7)
    d = _docs(spark, fuzz_dir)
    label = f"seed={seed} chunk={chunk}/{overlap} budget={budget}"

    chunks = text_ops.chunk_documents(d, chunk_tokens=chunk, overlap=overlap)
    _check(chunks, fuzz_duck, _doc_chunks_sql(chunk, overlap),
           f"doc_chunks {label}")

    packed = text_ops.pack_sequences(
        text_ops.chunk_documents(d, chunk_tokens=chunk, overlap=overlap)
        .select("doc_id", "chunk_idx", "n_tokens"),
        budget=budget, n_shards=n_shards) \
        .select("doc_id", "chunk_idx", "shard", "seq_id", "seq_offset")
    _check(packed, fuzz_duck, _pack_sql(chunk, overlap, budget, n_shards),
           f"pack {label} shards={n_shards}")

    rep = text_ops.ngram_repetition(d, n=rep_n)
    _check(rep, fuzz_duck, _ngram_repetition_sql(rep_n),
           f"ngram_repetition seed={seed} n={rep_n}")

    from __spark_entry__ import _winnow_oracle

    fps = text_ops.winnow_fingerprints(d, k=k, window=window)
    _check(fps, fuzz_duck, _winnow_oracle(k=k, window=window),
           f"winnow seed={seed} k={k} w={window}")


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_sampling_family(spark, fuzz_dir, fuzz_duck, seed):
    rng = random.Random(seed)
    langs = ["en", "de", "es", "fr", "zh"]
    fractions = {lang: rng.randrange(0, 10001) / 10000.0
                 for lang in rng.sample(langs, rng.randrange(2, 5))}
    a = rng.randrange(1, 9000) / 10000.0
    b = rng.randrange(1, int((1 - a) * 10000)) / 10000.0
    splits = {"train": a, "val": b, "test": round(1.0 - a - b, 4)}
    d = _docs(spark, fuzz_dir)

    samp = sampling.stratified_hash_sample(
        d, fractions, strata_col="lang", seed=seed).select("doc_id", "lang")
    _check(samp, fuzz_duck, _stratified_sql(fractions, seed),
           f"stratified seed={seed} {fractions}")

    sp = sampling.hash_split(d, splits, seed=seed).select("doc_id", "split")
    _check(sp, fuzz_duck, _split_sql(splits, seed),
           f"split seed={seed} {splits}")

    # Gumbel-top-k: random (n, gumbel seed) against regenerated SQL — the
    # float noise chain (52-bit uniform, two lns, one add) must match
    # bit-for-bit at any parameter point, not just the golden one
    n = rng.randrange(5, 100)
    gseed = rng.randrange(0, 10_000)
    w = d.select("doc_id", F.expr(
        "CAST(doc_id % 13 AS DOUBLE) / 3.0 - 1.5").alias("logw"))
    out = sampling.importance_sample(w, n=n, seed=gseed)
    two52 = 1 << 52
    h = _MD5_INT.format(
        x=f"concat('gumbel|{gseed}|', CAST(doc_id AS VARCHAR))")
    _check(out, fuzz_duck, f"""
        WITH w AS (SELECT doc_id,
                          CAST(doc_id % 13 AS DOUBLE) / 3.0 - 1.5 AS logw
                   FROM documents),
        keyed AS (SELECT doc_id, logw,
                         logw + (-ln(-ln((CAST({h} % {two52} AS DOUBLE)
                                          + 0.5) / {float(two52)!r})))
                             AS sample_key
                  FROM w)
        SELECT * FROM keyed ORDER BY sample_key DESC LIMIT {n}
    """, f"importance_sample seed={seed} n={n} gseed={gseed}")


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_similarity_family(spark, fuzz_dir, fuzz_duck, seed):
    from __spark_entry__ import _lsh_topk_oracle

    rng = random.Random(seed)
    planes = rng.randrange(3, 7)
    bands = rng.choice([1, 2, 4])
    k = rng.randrange(3, 7)
    hp_seed = rng.randrange(0, 1000)
    emb = spark.read.parquet(f"{fuzz_dir}/embeddings.parquet")

    out = similarity.lsh_topk(emb, k=k, planes=planes, bands=bands,
                              seed=hp_seed) \
        .select("query_id", "neighbor_id", "rank",
                F.round("cosine", 6).alias("cosine_r6"))
    _check(out, fuzz_duck,
           _lsh_topk_oracle(planes=planes, seed=hp_seed, k=k, bands=bands),
           f"lsh_topk seed={seed} planes={planes} bands={bands} k={k}")
    cache.release(out)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_model_family(spark, fuzz_dir, fuzz_duck, seed):
    """kmeans + PQ off the golden path: random k / iteration counts /
    subspace splits / training fractions, oracle SQL regenerated for the
    drawn parameters (the fuzz embeddings are dim 12)."""
    from __spark_entry__ import _kmeans_oracle, _pq_oracle

    rng = random.Random(seed)
    emb = spark.read.parquet(f"{fuzz_dir}/embeddings.parquet")

    k = rng.randrange(2, 6)
    iters = rng.randrange(1, 4)
    kseed = rng.randrange(0, 1000)
    _, assign = similarity.kmeans(emb, k=k, n_iters=iters, seed=kseed)
    _check(assign, fuzz_duck, _kmeans_oracle(k=k, n_iters=iters, seed=kseed),
           f"kmeans seed={seed} k={k} iters={iters}")
    cache.release(assign)

    m = rng.choice([2, 3, 4, 6])
    k_sub = rng.randrange(3, 7)
    piters = rng.randrange(1, 3)
    frac = rng.choice([1.0, 0.7, 0.5])
    nq = rng.randrange(2, 5)
    topk = rng.randrange(3, 6)
    pseed = rng.randrange(0, 1000)
    out = similarity.pq_topk(emb, k=topk, n_queries=nq, m=m, k_sub=k_sub,
                             n_iters=piters, train_fraction=frac, seed=pseed)
    _check(out, fuzz_duck,
           _pq_oracle(k=topk, n_queries=nq, m=m, k_sub=k_sub,
                      n_iters=piters, train_fraction=frac, dim=12,
                      seed=pseed),
           f"pq seed={seed} m={m} k_sub={k_sub} iters={piters} frac={frac}")
    cache.release(out)

    cells = rng.randrange(3, 8)
    nprobe = rng.randrange(1, cells + 1)
    out = similarity.ivfpq_topk(emb, k=topk, n_queries=nq, n_cells=cells,
                                nprobe=nprobe, m=m, k_sub=k_sub,
                                n_iters=piters, train_fraction=frac,
                                seed=pseed)
    _check(out, fuzz_duck,
           _pq_oracle(k=topk, n_queries=nq, m=m, k_sub=k_sub,
                      n_iters=piters, train_fraction=frac, dim=12,
                      seed=pseed, n_cells=cells, nprobe=nprobe),
           f"ivfpq seed={seed} cells={cells} nprobe={nprobe} m={m}")
    cache.release(out)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_tokenizer_family(spark, fuzz_dir, fuzz_duck, seed):
    """BPE + BM25 off the golden path: random merge counts, query terms,
    result sizes, and k1/b, oracle SQL regenerated per draw."""
    from __spark_entry__ import (_bigram_nll_oracle, _bm25_oracle,
                                 _bpe_encode_oracle, _bpe_oracle,
                                 _tfidf_oracle)

    rng = random.Random(seed)
    docs = _docs(spark, fuzz_dir)

    n_merges = rng.randrange(3, 9)
    _check(text_ops.bpe_train(docs, n_merges=n_merges), fuzz_duck,
           _bpe_oracle(n_merges), f"bpe_train seed={seed} m={n_merges}")
    out = text_ops.bpe_encode_stats(docs, n_merges=n_merges)
    _check(out, fuzz_duck, _bpe_encode_oracle(n_merges),
           f"bpe_encode seed={seed} m={n_merges}")
    cache.release(out)

    terms = rng.sample(["join", "scan", "hash", "vector", "window",
                        "table", "der", "alpha"], rng.randrange(2, 5))
    n = rng.randrange(5, 30)
    k1 = rng.choice([0.9, 1.2, 2.0])
    b = rng.choice([0.0, 0.4, 0.75, 1.0])
    _check(text_ops.bm25_topk(docs, terms, n=n, k1=k1, b=b), fuzz_duck,
           _bm25_oracle(terms, n=n, k1=k1, b=b),
           f"bm25 seed={seed} terms={terms} n={n} k1={k1} b={b}")

    alpha = rng.choice([0.25, 0.5, 1.0, 2.0])
    out = text_ops.bigram_nll(docs, docs.where(F.col("lang") == "en"),
                              alpha=alpha)
    _check(out, fuzz_duck, _bigram_nll_oracle(alpha),
           f"bigram_nll seed={seed} alpha={alpha}")
    cache.release(out)

    j = rng.randrange(2, 7)
    out = text_ops.tfidf_topk_terms(docs, j=j)
    _check(out, fuzz_duck, _tfidf_oracle(j), f"tfidf seed={seed} j={j}")
    cache.release(out)
