"""Semantic tests for the BPE tokenizer trainer (text.bpe_train) and the
corpus application pass (text.bpe_encode_stats).

Driver-gate parity (full DuckDB merge-round replay at sf0.01) is covered
by test_entry_oracle; these pin the ALGORITHM on constructed corpora:
frequency-weighted merge selection, greedy left-to-right application on
self-overlapping runs, lexicographic tie-breaks, early exhaustion, the
ASCII filter, and partitioning invariance.
"""

import pytest

from json_schema_spark.pipeline import text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string")


def test_bpe_learns_frequent_pair_first(spark):
    # 'abab' x3 vs 'cd' x1: (a,b) count 6 beats everything
    d = _docs(spark, ["abab abab abab", "cd"])
    got = [tuple(r) for r in text.bpe_train(d, n_merges=2).collect()]
    assert got[0] == (1, "a", "b", 6)
    # after merging, (ab, ab) appears 3 times and wins round 2
    assert got[1] == (2, "ab", "ab", 3)


def test_bpe_greedy_on_self_overlapping_runs(spark):
    # canonical greedy: 'aaaaa' under (a,a) -> [aa, aa, a] (NOT the
    # [aa, a, aa] a string-replace scheme would give), so round 2 sees
    # (aa,aa) and (aa,a) once each per word occurrence (weight 2) and the
    # lexicographic rhs tie-break picks ('aa','a'); merging it greedily
    # gives [aa, aaa], pinning round 3 to ('aa','aaa')
    d = _docs(spark, ["aaaaa aaaaa"])
    got = [tuple(r) for r in text.bpe_train(d, n_merges=3).collect()]
    assert got == [(1, "a", "a", 8), (2, "aa", "a", 2),
                   (3, "aa", "aaa", 2)]


def test_bpe_tie_breaks_lexicographically(spark):
    # (a,b) and (c,d) both count 2 -> lexicographic pick (a,b)
    d = _docs(spark, ["ab cd ab cd"])
    got = [tuple(r) for r in text.bpe_train(d, n_merges=1).collect()]
    assert got == [(1, "a", "b", 2)]


def test_bpe_stops_when_exhausted(spark):
    # every word collapses to one token after 2 merges; round 3 has no
    # pairs and training stops early
    d = _docs(spark, ["abc abc"])
    got = text.bpe_train(d, n_merges=10).collect()
    assert len(got) == 2


def test_bpe_ascii_filter_and_lowercase(spark):
    # the non-ASCII word contributes nothing; 'AB' lowercases into 'ab'
    d = _docs(spark, ["AB ab café"])
    got = [tuple(r) for r in text.bpe_train(d, n_merges=1).collect()]
    assert got == [(1, "a", "b", 2)]


def test_bpe_partitioning_invariant(spark):
    texts = [f"tok{i % 7} tok{i % 5} shared shared" for i in range(40)]
    a = [tuple(r) for r in text.bpe_train(
        _docs(spark, texts).repartition(1), n_merges=6).collect()]
    b = [tuple(r) for r in text.bpe_train(
        _docs(spark, texts).repartition(13, "doc_id"), n_merges=6).collect()]
    assert a == b


def test_bpe_encode_stats_counts(spark):
    # after (a,b)->ab and (ab,ab)->abab, 'abab'=1 token, 'cd' untouched=2
    d = _docs(spark, ["abab abab abab", "cd"])
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_chars"])
           for r in text.bpe_encode_stats(d, n_merges=2).collect()}
    assert got[0] == (3, 12)    # three 'abab' words, one token each
    assert got[1] == (2, 2)     # 'cd' never merged


def test_bpe_encode_stats_drops_empty_docs(spark):
    d = _docs(spark, ["ab ab", "", "café"])
    got = {r["doc_id"] for r in text.bpe_encode_stats(d, n_merges=1).collect()}
    assert got == {0}


def test_bpe_encode_oracle_parity_past_exhaustion(spark):
    """Regression (review finding): when merges exhaust before n_merges,
    the oracle's round CTEs must CARRY the vocab state (LEFT JOIN ON TRUE
    against the empty argmax), not empty it — Spark's early break keeps
    the last state and the per-doc sums must still match."""
    import duckdb

    from __spark_entry__ import _bpe_encode_oracle, _bpe_oracle

    rows = [(0, "abc abc"), (1, "ab")]
    d = _docs(spark, [t for _, t in rows])
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM (VALUES (0,'abc abc'),"
            "(1,'ab')) t(doc_id, text)")

    merges = [(r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
              for r in text.bpe_train(d, n_merges=10).collect()]
    assert merges == con.sql(_bpe_oracle(10)).fetchall()

    got = sorted((r["doc_id"], r["n_bpe_tokens"], r["n_chars"])
                 for r in text.bpe_encode_stats(d, n_merges=10).collect())
    assert got == sorted(con.sql(_bpe_encode_oracle(10)).fetchall())


# --- bigram_nll (shares this module's constructed-corpus style) ---------


def test_bigram_nll_matches_python_reference(spark):
    import math

    corpus = [(1, "the cat sat"), (2, "the cat ran"), (3, "xyz qqq zzz")]
    d = _docs_ids(spark, corpus)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
           for r in text.bigram_nll(d).collect()}

    toks = {i: t.lower().split() for i, t in corpus}
    uni, bi = {}, {}
    for tk in toks.values():
        for w in tk:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(tk, tk[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = float(len(uni))
    exp = {}
    for i, tk in toks.items():
        micros = []
        for a, b in zip(tk, tk[1:]):
            val = math.log((bi.get((a, b), 0) + 1.0) / (uni[a] + 1.0 * v)) * 1e9
            micros.append(int(math.floor(val + 0.5)) if val >= 0
                          else int(math.ceil(val - 0.5)))
        exp[i] = (len(micros), (sum(micros) / -1e9) / float(len(micros)))
    assert got == exp


def test_bigram_nll_reference_separates_domains(spark):
    # LM trained on doc 1-2's domain: in-domain doc 4 scores lower nll
    # than the out-of-domain doc 5
    corpus = [(1, "the cat sat on the mat"), (2, "the cat ran to the mat"),
              (4, "the cat sat"), (5, "zzz qqq www")]
    d = _docs_ids(spark, corpus)
    ref = d.where("doc_id <= 2")
    got = {r["doc_id"]: r["avg_nll"] for r in text.bigram_nll(d, ref).collect()}
    assert got[4] < got[5]


def test_bigram_nll_short_docs_yield_no_row(spark):
    d = _docs_ids(spark, [(1, "single"), (2, ""), (3, None),
                          (4, "two tokens")])
    assert {r["doc_id"] for r in text.bigram_nll(d).collect()} == {4}


def test_bigram_nll_partitioning_invariant(spark):
    corpus = [(i, f"tok{i % 4} tok{(i + 1) % 3} tok{i % 5} shared")
              for i in range(30)]
    a = sorted(tuple(r) for r in text.bigram_nll(
        _docs_ids(spark, corpus).repartition(1)).collect())
    b = sorted(tuple(r) for r in text.bigram_nll(
        _docs_ids(spark, corpus).repartition(11, "doc_id")).collect())
    assert a == b


def _docs_ids(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_tfidf_ranks_rare_terms_first(spark):
    # 'rare' appears in one doc only; 'common' in all -> within doc 1,
    # equal tf but higher idf puts 'rare' first
    corpus = [(1, "rare common common rare rare"),
              (2, "common stuff"), (3, "common other")]
    out = text.tfidf_topk_terms(_docs_ids(spark, corpus), j=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    assert sorted(by_doc[1])[0] == (1, "rare")
    # integer scores, no floats
    assert all(isinstance(r["score_micro"], int) for r in out)


def test_tfidf_skips_empty_docs_and_breaks_ties(spark):
    corpus = [(1, "b a"), (2, ""), (3, None)]
    out = text.tfidf_topk_terms(_docs_ids(spark, corpus), j=5).collect()
    assert {r["doc_id"] for r in out} == {1}
    # equal tf and idf: lexicographic term tie-break
    assert [(r["rank"], r["term"]) for r in sorted(out, key=lambda r: r["rank"])] \
        == [(1, "a"), (2, "b")]


def test_char_entropy_known_values(spark):
    import math

    corpus = [(1, "aaaaaaaa"), (2, "abababab"), (3, "abcdefgh"),
              (4, ""), (5, None)]
    got = {r["doc_id"]: (r["n_chars"], r["entropy"])
           for r in text.char_entropy(_docs_ids(spark, corpus)).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (8, 0.0)                              # one symbol
    assert got[2][1] == pytest.approx(math.log(2), abs=1e-8)
    assert got[3][1] == pytest.approx(math.log(8), abs=1e-8)
    # padding scores far below diverse text — the filter signal
    assert got[1][1] < got[2][1] < got[3][1]


def test_char_entropy_partitioning_invariant(spark):
    corpus = [(i, ("lorem ipsum dolor sit amet " * (i % 3 + 1))[:40 + i])
              for i in range(24)]
    a = sorted(tuple(r) for r in text.char_entropy(
        _docs_ids(spark, corpus).repartition(1)).collect())
    b = sorted(tuple(r) for r in text.char_entropy(
        _docs_ids(spark, corpus).repartition(7, "doc_id")).collect())
    assert a == b


def test_bpe_batched_rounds_equal_sequential(spark, monkeypatch):
    """r6 optimization: batched merge rounds (_bpe_safe_batch) must be
    bit-identical to one-merge-per-round training. Corpora are built to
    stress every cut condition: shared endpoints between top pairs, count
    ties at the would-be cut, merged tokens recreating existing pair
    endpoints, and self-overlapping runs."""
    import random

    corpora = [
        # heavy tie + conflict pressure: tiny alphabet, overlapping pairs
        ["abab caca abca", "bcbc abab caab", "aabb ccaa babc"],
        # disjoint alphabets -> wide batches
        ["ab ab cd cd ef ef gh gh", "ij ij kl kl mn mn op op"],
        # self-overlap + recreated tokens
        ["aaaa bbbb aaaa", "aabb bbaa abab", "aaab bbba"],
        # SELF-PAIR hazard (review repro): merging (b,b) spawns (bb,bb)
        # with count derived from (b,b)'s own sites — it must not be
        # batched ahead of later members it can overtake
        ["bbbbbb bbbbbb bbbbbb bbbbbb bbbbbb", "abb abb abb abb abb",
         "baa baa baa baa baa", "aa aa babb"],
        # dense run corpus: every top pair is a self-pair
        ["cccccccc dddd cccc dddddddd", "cc dd cccc dddd"],
    ]
    rng = random.Random(7)
    letters = "abcde"
    corpora.append([" ".join("".join(rng.choice(letters)
                                     for _ in range(rng.randint(2, 8)))
                             for _ in range(30)) for _ in range(4)])

    for texts in corpora:
        d = _docs(spark, texts)
        batched = [tuple(r) for r in
                   text.bpe_train(d, n_merges=12).collect()]
        with monkeypatch.context() as m:
            m.setattr(text, "_bpe_safe_batch",
                      lambda rows, applied, limit: rows[:1])
            seq = [tuple(r) for r in
                   text.bpe_train(d, n_merges=12).collect()]
        assert batched == seq, texts


def test_bpe_safe_batch_property_sweep_pure_python():
    """No-Spark property check of _bpe_safe_batch: simulate BPE training
    driver-side over thousands of random tiny corpora and assert the
    batched selection reproduces one-merge-per-round training exactly.
    This is the net that caught the self-pair hazard (condition 2b)."""
    import random
    from collections import Counter

    def word_counts(texts):
        c = Counter()
        for t in texts:
            for w in t.split():
                c[w] += 1
        return {w: (n, list(w)) for w, (n,) in
                ((w, (n,)) for w, n in c.items())}

    def pair_counts(vocab):
        pc = Counter()
        for n, st in vocab.values():
            for a, b in zip(st, st[1:]):
                pc[(a, b)] += n
        return pc

    def apply_merge(vocab, px, py):
        out = {}
        for w, (n, st) in vocab.items():
            res = []
            for t in st:
                if res and res[-1] == px and t == py:
                    res[-1] = px + py
                else:
                    res.append(t)
            out[w] = (n, res)
        return out

    def ordered(pc):
        return sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))

    def train_seq(vocab, n_merges):
        merges = []
        for _ in range(n_merges):
            pc = pair_counts(vocab)
            if not pc:
                break
            (a, b), cnt = ordered(pc)[0]
            merges.append((a, b, cnt))
            vocab = apply_merge(vocab, a, b)
        return merges

    def train_batched(vocab, n_merges):
        merges, applied = [], set()
        while len(merges) < n_merges:
            pc = pair_counts(vocab)
            if not pc:
                break
            remaining = n_merges - len(merges)
            k = remaining + 8
            rows = [(a, b, cnt) for (a, b), cnt in ordered(pc)[:k]]
            limit = remaining if len(rows) < k else min(remaining, k - 1)
            batch = text._bpe_safe_batch(rows, applied, limit)
            for a, b, cnt in batch:
                merges.append((a, b, cnt))
                applied.add(a + b)
                vocab = apply_merge(vocab, a, b)
        return merges

    rng = random.Random(99)
    for trial in range(4000):
        letters = "abcd"[:rng.randint(2, 4)]
        texts = [" ".join("".join(rng.choice(letters)
                                  for _ in range(rng.randint(1, 7)))
                          for _ in range(rng.randint(2, 10)))
                 for _ in range(rng.randint(1, 4))]
        vocab = word_counts(texts)
        n = rng.randint(1, 10)
        assert train_batched(dict(vocab), n) == train_seq(dict(vocab), n), \
            (trial, texts, n)
