"""Round-5 pipeline ops: corpus-level duplicate-line removal (C4 /
RefinedWeb boilerplate pass) and SemDeDup-shaped semantic dedup.

Reference behavior basis: the reference repo has no pipeline surface —
these are training-data-pipeline extensions; correctness is pinned against
hand-computed expectations here and against independent DuckDB
recomputation in test_entry_oracle.py (dedup_lines / dedup_lines_keep_first
/ semantic_dedup)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_spark.pipeline import cache, dedup, similarity

BOILER = "copyright example corp all rights reserved"


def _docs(spark):
    rows = [
        # doc 0: unique body + boilerplate footer
        (0, "alpha beta gamma delta\n" + BOILER, "web"),
        # doc 1: different body + same footer + a short structural line
        (1, "epsilon zeta eta theta\n--\n" + BOILER, "web"),
        # doc 2: entirely boilerplate (must come back as '')
        (2, BOILER, "web"),
        # doc 3: intra-doc repetition only — distinct-doc freq is 1, so
        # the repeated line must SURVIVE (not cross-doc boilerplate)
        (3, "iota kappa lambda mu\niota kappa lambda mu", "news"),
        # doc 4: leading/trailing whitespace variant of the footer — the
        # dedup key is the TRIMMED line, so it bans with the others, but
        # the doc's own surviving text keeps its original lines verbatim
        (4, "nu xi omicron pi\n  " + BOILER + "  ", "news"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, source string")


def _collect(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestLineDedup:
    def test_drop_all_mode(self, spark):
        out = _collect(dedup.line_dedup(_docs(spark), min_line_chars=3))
        assert out[0]["text"] == "alpha beta gamma delta"
        assert out[0]["n_lines"] == 2 and out[0]["n_removed"] == 1
        # short structural line "--" is immune (min_line_chars=3)
        assert out[1]["text"] == "epsilon zeta eta theta\n--"
        assert out[2]["text"] == ""  # fully-boilerplate doc
        assert out[2]["n_removed"] == 1
        # intra-doc repetition survives: distinct-doc freq is 1
        assert out[3]["text"] == "iota kappa lambda mu\niota kappa lambda mu"
        assert out[3]["n_removed"] == 0
        # whitespace variant banned via trimmed key; body survives
        assert out[4]["text"] == "nu xi omicron pi"
        assert out[4]["n_removed"] == 1

    def test_keep_first_mode(self, spark):
        out = _collect(dedup.line_dedup(_docs(spark), min_line_chars=3,
                                        keep_first=True))
        # keeper = smallest (doc_id, pos): doc 0 line 1 keeps the footer
        assert out[0]["text"] == "alpha beta gamma delta\n" + BOILER
        assert out[0]["n_removed"] == 0
        assert out[1]["n_removed"] == 1
        assert out[2]["text"] == ""
        # doc 4's occurrence is whitespace-padded but shares the trimmed
        # key — removed (doc 0 position is smaller)
        assert out[4]["text"] == "nu xi omicron pi"

    def test_max_doc_freq_loosens_ban(self, spark):
        # footer appears in 4 distinct docs; with max_doc_freq=4 nothing
        # crosses the threshold
        out = _collect(dedup.line_dedup(_docs(spark), min_line_chars=3,
                                        max_doc_freq=4))
        assert all(v["n_removed"] == 0 for v in out.values())

    def test_passthrough_cols(self, spark):
        out = dedup.line_dedup(_docs(spark), min_line_chars=3,
                               passthrough_cols=["source"])
        rows = {r["doc_id"]: r["source"] for r in out.collect()}
        assert rows == {0: "web", 1: "web", 2: "web", 3: "news", 4: "news"}

    def test_param_validation(self, spark):
        with pytest.raises(ValueError):
            dedup.line_dedup(_docs(spark), min_line_chars=0)
        with pytest.raises(ValueError):
            dedup.line_dedup(_docs(spark), max_doc_freq=0)


def _emb_df(spark, rows):
    data = [(int(i), [float(x) for x in v]) for i, v in rows]
    return spark.createDataFrame(data, "vec_id bigint, embedding array<float>")


class TestSemanticDedup:
    def test_planted_clones_collapse(self, spark):
        rng = np.random.RandomState(11)
        base = rng.normal(size=(60, 8))
        rows = [(i, base[i]) for i in range(60)]
        # clones of vectors 0..4 under higher ids: tiny exact-in-IEEE shift
        for j in range(5):
            v = base[j].copy()
            v[0] += 2.0 ** -9
            rows.append((100 + j, v))
        out = similarity.semantic_dedup(_emb_df(spark, rows), threshold=0.99,
                                        n_centroids=4).persist()
        got = {r["vec_id"]: r for r in out.collect()}
        assert len(got) == 65
        for j in range(5):
            # the clone pair shares a component; rep = min id = the base
            assert got[100 + j]["rep_id"] == j, got[100 + j]
            assert not got[100 + j]["keep"]
            assert got[j]["rep_id"] == j and got[j]["keep"]
        # everything else is a singleton keeping itself
        others = [r for i, r in got.items() if 5 <= i < 60]
        assert all(r["keep"] and r["rep_id"] == r["vec_id"] for r in others)
        cache.release(out)
        out.unpersist()

    def test_transitive_component_single_rep(self, spark):
        # a chain a~b, b~c (a~c below threshold) must still collapse to
        # ONE representative via connected components
        a = np.ones(8)
        b = a.copy(); b[0] += 0.28
        c = b.copy(); c[1] += 0.28
        rows = [(1, a), (2, b), (3, c), (50, -a)]
        out = similarity.semantic_dedup(_emb_df(spark, rows), threshold=0.995,
                                        n_centroids=1).persist()
        got = {r["vec_id"]: (r["rep_id"], r["keep"]) for r in out.collect()}
        assert got[1] == (1, True)
        assert got[2] == (1, False) and got[3] == (1, False)
        assert got[50] == (50, True)
        cache.release(out)
        out.unpersist()

    def test_cluster_cap_bounds_candidates(self, spark):
        # a degenerate corpus (all identical) with a cluster cap: the
        # oversized cell is dropped, every vector keeps itself
        rows = [(i, np.ones(4)) for i in range(50)]
        out = similarity.semantic_dedup(_emb_df(spark, rows), threshold=0.9,
                                        n_centroids=1, max_cluster_size=10)
        got = out.collect()
        assert len(got) == 50
        assert all(r["keep"] for r in got)


PASSAGE = "a b c d e f g h i j"  # 10 tokens, > min_tokens=8


def _substr_docs(spark):
    rows = [
        # docs 10/11 share the 10-token passage (cross-document)
        (10, "unique one text here now " + PASSAGE),
        (11, PASSAGE + " other tail words go here"),
        # doc 12: shorter than the window — no anchors, untouched
        (12, "short doc"),
        # doc 13: intra-doc repeat (raw count, unlike line_dedup's
        # distinct-doc statistic) + cross-doc with 10/11
        (13, "x1 x2 x3 x4 x5 x6 x7 x8 x9 " + PASSAGE + " " + PASSAGE),
        # doc 14: no repeats anywhere
        (14, "totally distinct words with no repeats at all whatsoever"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestSubstringDedup:
    def test_drop_all_mode(self, spark):
        res = dedup.substring_dedup(_substr_docs(spark), min_tokens=8)
        out = _collect(res)
        # the shared passage is removed from EVERY copy; interval union
        # tiles the whole 10-token run from its 3 repeated 8-gram anchors
        assert out[10]["text"] == "unique one text here now"
        assert out[10]["n_tokens"] == 15 and out[10]["n_removed"] == 10
        assert out[11]["text"] == "other tail words go here"
        assert out[12]["text"] == "short doc"
        assert out[12]["n_removed"] == 0
        # intra-doc: both copies removed (raw occurrence count)
        assert out[13]["text"] == "x1 x2 x3 x4 x5 x6 x7 x8 x9"
        assert out[13]["n_removed"] == 20
        assert out[14]["n_removed"] == 0
        cache.release(res)

    def test_keep_first_mode(self, spark):
        res = dedup.substring_dedup(_substr_docs(spark), min_tokens=8,
                                    keep_first=True)
        out = _collect(res)
        # keeper = global min (doc_id, apos) per window key -> doc 10
        # keeps the passage, every other copy (docs 11 and 13 both) loses it
        assert out[10]["text"] == ("unique one text here now " + PASSAGE)
        assert out[10]["n_removed"] == 0
        assert out[11]["text"] == "other tail words go here"
        assert out[13]["text"] == "x1 x2 x3 x4 x5 x6 x7 x8 x9"
        cache.release(res)

    def test_long_shared_passage_tiles_exactly(self, spark):
        # a 12-token shared run: every length-8 sub-window repeats, so
        # coverage removes exactly the run — neighbors survive
        run = " ".join(f"p{i}" for i in range(12))
        rows = [(0, "left edge " + run + " right edge"),
                (1, "pre " + run + " post")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        res = dedup.substring_dedup(df, min_tokens=8)
        out = _collect(res)
        assert out[0]["text"] == "left edge right edge"
        assert out[0]["n_removed"] == 12
        assert out[1]["text"] == "pre post"
        cache.release(res)

    def test_fully_duplicated_doc_returns_empty(self, spark):
        body = " ".join(f"w{i}" for i in range(9))
        df = spark.createDataFrame([(0, body), (1, body)],
                                   "doc_id bigint, text string")
        res = dedup.substring_dedup(df, min_tokens=8)
        out = _collect(res)
        assert out[0]["text"] == "" and out[1]["text"] == ""
        assert out[0]["n_removed"] == 9
        cache.release(res)

    def test_min_tokens_validation(self, spark):
        with pytest.raises(ValueError):
            dedup.substring_dedup(_substr_docs(spark), min_tokens=1)

    def test_null_text_yields_null_struct(self, spark):
        body = " ".join(f"w{i}" for i in range(9))
        df = spark.createDataFrame(
            [(0, body), (1, None), (2, body)],
            "doc_id bigint, text string")
        res = dedup.substring_dedup(df, min_tokens=8)
        out = _collect(res)
        assert out[1]["text"] is None
        assert out[1]["n_tokens"] is None and out[1]["n_removed"] is None
        # the NULL row does not disturb the duplicated pair
        assert out[0]["text"] == "" and out[2]["text"] == ""
        cache.release(res)


class TestGopherRules:
    def test_hand_computed_rules(self, spark):
        from json_schema_spark.pipeline import text as text_ops

        rows = [
            # passes everything (8 words >= min_words=5, letters, stops)
            (0, "the cat sat on the mat with a dog"),
            # too few words
            (1, "tiny doc here"),
            # symbol ratio: 2 symbols / 6 words > 0.1
            (2, "what # comes next # here now"),
            # numeric tokens: 2 alpha words of 6 < 0.8
            (3, "the 1 2 3 4 5"),
            # bullet lines: 3 of 4 lines bulleted > 0.66 (custom thresh)
            (4, "the head line\n- a\n- b\n- c"),
            # ellipsis lines: 1 of 2 > 0.3
            (5, "the first line with words\nand more..."),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {r.doc_id: r for r in text_ops.gopher_rules(
            df, min_words=5, min_word_len=1.0, max_bullet_frac=0.66,
            min_stop_kinds=1).collect()}
        assert out[0].keep and out[0].reasons == []
        assert out[1].reasons == ["word_count", "stopwords"]
        assert "symbol_ratio" in out[2].reasons
        assert "alpha_words" in out[3].reasons
        assert out[3].alpha_word_frac == 1.0 / 6.0
        assert "bullet_lines" in out[4].reasons
        assert out[4].bullet_line_frac == 0.75
        assert "ellipsis_lines" in out[5].reasons
        assert out[5].ellipsis_line_frac == 0.5
        # reasons keep the documented rule order
        assert out[2].reasons == sorted(
            out[2].reasons,
            key=["word_count", "word_length", "symbol_ratio",
                 "alpha_words", "stopwords", "bullet_lines",
                 "ellipsis_lines"].index)

    def test_stop_kinds_distinct_not_multiplicity(self, spark):
        from json_schema_spark.pipeline import text as text_ops

        # 'the' four times is still ONE stopword kind
        df = spark.createDataFrame(
            [(0, "the the the the cat likes maps")],
            "doc_id bigint, text string")
        r = text_ops.gopher_rules(df, min_words=1, min_word_len=1.0,
                                  min_stop_kinds=2).collect()[0]
        assert r.n_stop_kinds == 1
        assert "stopwords" in r.reasons


class TestDedupAgainst:
    def test_normalized_membership(self, spark):
        new = spark.createDataFrame(
            [(0, "Hello   World"),      # held by reference (normalized)
             (1, "fresh document one"),
             (2, "another   fresh doc")],
            "doc_id bigint, text string")
        ref = spark.createDataFrame(
            [(100, "  hello world  ")], "doc_id bigint, text string")
        out = sorted(r.doc_id
                     for r in dedup.dedup_against(new, ref).collect())
        assert out == [1, 2]

    def test_broadcast_variant_same_result(self, spark):
        new = spark.createDataFrame(
            [(i, f"doc number {i}") for i in range(10)],
            "doc_id bigint, text string")
        ref = new.where(F.col("doc_id") % 3 == 0)
        a = sorted(r.doc_id for r in dedup.dedup_against(new, ref).collect())
        b = sorted(r.doc_id for r in dedup.dedup_against(
            new, ref, broadcast_reference=True).collect())
        assert a == b == [i for i in range(10) if i % 3 != 0]

    def test_bloom_variant_exact_parity(self, spark):
        # 400 docs, every 4th held by the reference; a high fpp (0.2)
        # forces plenty of false positives through the correction join —
        # the result must still be EXACT
        new = spark.createDataFrame(
            [(i, f"snapshot document number {i} body") for i in range(400)],
            "doc_id bigint, text string")
        ref = new.where(F.col("doc_id") % 4 == 0)
        res = dedup.dedup_against(new, ref, bloom_fpp=0.2)
        got = sorted(r.doc_id for r in res.collect())
        assert got == [i for i in range(400) if i % 4 != 0]
        cache.release(res)

    def test_bloom_null_text_and_empty_reference(self, spark):
        new = spark.createDataFrame(
            [(0, "kept doc"), (1, None), (2, "held doc")],
            "doc_id bigint, text string")
        ref = spark.createDataFrame([(9, "held doc")],
                                    "doc_id bigint, text string")
        res = dedup.dedup_against(new, ref, bloom_fpp=0.01)
        # NULL fingerprints never match anything — NULL-text rows survive,
        # matching the plain anti-join's NULL-key semantics
        assert sorted(r.doc_id for r in res.collect()) == [0, 1]
        cache.release(res)
        empty = ref.where(F.lit(False))
        res2 = dedup.dedup_against(new, empty, bloom_fpp=0.01)
        assert res2.count() == 3
        cache.release(res2)

    def test_bloom_sizing(self):
        m, k = dedup._bloom_params(1000, 0.01)
        assert m % 64 == 0 and m >= 9000  # ~9.6 bits/item at 1% fpp
        assert 5 <= k <= 9
        with pytest.raises(ValueError):
            dedup.dedup_against(None, None, bloom_fpp=1.5)


class TestTokenStats:
    def test_hand_computed(self, spark):
        from json_schema_spark.pipeline import text as text_ops

        rows = [(0, "ab cd", "en"),        # 2 toks, 4 chars, 5 bytes
                (1, "  x  ", "en"),        # 1 tok, 1 char, 5 bytes
                (2, "über gut", "de"),     # 2 toks, 7 chars, 9 bytes (ü=2)
                (3, None, "de")]           # counted doc, NULL sums skip
        df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
        out = {r.lang: r for r in text_ops.token_stats(df).collect()}
        en, de = out["en"], out["de"]
        assert (en.n_docs, en.n_tokens, en.n_chars, en.n_bytes) == (2, 3, 5, 10)
        assert en.bytes_per_token == 10.0 / 3
        assert en.tokens_per_doc == 1.5
        assert (de.n_docs, de.n_tokens, de.n_chars, de.n_bytes) == (2, 2, 7, 9)
        assert de.bytes_per_token == 4.5

    def test_null_group_kept(self, spark):
        from json_schema_spark.pipeline import text as text_ops

        df = spark.createDataFrame([(0, "a b", None), (1, "c", "en")],
                                   "doc_id bigint, text string, lang string")
        out = {r.lang: r.n_tokens for r in text_ops.token_stats(df).collect()}
        assert out == {None: 2, "en": 1}


class TestIntraDocLineDedup:
    def _d(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id bigint, text string")

    def test_keeps_first_occurrence_per_doc(self, spark):
        from json_schema_spark.pipeline import dedup

        d = self._d(spark, [(1, "nav\nbody one\nnav\nbody two\nnav"),
                            (2, "nav\nother")])
        got = {r["doc_id"]: r for r in
               dedup.intra_doc_line_dedup(d, min_line_chars=1).collect()}
        # within doc 1 only the FIRST 'nav' survives; doc 2 untouched
        assert got[1]["text"] == "nav\nbody one\nbody two"
        assert (got[1]["n_lines"], got[1]["n_kept"]) == (5, 3)
        assert got[2]["text"] == "nav\nother"

    def test_short_lines_immune(self, spark):
        from json_schema_spark.pipeline import dedup

        d = self._d(spark, [(1, "--\nreal line here\n--\nreal line here")])
        got = dedup.intra_doc_line_dedup(d, min_line_chars=5).collect()[0]
        assert got["text"] == "--\nreal line here\n--"
        assert (got["n_lines"], got["n_kept"]) == (4, 3)

    def test_trim_keyed_and_partition_invariant(self, spark):
        from json_schema_spark.pipeline import dedup

        rows = [(i, f"head {i % 3}\n  head {i % 3}  \nbody {i}")
                for i in range(20)]
        a = sorted(tuple(r) for r in dedup.intra_doc_line_dedup(
            self._d(spark, rows).repartition(1)).collect())
        b = sorted(tuple(r) for r in dedup.intra_doc_line_dedup(
            self._d(spark, rows).repartition(7, "doc_id")).collect())
        assert a == b
        # whitespace-variant duplicate removed (trimmed key)
        assert all(r[1].count("head") == 1 for r in a)

    def test_blank_lines_never_dedup(self, spark):
        from json_schema_spark.pipeline import dedup

        # review finding: min_line_chars=0 would collapse paragraph
        # separators; the floor is 1 (like line_dedup) and blanks are
        # structural at any setting
        import pytest

        with pytest.raises(ValueError, match="min_line_chars"):
            dedup.intra_doc_line_dedup(
                self._d(spark, [(1, "a")]), min_line_chars=0)
        d = self._d(spark, [(1, "para one\n\npara two\n\npara one")])
        got = dedup.intra_doc_line_dedup(d, min_line_chars=1).collect()[0]
        assert got["text"] == "para one\n\npara two\n"
        assert (got["n_lines"], got["n_kept"]) == (5, 4)
