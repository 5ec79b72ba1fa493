"""classifier_score + domain_top_quality op-level properties: handcrafted
budget semantics, two-phase prefilter parity under a 100x hot domain,
partition-invariance of the exact integer weight sum, and argument guards.
(The DuckDB value cross-check at sf0.01 runs via test_entry_oracle.py.)"""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.pipeline.sampling import domain_top_quality
from json_schema_spark.pipeline.text import classifier_score


def _scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, n_tokens int, logit double")


def test_domain_budget_semantics(spark):
    """Best-first within each domain, inclusive running total <= budget:
    a doc that would overflow the budget is dropped even if a SMALLER
    later doc would still fit (budgeted prefix, not knapsack)."""
    rows = [
        (1, "a", 50, 0.9),   # cum 50  -> kept
        (2, "a", 40, 0.8),   # cum 90  -> kept
        (3, "a", 20, 0.7),   # cum 110 -> dropped (overflows)
        (4, "a", 5, 0.6),    # cum 115 -> dropped (prefix, not knapsack)
        (5, "b", 100, 0.1),  # cum 100 -> kept (exactly the budget)
        (6, "b", 1, 0.05),   # cum 101 -> dropped
    ]
    out = domain_top_quality(_scored(spark, rows), budget=100)
    got = {(r.doc_id, r.cum_tokens) for r in out.collect()}
    assert got == {(1, 50), (2, 90), (5, 100)}


def test_domain_budget_tiebreak_deterministic(spark):
    """Equal logits break by doc_id ASC, so which doc survives a budget
    boundary is a pure function of the input."""
    rows = [(i, "a", 60, 0.5) for i in (9, 3, 7)]
    out = domain_top_quality(_scored(spark, rows), budget=120)
    assert sorted(r.doc_id for r in out.collect()) == [3, 7]


def test_prefilter_parity_hot_domain(spark):
    """The shard-local pre-prune is exact: a domain with 100x the rows of
    the others must yield the identical kept set with and without
    prefilter_shards (every globally-kept row is shard-locally kept —
    subset running totals never exceed global ones)."""
    rows = [(i, "hot", 3 + i % 7, float((i * 37) % 100) / 100)
            for i in range(500)]
    rows += [(1000 + i, "cold", 10, float(i) / 10) for i in range(5)]
    df = _scored(spark, rows)
    plain = domain_top_quality(df, budget=300)
    pre = domain_top_quality(df, budget=300, prefilter_shards=8)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, pre.collect()))
    kept_hot = plain.where(F.col("source") == "hot").count()
    assert 0 < kept_hot < 500  # the budget actually bit on the hot domain


def test_classifier_partition_invariant(spark):
    """The per-doc weight sum is an exact BIGINT — identical on any
    partitioning (a float sum would reorder under parallel aggregation)."""
    docs = [(i, f"alpha beta g{i} delta " * (1 + i % 4)) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    a = classifier_score(df.coalesce(1), n_buckets=64)
    b = classifier_score(df.repartition(7), n_buckets=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_classifier_passthrough_and_guards(spark):
    df = spark.createDataFrame([(1, "x", "one two"), (2, "y", "three")],
                               "doc_id bigint, source string, text string")
    out = classifier_score(df, passthrough_cols=("source",))
    assert {(r.doc_id, r.source, r.n_tokens) for r in out.collect()} == \
        {(1, "x", 2), (2, "y", 1)}
    with pytest.raises(ValueError, match="n_buckets"):
        classifier_score(df, n_buckets=0)
    with pytest.raises(ValueError, match="budget"):
        domain_top_quality(_scored(spark, []), budget=0)


def test_classifier_no_python_udf(spark):
    """The scoring plan stays JVM-side: no BatchEvalPython / ArrowEval
    nodes (tokenize, hash, weight, and the doc aggregate all codegen)."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = classifier_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestDsirWeights:
    def _corpus(self, spark):
        # two disjoint-vocabulary "domains"; target = domain A
        a_docs = [(i, " ".join(f"alpha{j % 5}" for j in range(i % 7 + 3)), "A")
                  for i in range(0, 10)]
        b_docs = [(i, " ".join(f"beta{j % 5}" for j in range(i % 7 + 3)), "B")
                  for i in range(10, 20)]
        return spark.createDataFrame(a_docs + b_docs,
                                     "doc_id bigint, text string, dom string")

    def test_target_domain_scores_higher(self, spark):
        from json_schema_spark.pipeline import cache
        from json_schema_spark.pipeline.sampling import dsir_weights

        df = self._corpus(spark)
        res = dsir_weights(df, df.where(F.col("dom") == "A"),
                           n_buckets=1024)
        out = {r.doc_id: r.logw for r in res.collect()}
        assert len(out) == 20
        # every target-domain doc outranks every off-domain doc
        assert min(out[i] for i in range(10)) > max(out[i]
                                                    for i in range(10, 20))
        cache.release(res)

    def test_partition_invariant_bits(self, spark):
        from json_schema_spark.pipeline import cache
        from json_schema_spark.pipeline.sampling import dsir_weights

        df = self._corpus(spark)
        tgt = df.where(F.col("dom") == "A")
        r1 = dsir_weights(df.repartition(1), tgt, n_buckets=512)
        got1 = {r.doc_id: (r.n_feats, r.logw) for r in r1.collect()}
        cache.release(r1)
        r2 = dsir_weights(df.repartition(13, "doc_id"), tgt, n_buckets=512)
        got2 = {r.doc_id: (r.n_feats, r.logw) for r in r2.collect()}
        cache.release(r2)
        # integer micro-nat lattice -> bit-identical under any layout
        assert got1 == got2

    def test_n_buckets_guard(self, spark):
        from json_schema_spark.pipeline.sampling import dsir_weights

        with pytest.raises(ValueError):
            dsir_weights(self._corpus(spark), self._corpus(spark),
                         n_buckets=1)


class TestImportanceSample:
    def _weights(self, spark):
        rows = [(i, float(i) / 7.0 - 1.5) for i in range(60)]
        return spark.createDataFrame(rows, "doc_id bigint, logw double")

    @staticmethod
    def _expected_key(doc_id, logw, seed=17):
        # independent Python replica of the md5 Gumbel key
        import hashlib
        import math

        h = int(hashlib.md5(f"gumbel|{seed}|{doc_id}".encode())
                .hexdigest()[:15], 16) % (1 << 52)
        u = (float(h) + 0.5) / float(1 << 52)
        return logw + (-math.log(-math.log(u)))

    def test_matches_python_replica(self, spark):
        from json_schema_spark.pipeline.sampling import importance_sample

        w = self._weights(spark)
        got = {r.doc_id: r.sample_key
               for r in importance_sample(w, n=15).collect()}
        exp = sorted(((self._expected_key(i, i / 7.0 - 1.5), i)
                      for i in range(60)), reverse=True)[:15]
        assert got == {i: k for k, i in exp}

    def test_returns_all_when_n_exceeds_rows(self, spark):
        from json_schema_spark.pipeline.sampling import importance_sample

        w = self._weights(spark)
        assert importance_sample(w, n=1000).count() == 60

    def test_partition_invariant(self, spark):
        from json_schema_spark.pipeline.sampling import importance_sample

        w = self._weights(spark)
        a = sorted(r.doc_id for r in
                   importance_sample(w.repartition(1), n=10).collect())
        b = sorted(r.doc_id for r in
                   importance_sample(w.repartition(7, "doc_id"),
                                     n=10).collect())
        assert a == b

    def test_huge_weight_always_selected(self, spark):
        from json_schema_spark.pipeline.sampling import importance_sample

        w = self._weights(spark).union(
            spark.createDataFrame([(999, 1e6)], "doc_id bigint, logw double"))
        for seed in (1, 2, 3):
            got = {r.doc_id for r in
                   importance_sample(w, n=5, seed=seed).collect()}
            assert 999 in got

    def test_n_guard(self, spark):
        from json_schema_spark.pipeline.sampling import importance_sample

        with pytest.raises(ValueError):
            importance_sample(self._weights(spark), n=0)


class TestSplitLeakage:
    def test_planted_leak_found(self, spark):
        from json_schema_spark.pipeline.sampling import (hash_split,
                                                         split_leakage)

        # 200 unique docs + ONE duplicated text whose twin id is chosen
        # (via the split assignment itself) to land in a holdout split
        # while the source sits in train — a guaranteed planted leak
        base = [(i, f"unique document body {i}") for i in range(200)]
        labeled = {r.doc_id: r.split
                   for r in hash_split(spark.createDataFrame(
                       [(i, "x") for i in range(500)],
                       "doc_id bigint, text string")).collect()}
        src = next(i for i in range(200) if labeled[i] == "train")
        twin = next(i for i in range(200, 500) if labeled[i] != "train")
        rows = base + [(twin, f"unique document body {src}")]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")

        out = split_leakage(df).collect()
        # exactly the planted pair leaks (unique bodies can't collide)
        planted = [r for r in out if r.leaked_doc_id == twin]
        assert len(planted) == 1
        assert planted[0].n_train >= 1
        assert planted[0].n_val + planted[0].n_test >= 1

    def test_clean_split_is_empty(self, spark):
        from json_schema_spark.pipeline.sampling import split_leakage

        df = spark.createDataFrame(
            [(i, f"distinct body number {i}") for i in range(100)],
            "doc_id bigint, text string")
        assert split_leakage(df).count() == 0

    def test_null_text_ignored(self, spark):
        from json_schema_spark.pipeline.sampling import split_leakage

        df = spark.createDataFrame(
            [(0, None), (1, None), (2, "real")],
            "doc_id bigint, text string")
        assert split_leakage(df).count() == 0


class TestTemperatureMix:
    def _corpus(self, spark):
        # big: 300 docs, small: 30 docs
        rows = ([(i, "big") for i in range(300)]
                + [(1000 + i, "small") for i in range(30)])
        return spark.createDataFrame(rows, "doc_id bigint, source string")

    def test_tau_upsamples_small_source(self, spark):
        from json_schema_spark.pipeline.sampling import temperature_mix

        df = self._corpus(spark)
        out = temperature_mix(df, budget_docs=100, tau=0.3).collect()
        got = {"big": 0, "small": 0}
        for r in out:
            got[r.source] += 1
        # natural shares: 91/9; tau=0.3 shares: 5.53/2.77 -> targets
        # ~67/33. md5-bucket selection is binomial around the cut
        # (std ~7 for big, ~3.5 for small) — bands are ±3 sigma
        assert 22 <= got["small"] <= 40
        assert got["small"] > 9  # strictly above natural share
        assert 45 <= got["big"] <= 89

    def test_cap_binds_without_replacement(self, spark):
        from json_schema_spark.pipeline.sampling import temperature_mix

        df = self._corpus(spark)
        # tau=0 equalizes: targets 150/150, but small has only 30 docs ->
        # capped at 30 (cut = 10000, i.e. keep ALL of it)
        out = temperature_mix(df, budget_docs=300, tau=0.0).collect()
        small = [r for r in out if r.source == "small"]
        assert len(small) == 30

    def test_tau_one_is_natural_proportions(self, spark):
        from json_schema_spark.pipeline.sampling import temperature_mix

        df = self._corpus(spark)
        out = temperature_mix(df, budget_docs=110, tau=1.0).collect()
        got = {"big": 0, "small": 0}
        for r in out:
            got[r.source] += 1
        # natural shares 100/10; bucket-quantized (±3 sigma bands)
        assert 75 <= got["big"] <= 120 and 2 <= got["small"] <= 19

    def test_null_source_dropped_and_guards(self, spark):
        from json_schema_spark.pipeline.sampling import temperature_mix

        df = spark.createDataFrame(
            [(0, None), (1, "a"), (2, "a")], "doc_id bigint, source string")
        out = temperature_mix(df, budget_docs=10, tau=0.5).collect()
        assert all(r.source == "a" for r in out)
        with pytest.raises(ValueError):
            temperature_mix(df, budget_docs=0)
        with pytest.raises(ValueError):
            temperature_mix(df, budget_docs=5, tau=-0.1)

    def test_partition_invariant(self, spark):
        from json_schema_spark.pipeline.sampling import temperature_mix

        df = self._corpus(spark)
        a = sorted(r.doc_id for r in temperature_mix(
            df.repartition(1), budget_docs=80, tau=0.5).collect())
        b = sorted(r.doc_id for r in temperature_mix(
            df.repartition(7, "doc_id"), budget_docs=80, tau=0.5).collect())
        assert a == b
