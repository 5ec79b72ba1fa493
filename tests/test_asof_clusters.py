"""Unit tests for the round-3 relational additions: as-of join (union +
running-last window) and duplicate clustering (hash-min label-propagation
connected components)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from json_schema_spark.pipeline import dedup
from json_schema_spark.pipeline.asof import asof_join


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 12, minute, 0)


def test_asof_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts(10), 100.0),
         (2, "u1", _ts(20), 200.0),
         (3, "u2", _ts(5), 300.0),   # no prior right row for u2
         (4, "u1", _ts(15), 400.0)],  # tie with the right row at :15
        "event_id bigint, user_id string, ts timestamp, value double")
    right = spark.createDataFrame(
        [("u1", _ts(8), 1.0),
         ("u1", _ts(15), 2.0),
         ("u2", _ts(30), 3.0)],
        "user_id string, ts timestamp, click double")
    out = asof_join(left, right, on="user_id", ts="ts",
                    right_value_cols=["click"])
    got = {r.event_id: r.click_asof for r in out.collect()}
    assert got == {
        1: 1.0,   # :10 sees the :08 click
        4: 2.0,   # tie: right row AT the left ts counts ("at or before")
        2: 2.0,   # :20 sees the :15 click
        3: None,  # u2 has no click at or before :05
    }
    # left row count and columns preserved
    assert out.count() == 4
    assert out.columns == ["event_id", "user_id", "ts", "value", "click_asof"]


def test_asof_multi_key_and_multi_value(spark):
    left = spark.createDataFrame(
        [(1, "a", "x", _ts(10))],
        "event_id bigint, k1 string, k2 string, ts timestamp")
    right = spark.createDataFrame(
        [("a", "x", _ts(9), 7.0, "hi"),
         ("a", "y", _ts(9), 8.0, "wrong-key"),
         ("b", "x", _ts(9), 9.0, "wrong-key")],
        "k1 string, k2 string, ts timestamp, v double, s string")
    out = asof_join(left, right, on=["k1", "k2"], ts="ts")
    row = out.collect()[0]
    assert (row.v_asof, row.s_asof) == (7.0, "hi")


def test_asof_null_right_values_not_resurrected(spark):
    """Row-level carry semantics (ADVICE r3 medium): when the MATCHED right
    row holds a NULL value column, the join must emit that NULL — not reach
    back and resurrect an older row's value — and with several value
    columns it must never mix values from different right rows."""
    left = spark.createDataFrame(
        [(1, "u1", _ts(20)), (2, "u1", _ts(40))],
        "event_id bigint, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", _ts(10), 1.0, "a"),
         ("u1", _ts(15), None, "b"),    # matched by event 1: v is genuinely NULL
         ("u1", _ts(30), 3.0, None)],   # matched by event 2: s is genuinely NULL
        "user_id string, ts timestamp, v double, s string")
    got = {r.event_id: (r.v_asof, r.s_asof)
           for r in asof_join(left, right, on="user_id", ts="ts").collect()}
    assert got == {1: (None, "b"), 2: (3.0, None)}


def test_asof_no_right_value_cols(spark):
    left = spark.createDataFrame([(1, "u1", _ts(1))],
                                 "event_id bigint, user_id string, ts timestamp")
    right = spark.createDataFrame([("u1", _ts(0))],
                                  "user_id string, ts timestamp")
    out = asof_join(left, right, on="user_id", ts="ts")
    assert out.columns == left.columns and out.count() == 1


def test_duplicate_clusters_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a bigint, id_b bigint")
    out = {(r.doc_id, r.cluster_id)
           for r in dedup.duplicate_clusters(pairs).collect()}
    assert out == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20), (23, 20)}


def test_duplicate_clusters_long_chain_converges(spark):
    # a path graph exercises multi-round propagation (diameter 9)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], "id_a bigint, id_b bigint")
    out = dedup.duplicate_clusters(pairs)
    assert {r.cluster_id for r in out.collect()} == {1}
    assert out.count() == 10


def test_duplicate_clusters_reliable_checkpoint_matches(spark, tmp_path):
    """r4 VERDICT #2: with checkpoint_dir= set, rounds use reliable
    checkpoint() (survives executor loss) instead of localCheckpoint;
    labels must be identical and checkpoint files must actually land in
    the directory."""
    import os

    # path graph (diameter 24) forces many rounds + pointer jumping, plus
    # two disjoint small components
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 25)] + [(100, 101), (200, 201)],
        "id_a bigint, id_b bigint")
    ckdir = str(tmp_path / "cc_ckpt")
    local = {(r.doc_id, r.cluster_id)
             for r in dedup.duplicate_clusters(pairs).collect()}
    reliable = {(r.doc_id, r.cluster_id)
                for r in dedup.duplicate_clusters(
                    pairs, checkpoint_dir=ckdir).collect()}
    assert reliable == local
    assert {c for _, c in reliable} == {1, 100, 200}
    # reliable checkpoints were actually written to the chosen dir
    files = [os.path.join(dp, f) for dp, _, fs in os.walk(ckdir) for f in fs]
    assert files, "no checkpoint files written under checkpoint_dir"


def test_duplicate_clusters_empty(spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert dedup.duplicate_clusters(pairs).count() == 0


def test_hash_split_reproducible_and_partition_invariant(spark):
    from json_schema_spark.pipeline import sampling

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {(r.doc_id, r.split) for r in sampling.hash_split(df).collect()}
    b = {(r.doc_id, r.split)
         for r in sampling.hash_split(df.repartition(13)).collect()}
    assert a == b
    from collections import Counter
    frac = Counter(s for _, s in a)
    assert 0.85 <= frac["train"] / 2000 <= 0.95
    assert frac["train"] + frac["val"] + frac["test"] == 2000

    import pytest as _pytest
    with _pytest.raises(ValueError, match="sum to 1"):
        sampling.hash_split(df, {"train": 0.5, "val": 0.1})

    s1 = {r.doc_id for r in sampling.hash_sample(df, 0.25).collect()}
    s2 = {r.doc_id for r in
          sampling.hash_sample(df.repartition(7), 0.25).collect()}
    assert s1 == s2
    assert 0.2 <= len(s1) / 2000 <= 0.3


def test_stratified_sample_validates_and_is_deterministic(spark):
    from json_schema_spark.pipeline import sampling

    df = (spark.range(0, 1000).withColumnRenamed("id", "doc_id")
          .withColumn("lang", F.when(F.col("doc_id") % 2 == 0, "en")
                      .otherwise("zh")))
    out = sampling.stratified_hash_sample(df, {"en": 1.0, "zh": 0.2}, "lang")
    rows = out.groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in rows}
    assert got["en"] == 500 and 60 <= got.get("zh", 0) <= 140
    again = sampling.stratified_hash_sample(
        df.repartition(7), {"en": 1.0, "zh": 0.2}, "lang")
    assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="must be in"):
        sampling.stratified_hash_sample(df, {"en": 1.5}, "lang")


def test_sample_and_split_hash_domains_independent(spark):
    """Review r4: sampling and splitting must use independent hash
    domains — with a shared domain, every sampled row's bucket is below
    the sample cut and therefore below the train cut too, so val/test
    would contain ZERO sampled rows."""
    from json_schema_spark.pipeline import sampling

    df = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    sampled = sampling.hash_sample(df, 0.3)
    splits = {r.split for r in sampling.hash_split(sampled).collect()}
    assert splits == {"train", "val", "test"}

    strat = (df.withColumn("lang", F.lit("en")))
    s2 = sampling.stratified_hash_sample(strat, {"en": 0.3}, "lang")
    splits2 = {r.split for r in sampling.hash_split(s2).collect()}
    assert splits2 == {"train", "val", "test"}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="default_fraction"):
        sampling.stratified_hash_sample(strat, {"en": 0.5}, "lang",
                                        default_fraction=1.5)


def test_pack_sequences_guards(spark):
    import pytest as _pytest
    from json_schema_spark.pipeline.text import pack_sequences

    df = spark.createDataFrame([(1, 0, 10)],
                               "doc_id bigint, chunk_idx int, n_tokens int")
    with _pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    packed = pack_sequences(df, budget=64, n_shards=2)
    with _pytest.raises(ValueError, match="already exist"):
        pack_sequences(packed, budget=32, n_shards=2)


def test_asof_skew_buckets_parity(spark):
    """r4 VERDICT #5: the two-phase bucketed carry (skew_buckets=) must
    return exactly the plain path's rows on a corpus with one hot key
    holding ~100x the rows of the others — including rows answered
    across bucket boundaries, leading NULLs, ties, and NULL right
    values inside matched rows."""
    import random

    from json_schema_spark.pipeline import cache

    rng = random.Random(11)
    left_rows, right_rows = [], []
    eid = 0
    # hot key: 400 left + 120 right events over a wide range; cold keys:
    # 4 left + 1-2 right each (some buckets will hold only left rows)
    for user, n_left, n_right in [("hot", 400, 120), ("c1", 4, 2),
                                  ("c2", 4, 1), ("c3", 4, 0)]:
        for _ in range(n_left):
            left_rows.append((eid, user, _ts(0) + datetime.timedelta(
                seconds=rng.randrange(0, 360000))))
            eid += 1
        seen = set()
        for _ in range(n_right):
            s = rng.randrange(0, 360000)
            while s in seen:  # right rows unique per (key, ts)
                s = rng.randrange(0, 360000)
            seen.add(s)
            right_rows.append((user, _ts(0) + datetime.timedelta(seconds=s),
                               None if rng.random() < 0.1 else float(s)))
    # ties: a left row exactly AT a right row's ts
    left_rows.append((eid, "hot", right_rows[0][1]))
    left = spark.createDataFrame(
        left_rows, "event_id bigint, user_id string, ts timestamp")
    right = spark.createDataFrame(
        right_rows, "user_id string, ts timestamp, click double")

    plain = {r.event_id: r.click_asof
             for r in asof_join(left, right, on="user_id").collect()}
    bucketed_df = asof_join(left, right, on="user_id", skew_buckets=8)
    bucketed = {r.event_id: r.click_asof for r in bucketed_df.collect()}
    cache.release(bucketed_df)
    assert bucketed == plain and len(plain) == len(left_rows)
    # non-vacuous: the corpus exercises both matched and unmatched rows
    assert any(v is None for v in plain.values())
    assert any(v is not None for v in plain.values())


def test_asof_skew_buckets_numeric_ts(spark):
    """Bucketed carry over a NUMERIC (non-timestamp) ts column."""
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 25), (3, "k", 4)],
        "event_id bigint, key string, ts bigint")
    right = spark.createDataFrame(
        [("k", 5, 1.0), ("k", 20, 2.0)], "key string, ts bigint, v double")
    out = asof_join(left, right, on="key", skew_buckets=4)
    got = {r.event_id: r.v_asof for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: None}
