"""Streaming validation: parquet source → memory sink, driven to completion
synchronously (processAllAvailable) per the local smoke pattern."""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.datagen import (DocGenConfig, documents_json_schema,
                                       generate_documents)
from json_schema_spark.engine import ValidationEngine
from json_schema_spark.streaming import streaming_verdicts, validate_stream
from json_schema_spark.streaming.validate_stream import streaming_violations

CFG = DocGenConfig(n_docs=500, seed=9, bad_kind_rate=0.05, partitions=4)


@pytest.fixture()
def docs_path(spark, tmp_path):
    path = str(tmp_path / "docs")
    docs = generate_documents(spark, CFG).withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.xxhash64("doc_id") % 3600))
    docs.write.parquet(path)
    return path


def test_streaming_violations_and_verdicts(spark, docs_path):
    engine = ValidationEngine(spark)
    schema = documents_json_schema(CFG)
    static = spark.read.parquet(docs_path)

    stream = (spark.readStream.schema(static.schema).parquet(docs_path))
    annotated = validate_stream(engine, stream.drop("ts"), schema, id_cols=["doc_id"])
    # re-attach ts for the windowed rollup
    annotated_ts = validate_stream(engine, stream, schema, id_cols=["doc_id"])

    viol_q = (streaming_violations(annotated, ["doc_id"])
              .writeStream.format("memory").queryName("viol_out")
              .outputMode("append").start())
    verd_q = (streaming_verdicts(annotated_ts, "ts", "10 minutes", "20 minutes")
              .writeStream.format("memory").queryName("verd_out")
              .outputMode("append").start())
    try:
        viol_q.processAllAvailable()
        verd_q.processAllAvailable()

        stream_viols = spark.sql("SELECT doc_id, path, error_type FROM viol_out")
        batch = engine.validate_typed(static.drop("ts"), schema, id_cols=["doc_id"])
        batch_viols = batch.violations.select("doc_id", "path", "error_type")
        assert stream_viols.exceptAll(batch_viols).count() == 0
        assert batch_viols.exceptAll(stream_viols).count() == 0

        # append-mode windowed verdicts only emit closed windows; totals
        # must never exceed the corpus and each row must be consistent
        verd = spark.sql("SELECT * FROM verd_out").collect()
        assert sum(r["docs"] for r in verd) <= CFG.n_docs
        for r in verd:
            assert r["valid_docs"] <= r["docs"]
    finally:
        viol_q.stop()
        verd_q.stop()


def test_streaming_deep_matches_batch(spark, tmp_path):
    """Deep validation per micro-batch (foreachBatch) over a cyclic schema:
    stream results equal the batch deep engine's."""
    import json

    from json_schema_spark.deep import DeepValidator
    from json_schema_spark.streaming.validate_stream import validate_stream_deep

    schema = {
        "type": ["object"],
        "properties": {
            "v": {"type": ["integer"], "minimum": 0},
            "next": {"$ref": "#"},
        },
    }
    docs = [
        {"v": 1},
        {"v": 1, "next": {"v": 2, "next": {"v": -3}}},   # nested violation
        {"v": -1},
        {"v": 0, "next": {"v": 0, "next": {"v": 0, "next": {"v": 4}}}},
    ]
    path = str(tmp_path / "stream_docs")
    rows = [(i, json.dumps(d)) for i, d in enumerate(docs)]
    static = spark.createDataFrame(rows, "i long, doc string")
    static.write.parquet(path)

    collected = []
    stream = spark.readStream.schema(static.schema).parquet(path)
    q = (validate_stream_deep(spark, stream, schema, "doc", "i",
                              sink=lambda df, bid: collected.extend(df.collect()))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["i"]: r for r in collected}
    batch = DeepValidator(spark, schema).validate(
        static.withColumn("v", __import__("pyspark.sql.functions", fromlist=["parse_json"]).parse_json("doc")),
        "v", "i")
    want = {r["doc_id"]: r for r in batch.collect()}
    assert set(got) == set(want) == set(range(len(docs)))
    for i in want:
        assert got[i]["is_valid"] == want[i]["is_valid"], i
        assert sorted((e["error_type"], e["path"]) for e in got[i]["violations"]) == \
               sorted((e["error_type"], e["path"]) for e in want[i]["violations"]), i
    assert not got[1]["is_valid"] and got[1]["violations"][0]["path"] == "#/next/next/v"


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """dedup_stream_global over a file stream == batch dedup_exact on the
    same corpus (set of surviving fingerprints); dedup_stream (watermarked)
    emits each fingerprint at most once per micro-batch horizon."""
    from json_schema_spark.pipeline.dedup import dedup_exact
    from json_schema_spark.pipeline.text import fingerprint
    from json_schema_spark.streaming.dedup_stream import (dedup_stream,
                                                          dedup_stream_global)

    path = str(tmp_path / "dup_docs")
    docs = spark.createDataFrame(
        [(i, f"document body {i % 40}") for i in range(200)],
        "doc_id bigint, text string",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
    docs.repartition(4).write.parquet(path)
    static = spark.read.parquet(path)

    stream = spark.readStream.schema(static.schema).parquet(path)
    q = (dedup_stream_global(stream)
         .writeStream.format("memory").queryName("dedup_g")
         .outputMode("append").start())
    q2 = (dedup_stream(stream, watermark="1 hour")
          .writeStream.format("memory").queryName("dedup_w")
          .outputMode("append").start())
    try:
        q.processAllAvailable()
        q2.processAllAvailable()
        got = spark.sql("SELECT text FROM dedup_g")
        # 40 distinct bodies -> exactly 40 survivors, same fingerprint SET
        # as the batch path (first-seen id differs: arrival vs min-id order)
        assert got.count() == 40
        batch = dedup_exact(static, "text", "doc_id")
        sfp = {r[0] for r in got.select(fingerprint(F.col("text"))).collect()}
        bfp = {r[0] for r in batch.select(fingerprint(F.col("text"))).collect()}
        assert sfp == bfp
        # watermarked variant: at most one emission per fingerprint here
        # (single-horizon corpus), never more than the distinct count
        assert spark.sql("SELECT count(*) FROM dedup_w").collect()[0][0] == 40
    finally:
        q.stop()
        q2.stop()


def test_streaming_lsh_candidates_match_batch(spark, tmp_path):
    """r3 VERDICT #7: replaying a corpus through the micro-batch LSH
    (foreachBatch + persisted signature store) must emit the same candidate
    pair SET as one batch minhash_lsh_candidates run, each pair exactly
    once (in the micro-batch where its later document arrives)."""
    from json_schema_spark.pipeline import cache
    from json_schema_spark.pipeline.dedup import minhash_lsh_candidates
    from json_schema_spark.streaming.lsh_stream import lsh_candidates_stream

    # 30 docs over 10 near-identical content groups so LSH collides within
    # and across micro-batches; one file per doc -> maxFilesPerTrigger=7
    # forces several micro-batches with group members split across them
    path = str(tmp_path / "lsh_docs")
    docs = spark.createDataFrame(
        [(i, f"shared boilerplate tokens {i % 10} alpha beta gamma delta "
             f"epsilon zeta eta theta iota kappa")
         for i in range(30)],
        "doc_id bigint, text string")
    docs.repartition(30).write.parquet(path)
    static = spark.read.parquet(path)

    store = str(tmp_path / "sig_store")
    pairs = str(tmp_path / "pairs_out")
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", 7).parquet(path))
    q = (lsh_candidates_stream(stream, store, pairs)
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got_rows = spark.read.parquet(pairs).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    assert len(got_rows) == len(got), "a pair was emitted more than once"

    bout = minhash_lsh_candidates(static, max_bucket_size=None)
    want = {(r.id_a, r.id_b) for r in bout.collect()}
    cache.release(bout)
    assert got == want and len(want) >= 30  # 10 groups of 3 -> >= 30 pairs


def test_streaming_sessionization_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: replaying events in timestamp
    order through micro-batches yields the batch gap-session result
    exactly (same integer-microsecond gap rule as q_user_sessions)."""
    import datetime

    from pyspark.sql import Window
    from json_schema_spark.streaming.sessions_stream import sessionize_stream

    base = datetime.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for u in range(12):
        t = base + datetime.timedelta(minutes=u)
        for s in range(1 + u % 3):            # sessions per user
            t += datetime.timedelta(hours=2)  # gap opens a new session
            for k in range(1 + (u + s) % 4):  # events per session
                rows.append((eid, f"u{u}", t))
                t += datetime.timedelta(minutes=5 * k)  # includes 0-gap ties
                eid += 1
    events = spark.createDataFrame(rows, "event_id bigint, user_id string, ts timestamp")

    # batch truth (the q_user_sessions formula)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    batch = (events.withColumn(
                 "ns", F.when(gap.isNull() | (gap > 3_600_000_000), 1).otherwise(0))
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum("ns").alias("n_sessions")))
    want = {r.user_id: (r.n_events, r.n_sessions) for r in batch.collect()}

    # replay in ts order across 3 sequential files (file source processes
    # them in mtime order; maxFilesPerTrigger=1 -> 3 micro-batches)
    import time
    path = tmp_path / "sess_events"
    path.mkdir()
    ordered = sorted(rows, key=lambda r: (r[2], r[0]))
    cut = len(ordered) // 3
    for i, chunk in enumerate((ordered[:cut], ordered[cut:2 * cut],
                               ordered[2 * cut:])):
        spark.createDataFrame(chunk, events.schema).coalesce(1) \
            .write.parquet(str(path / f"b{i}"))
        time.sleep(1.1)  # distinct mtimes keep replay order deterministic

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(path / "b*")))
    q = (sessionize_stream(stream)
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode re-emits a user's running totals each batch; the final
    # (max-events) row per user is the end-of-stream state
    got = {r.user_id: (r.n_events, r.n_sessions) for r in spark.sql(
        "SELECT user_id, max(n_events) AS n_events, max(n_sessions) AS n_sessions "
        "FROM sess_out GROUP BY user_id").collect()}
    assert got == want and len(want) == 12


def test_streaming_sessionization_skips_null_ts(spark, tmp_path):
    """A NULL timestamp must not wedge the query (int(NaN) inside the
    stateful fold would fail the micro-batch forever); NULL rows are
    filtered before the fold."""
    import datetime

    from json_schema_spark.streaming.sessions_stream import sessionize_stream

    t = datetime.datetime(2026, 1, 1)
    rows = [(1, "u1", t), (2, "u1", None), (3, None, t),
            (4, "u1", t + datetime.timedelta(hours=3))]
    path = str(tmp_path / "nulls")
    df = spark.createDataFrame(rows, "event_id bigint, user_id string, ts timestamp")
    df.coalesce(1).write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    q = (sessionize_stream(stream)
         .writeStream.format("memory").queryName("sess_nulls")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.user_id: (r.n_events, r.n_sessions)
           for r in spark.sql("SELECT * FROM sess_nulls").collect()}
    assert got == {"u1": (2, 2)}  # NULL-ts and NULL-user rows skipped


def test_streaming_sessionization_multichunk_group(spark, tmp_path):
    """Regression: applyInPandasWithState hands the fold MULTIPLE Arrow
    chunks per key when the group exceeds arrow.maxRecordsPerBatch, and
    cross-chunk order after the shuffle is not timestamp order. Sorting
    per chunk (the old bug) over-counts sessions; the fold must sort the
    key's whole micro-batch slice once."""
    import datetime

    from json_schema_spark.streaming.sessions_stream import sessionize_stream

    t = datetime.datetime(2026, 1, 1)
    h = datetime.timedelta(hours=2)
    m = datetime.timedelta(minutes=5)
    # 2 true sessions: {t, t+5m} and {t+2h, t+2h+5m}. Written interleaved
    # across sessions so any 2-row chunk spans both sessions.
    rows = [(1, "u1", t), (2, "u1", t + h), (3, "u1", t + m),
            (4, "u1", t + h + m)]
    path = str(tmp_path / "chunked")
    df = spark.createDataFrame(rows, "event_id bigint, user_id string, ts timestamp")
    df.coalesce(1).write.parquet(path)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(df.schema).parquet(path)
        q = (sessionize_stream(stream)
             .writeStream.format("memory").queryName("sess_chunks")
             .outputMode("update").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {r.user_id: (r.n_events, r.n_sessions)
           for r in spark.sql("SELECT * FROM sess_chunks").collect()}
    assert got == {"u1": (4, 2)}


def test_streaming_lsh_store_scan_prunes(spark, tmp_path):
    """r4 VERDICT #1: the signature store is shard-partitioned
    (pmod(xxhash64(band, bucket), n_shards)) and each micro-batch reads it
    pruned to its own shard set — the second batch's store scan must see
    FEWER rows than the store holds, while missing no row that could join
    the batch on (band, bucket)."""
    import time

    from json_schema_spark.pipeline.dedup import minhash_bands
    from json_schema_spark.streaming.lsh_stream import (
        SHARD_COL, lsh_candidates_stream, pruned_store_read, with_shard)

    path = tmp_path / "prune_docs"
    path.mkdir()
    mk = lambda i: (i, f"unique document number {i} with body token_{i} "
                       f"tail_{i * 7 % 13} filler_{i * 3 % 11}")
    docs1 = [mk(i) for i in range(35)]
    docs2 = [mk(i) for i in range(35, 40)]
    schema = "doc_id bigint, text string"
    spark.createDataFrame(docs1, schema).coalesce(1) \
        .write.parquet(str(path / "b0"))
    time.sleep(1.1)  # distinct mtimes keep replay order deterministic
    spark.createDataFrame(docs2, schema).coalesce(1) \
        .write.parquet(str(path / "b1"))

    store = str(tmp_path / "sig_store_pruned")
    pairs = str(tmp_path / "pairs_pruned")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(path / "b*")))
    q = (lsh_candidates_stream(stream, store, pairs, n_shards=64)
         .option("checkpointLocation", str(tmp_path / "ckpt_pruned")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    full = spark.read.parquet(store)
    assert full.count() == 40 * 4  # both batches appended, 4 bands each

    # replicate batch 2's store scan through the same helper process() uses
    b2 = with_shard(minhash_bands(
        spark.createDataFrame(docs2, schema)), 64).persist()
    shards = [r[SHARD_COL] for r in b2.select(SHARD_COL).distinct().collect()]
    pruned = pruned_store_read(spark, store, shards)
    assert pruned.count() < full.count(), "store scan did not prune"

    # lossless: every store row that joins batch 2 on (band, bucket)
    # survives the pruned scan
    on = ["band", "bucket"]
    n_full = full.join(b2.select(on).distinct(), on).count()
    n_pruned = pruned.join(b2.select(on).distinct(), on).count()
    b2.unpersist()
    assert n_full == n_pruned


def test_streaming_curation_matches_batch(spark, tmp_path):
    """r4 VERDICT #7: replaying a corpus through the incremental curation
    stream (filter -> exact-dedup -> near-dup pair discovery per
    micro-batch) and finalizing with curated_survivors must reproduce the
    batch curate_corpus row set exactly — including a LATE-BRIDGE
    component (two dissimilar early docs connected only by a later doc),
    the case per-batch survivor emission cannot get right."""
    import time

    from json_schema_spark.pipeline import cache
    from json_schema_spark.pipeline.curate import curate_corpus
    from json_schema_spark.streaming.curate_stream import (
        curate_stream, curated_survivors)

    x = "the quick brown fox of the north jumped over a lazy dog"
    y = "a stitch of time saves nine and the early bird gets the worm"
    filler1 = "to boldly go where the few of us and all have gone"
    filler2 = "the rain of spain falls mainly on a plain and stays"
    rows = [
        # late bridge: 1 ~ 40 and 5 ~ 40 but 1 !~ 5 (measured jaccards
        # 0.286 / 0.324 vs < 0.15); 40 arrives in the LAST batch, after 5
        # was a kept representative for two whole batches
        (1, f"{x} {filler1}"),
        (5, f"{y} {filler2}"),
        # near-identical pair within batch 1 (jaccard 0.955)
        (2, f"the tall green tree of the old forest and a river {x}"),
        (3, f"the tall green tree of the old forest and a river {x} extra"),
        # exact dup across batches (11 in b2, 21 in b3)
        (11, f"the exact same sentence of a document and the end {y}"),
        # filtered out: too short / wrong lang / high dup_frac
        (12, "the of and"),
        (13, "der die und das ist der die und das ist der die und"),
        (14, "the " + "word word word word " * 8 + "of a the to and"),
        # shares filler1 with doc 1 (jaccard 0.294 -> edge at 0.28)
        (15, f"an unrelated document about the sea and the sky of old {filler1} tail"),
        (21, f"the exact same sentence of a document and the end {y}"),
        (22, f"another of the standalone documents about a mountain and the {filler2} peak"),
        (40, f"{x} {y}"),
        (30, f"the final of all standalone entries and a closing remark to the reader"),
    ]
    params = dict(min_tokens=6, max_dup_frac=0.5, langs=("en",),
                  jaccard_n=3, jaccard_threshold=0.28)

    schema = "doc_id bigint, text string"
    static = spark.createDataFrame(rows, schema)
    bout = curate_corpus(static, max_shingle_freq=None, **params)
    want = {tuple(r) for r in bout.collect()}
    cache.release(bout)
    # the corpus must be non-trivial: the bridge merges {1,2,3,15} and
    # {5,11} through 40, so 5 — kept for two batches — is revoked at
    # finalization; exact dup 21 and filtered 12/13/14 never enter
    want_ids = {t[0] for t in want}
    assert want_ids == {1, 22, 30}, want_ids

    # 3-micro-batch replay in ascending doc_id order (id order reproduces
    # batch min-id dedup choices; the bridge doc 40 rides the last batch)
    path = tmp_path / "cur_docs"
    path.mkdir()
    ordered = sorted(rows)
    for i, chunk in enumerate((ordered[:4], ordered[4:9], ordered[9:])):
        spark.createDataFrame(chunk, schema).coalesce(1) \
            .write.parquet(str(path / f"b{i}"))
        time.sleep(1.1)
    out_dir = str(tmp_path / "cur_out")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(path / "b*")))
    q = (curate_stream(stream, out_dir, **params, n_shards=16)
         .option("checkpointLocation", str(tmp_path / "cur_ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {tuple(r) for r in curated_survivors(spark, out_dir).collect()}
    assert got == want


def test_store_shard_count_pinned(spark, tmp_path):
    """A store created under one n_shards must refuse to open under
    another — rows would land in (and be pruned from) the wrong shard
    directories, a silent wrong-answer class."""
    import pytest as _pytest

    from json_schema_spark.streaming.lsh_stream import check_store_shards

    meta = str(tmp_path / "store.shards.json")
    check_store_shards(spark, meta, 64)   # first open records
    check_store_shards(spark, meta, 64)   # same value: fine
    with _pytest.raises(ValueError, match="n_shards=64"):
        check_store_shards(spark, meta, 32)


def test_streaming_curation_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch re-appends its rows
    to every store. Simulate a full replay by re-appending ALL store
    contents mid-stream, then process one more micro-batch whose doc
    near-dups an already-kept doc — the duplicated (doc, shingle)/size
    rows must not distort the new batch's jaccard, and the finalizer must
    return exactly the batch curate_corpus result."""
    import time

    from json_schema_spark.pipeline import cache
    from json_schema_spark.pipeline.curate import curate_corpus
    from json_schema_spark.streaming.curate_stream import (
        SHARD_COL, curate_stream, curated_survivors)

    rows1 = [
        (1, "the first of the standalone documents about a river and the sea"),
        (2, "the second of the standalone documents about a hill and the sky"),
    ]
    # 50 near-dups doc 2 (one extra token); 51 is unrelated
    rows2 = [
        (50, "the second of the standalone documents about a hill and the sky indeed"),
        (51, "the closing of all entries and a final remark to the reader of it"),
    ]
    params = dict(min_tokens=6, max_dup_frac=0.5, langs=("en",),
                  jaccard_n=3, jaccard_threshold=0.5)
    schema = "doc_id bigint, text string"

    path = tmp_path / "replay_docs"
    path.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.parquet(str(path / "b0"))
    out_dir = str(tmp_path / "replay_out")
    ckpt = str(tmp_path / "replay_ckpt")

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(path / "b*")))
        q = (curate_stream(stream, out_dir, **params, n_shards=16)
             .option("checkpointLocation", ckpt).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()

    # simulate an at-least-once replay of everything processed so far
    for sub, part in (("kept", None), ("fp_store", SHARD_COL),
                      ("shingle_store", SHARD_COL), ("sizes", None),
                      ("pairs", None)):
        p = f"{out_dir}/{sub}"
        import os
        if not os.path.exists(p):
            continue
        dup = spark.read.parquet(p)
        w = dup.write.mode("append")
        if part:
            w = w.partitionBy(part)
        w.parquet(p)

    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.parquet(str(path / "b1"))
    run_once()  # same checkpoint: only the new file is processed

    got = {tuple(r) for r in curated_survivors(spark, out_dir).collect()}
    static = spark.createDataFrame(rows1 + rows2, schema)
    bout = curate_corpus(static, max_shingle_freq=None, **params)
    want = {tuple(r) for r in bout.collect()}
    cache.release(bout)
    assert got == want
    ids = {t[0] for t in got}
    assert 2 in ids and 50 not in ids, ids  # the cross-batch pair formed


def test_streaming_curation_partial_replay(spark, tmp_path):
    """Commit order is pairs -> kept -> fp_store -> shingles -> sizes, so
    the harmful partial failure is 'fp_store appended, shingle/size
    appends lost'. On replay the batch's own fps are already in the
    store; without the batch_id exclusion the anti-join drops the whole
    batch, its shingles are never written, and a LATER batch's near-dup
    of one of its docs silently fails to pair. Simulate the failed
    attempt, replay, then deliver the later near-dup and require full
    parity with batch curate_corpus."""
    import time

    from json_schema_spark.pipeline import cache
    from json_schema_spark.pipeline.curate import (annotate_and_filter,
                                                   curate_corpus)
    from json_schema_spark.pipeline.dedup import fingerprint, shingles
    from json_schema_spark.streaming.curate_stream import (
        SHARD_COL, curate_stream, curated_survivors)

    rows0 = [
        (1, "the first of the standalone documents about a river and the sea"),
        (2, "the second of the standalone documents about a hill and the sky"),
    ]
    rows1 = [
        (50, "an unrelated treatise on the cooking of beans and rice at altitude"),
        (51, "the closing of all entries and a final remark to the reader of it"),
    ]
    # 90 near-dups doc 51 (one extra token) — arrives AFTER the replay
    rows2 = [
        (90, "the closing of all entries and a final remark to the reader of it truly"),
    ]
    params = dict(min_tokens=6, max_dup_frac=0.5, langs=("en",),
                  jaccard_n=3, jaccard_threshold=0.5)
    schema = "doc_id bigint, text string"
    path = tmp_path / "preplay_docs"
    path.mkdir()
    out_dir = str(tmp_path / "preplay_out")
    ckpt = str(tmp_path / "preplay_ckpt")

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(str(path / "b*")))
        q = (curate_stream(stream, out_dir, **params, n_shards=16)
             .option("checkpointLocation", ckpt).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    spark.createDataFrame(rows0, schema).coalesce(1) \
        .write.parquet(str(path / "b0"))
    run_once()  # batch 0

    # failed attempt of batch 1: pairs (none — both docs standalone),
    # kept, and fp_store committed; shingle/size appends lost
    b1 = spark.createDataFrame(rows1, schema)
    ann = annotate_and_filter(b1, **{k: v for k, v in params.items()
                                     if k != "jaccard_threshold"})
    (ann.select("doc_id", "lang", "n_tokens",
                F.round("__dup_frac", 6).alias("dup_frac_r6"))
     .write.mode("append").parquet(f"{out_dir}/kept"))
    (ann.withColumn("fp", fingerprint(F.col("text")))
     .select("fp")
     .withColumn(SHARD_COL, F.pmod(F.xxhash64("fp"), F.lit(16)))
     .withColumn("batch_id", F.lit(1))
     .write.mode("append").partitionBy(SHARD_COL).parquet(f"{out_dir}/fp_store"))

    time.sleep(1.1)
    spark.createDataFrame(rows1, schema).coalesce(1) \
        .write.parquet(str(path / "b1"))
    run_once()  # batch 1 — the REPLAY of the failed attempt

    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1) \
        .write.parquet(str(path / "b2"))
    run_once()  # batch 2 — must pair 90 with the replayed 51

    got = {tuple(r) for r in curated_survivors(spark, out_dir).collect()}
    static = spark.createDataFrame(rows0 + rows1 + rows2, schema)
    bout = curate_corpus(static, max_shingle_freq=None, **params)
    want = {tuple(r) for r in bout.collect()}
    cache.release(bout)
    assert got == want
    ids = {t[0] for t in got}
    assert 51 in ids and 90 not in ids, ids  # the post-replay pair formed
