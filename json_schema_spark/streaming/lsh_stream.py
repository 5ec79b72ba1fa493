"""Streaming near-duplicate candidates: MinHash-LSH per micro-batch
against a persisted, shard-partitioned signature store.

``dropDuplicatesWithinWatermark`` (dedup_stream.py) handles streaming
EXACT dedup; near-dup candidates need a join against everything seen so
far, which Structured Streaming's keyed state cannot express (the state
key would be the LSH bucket, and the per-key value an unbounded doc list).
The standard shape is ``foreachBatch`` + an external store:

1. each micro-batch computes banded MinHash bucket rows with the SAME
   Catalyst expressions as the batch path (``pipeline.dedup.minhash_bands``
   — stream/batch candidate parity by construction);
2. candidates = (batch × batch) pairs within the micro-batch, plus
   (batch × store) pairs against the persisted signature store — each
   pair is emitted exactly once, in the micro-batch where its LATER
   document arrives, so replaying a corpus through the stream yields the
   same pair SET as one batch ``minhash_lsh_candidates`` run;
3. the batch's bucket rows are appended to the store.

Scale contract (the 100-TB path): the store is parquet partitioned by
``shard = pmod(xxhash64(band, bucket), n_shards)`` — every row of a given
(band, bucket) lives in exactly one shard directory. Each micro-batch
collects its own distinct shard set (bounded by ``n_shards``, driver-side
O(n_shards)) and reads the store WITH a ``shard IN (...)`` filter, so the
scan partition-prunes to the directories the batch actually touches
instead of reading everything seen so far. Pruning is lossless for the
join: (band, bucket) determines shard, so any store row that could match
a batch row is inside the batch's shard set. On Iceberg the same layout
is ``bucket(n_shards, bucket)`` once jars are available; either way add
periodic compaction and a retention horizon mirroring the watermark bound
of the exact-dup path.

``max_bucket_size`` applies the same degenerate-bucket cut as the batch
path, evaluated against the store+batch combined bucket size at emission
time (pairs emitted before a bucket grew past the cap are not retracted —
an inherent property of incremental emission, documented here rather than
hidden). The combined size is exact under pruning: all store rows of any
bucket present in the batch are within the batch's shard set.
"""

from __future__ import annotations

import logging
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.dedup import minhash_bands

_LOG = logging.getLogger(__name__)

SHARD_COL = "shard"


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check via the Hadoop FileSystem API — no parquet
    schema-inference read, no exception-message matching (which is brittle
    across Spark versions / FS backends). Works for any Hadoop-supported
    scheme (file://, hdfs://, s3a://)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def check_store_shards(spark: SparkSession, meta_file: str,
                       n_shards: int) -> None:
    """Pin a store's shard count for its lifetime. Rows written under a
    different ``n_shards`` land in other shard directories, and the pruned
    read SILENTLY misses them — a wrong-answer class, not a crash — so the
    first writer records n_shards in ``meta_file`` (a SIBLING of the store
    directory, so parquet schema inference never sees it) and every later
    open fails loudly on a mismatch."""
    import json

    jvm = spark._jvm
    meta = jvm.org.apache.hadoop.fs.Path(meta_file)
    fs = meta.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(meta):
        stream = fs.open(meta)
        try:
            raw = bytes(stream.readAllBytes()).decode("utf-8")
        finally:
            stream.close()
        recorded = json.loads(raw).get("n_shards")
        if recorded != n_shards:
            raise ValueError(
                f"store meta {meta_file} records n_shards={recorded} but "
                f"the store is being opened with n_shards={n_shards}: the "
                f"pruned scan would silently miss rows. Re-use the "
                f"original value or rebuild the store.")
        return
    out = fs.create(meta, True)
    try:
        out.write(bytearray(json.dumps({"n_shards": n_shards}), "utf-8"))
    finally:
        out.close()


def with_shard(bands_df: DataFrame, n_shards: int) -> DataFrame:
    """Attach the store partition key: a stable hash-shard of the LSH join
    key. Computed identically at write and read time, so the per-batch
    store scan can partition-prune on it."""
    return bands_df.withColumn(
        SHARD_COL, F.pmod(F.xxhash64("band", "bucket"), F.lit(n_shards)))


def pruned_store_read(spark: SparkSession, store_path: str,
                      shards: list) -> DataFrame:
    """The store scan a micro-batch performs: partition-pruned to the
    batch's shard set. Factored out so plan tests can assert the pruning
    (PartitionFilters carry the IN-list) without driving a stream."""
    return (spark.read.parquet(store_path)
            .where(F.col(SHARD_COL).isin(shards)))


def lsh_candidates_stream(stream_df: DataFrame, store_path: str,
                          pairs_path: str, n: int = 3, num_hashes: int = 8,
                          bands: int = 4, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_bucket_size: Optional[int] = None,
                          n_shards: int = 64):
    """Wire a streaming DataFrame of documents into per-micro-batch LSH
    candidate emission. Returns a ``DataStreamWriter`` (caller calls
    ``.start()``, optionally with a checkpoint location).

    Emitted parquet rows at ``pairs_path``: (id_a, id_b) with id_a < id_b,
    once per pair across the stream's lifetime (assuming unique ``id_col``
    values across micro-batches). foreachBatch is at-least-once on
    failure/restart: a batch replay re-appends its pairs and signatures —
    with a transactional table (Iceberg/Delta) make the two writes a
    single ``batch_id``-idempotent commit; with plain parquet, dedup
    downstream on (id_a, id_b).

    ``n_shards`` sizes the store's partition layout (see module
    docstring); it must stay CONSTANT for the lifetime of a store — rows
    written under a different shard count land in the wrong directories
    and silently miss the pruned join. The first batch records the value
    in ``<store>.shards.json`` and later opens with a different value
    FAIL LOUDLY (:func:`check_store_shards`). At cluster scale pick n_shards ≈
    store_size / target_partition_size (e.g. a few thousand); the
    driver-side per-batch collect is O(n_shards) longs.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        check_store_shards(spark, store_path.rstrip("/") + ".shards.json",
                           n_shards)
        counts = None
        bb = with_shard(
            minhash_bands(batch_df, n, num_hashes, bands, text_col, id_col),
            n_shards).persist()
        try:
            if _hadoop_path_exists(spark, store_path):
                # prune the store scan to the batch's shard set — the scan
                # cost is O(touched shards), not O(everything seen so far)
                shards = [r[SHARD_COL] for r in
                          bb.select(SHARD_COL).distinct().collect()]
                store = pruned_store_read(spark, store_path, shards)
                combined = store.unionByName(bb)
            else:
                store = None
                combined = bb
            if max_bucket_size is None:
                capped_new = bb
            else:
                capped_new, counts = cap_bucket_fanout_combined(
                    bb, combined, max_bucket_size, batch_id, id_col=id_col)
            new_a = capped_new.select(F.col(id_col).alias("id_a"),
                                      "band", "bucket")
            new_b = capped_new.select(F.col(id_col).alias("id_b"),
                                      "band", "bucket")
            pairs = (new_a.join(new_b, ["band", "bucket"])
                     .where(F.col("id_a") < F.col("id_b"))
                     .select("id_a", "id_b"))
            if store is not None:
                old = store.select(F.col(id_col).alias("old_id"),
                                   "band", "bucket")
                cross = (capped_new.join(old, ["band", "bucket"])
                         .where(F.col(id_col) != F.col("old_id"))
                         .select(F.least(id_col, "old_id").alias("id_a"),
                                 F.greatest(id_col, "old_id").alias("id_b")))
                pairs = pairs.unionByName(cross)
            pairs.distinct().write.mode("append").parquet(pairs_path)
            # append the UNCAPPED batch rows: the store must stay a faithful
            # signature record (the cap gates emission, not membership)
            bb.write.mode("append").partitionBy(SHARD_COL).parquet(store_path)
        finally:
            # unpersist in finally: a failed write otherwise leaks one
            # cached frame per retry in a long-running stream
            bb.unpersist()
            if counts is not None:
                counts.unpersist()

    return stream_df.writeStream.foreachBatch(process)


def cap_bucket_fanout_combined(bb: DataFrame, combined: DataFrame,
                               max_bucket_size: int,
                               batch_id: int = -1,
                               id_col: str = "doc_id"):
    """Streaming cap variant: size a bucket by the WHOLE corpus seen so far
    (store + batch), not just the batch — a degenerate bucket grows across
    micro-batches, and capping on batch-local size would let every batch
    re-join against a million-row store bucket. Same no-silent-caps
    contract as the batch ``cap_bucket_fanout``: a WARNING per micro-batch
    reports how many oversized buckets gated emission.

    Sizes dedup on (id, band, bucket) first: an at-least-once replay
    re-appends a batch's signature rows to the store, and double-counted
    rows would permanently inflate bucket sizes past the cap (emission
    gated forever on a bucket that is actually under it). The join side
    needs no such dedup — duplicate store rows only produce duplicate
    pairs, which ``distinct()`` drops before the write."""
    big = (combined.dropDuplicates([id_col, "band", "bucket"])
           .groupBy("band", "bucket")
           .agg(F.count(F.lit(1)).alias("__bsz"))
           .where(F.col("__bsz") > max_bucket_size)
           .select("band", "bucket").persist())
    n_big = big.count()
    if n_big:
        _LOG.warning(
            "lsh_candidates_stream batch %d: %d bucket(s) over "
            "max_bucket_size=%d — new rows in them emit no candidate "
            "pairs this batch", batch_id, n_big, max_bucket_size)
    return bb.join(big, ["band", "bucket"], "left_anti"), big
