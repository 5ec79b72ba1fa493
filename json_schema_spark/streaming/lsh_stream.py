"""Streaming near-duplicate candidates: MinHash-LSH per micro-batch
against a persisted signature store.

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

Scale notes: the store is an append-only (band, bucket)-keyed table —
at 100 TB it should live in a bucketed/partitioned table (Iceberg
``bucket(N, bucket)`` layout once jars are available; plain parquet here)
so the per-micro-batch join prunes to the buckets the batch actually
touches, with periodic compaction and a retention horizon mirroring the
watermark bound of the exact-dup path. ``max_bucket_size`` applies the
same degenerate-bucket cut as the batch path, evaluated against the
store+batch combined bucket size at emission time (pairs emitted before a
bucket grew past the cap are not retracted — an inherent property of
incremental emission, documented here rather than hidden).
"""

from __future__ import annotations

import logging
from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..pipeline.dedup import minhash_bands

_LOG = logging.getLogger(__name__)


def _store_exists(spark, path: str) -> bool:
    """True iff the signature store already has data. ONLY a missing-path
    AnalysisException means 'first batch'; any other read failure
    (permissions, corrupt footer, transient FS error) must propagate —
    treating it as first-batch would silently drop every batch-vs-store
    pair for the micro-batch, and those pairs are never re-examined."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path)
        return True
    except AnalysisException as exc:
        if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
            return False
        raise


def lsh_candidates_stream(stream_df: DataFrame, store_path: str,
                          pairs_path: str, n: int = 3, num_hashes: int = 8,
                          bands: int = 4, text_col: str = "text",
                          id_col: str = "doc_id",
                          max_bucket_size: Optional[int] = None):
    """Wire a streaming DataFrame of documents into per-micro-batch LSH
    candidate emission. Returns a ``DataStreamWriter`` (caller calls
    ``.start()``, optionally with a checkpoint location).

    Emitted parquet rows at ``pairs_path``: (id_a, id_b) with id_a < id_b,
    once per pair across the stream's lifetime (assuming unique ``id_col``
    values across micro-batches). foreachBatch is at-least-once on
    failure/restart: a batch replay re-appends its pairs and signatures —
    with a transactional table (Iceberg/Delta) make the two writes a
    single ``batch_id``-idempotent commit; with plain parquet, dedup
    downstream on (id_a, id_b)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counts = None
        bb = minhash_bands(batch_df, n, num_hashes, bands, text_col,
                           id_col).persist()
        try:
            if _store_exists(spark, store_path):
                store = spark.read.parquet(store_path)
                combined = store.unionByName(bb)
            else:
                store = None
                combined = bb
            if max_bucket_size is None:
                capped_new = bb
            else:
                capped_new, counts = cap_bucket_fanout_combined(
                    bb, combined, max_bucket_size, batch_id)
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
            bb.write.mode("append").parquet(store_path)
        finally:
            # unpersist in finally: a failed write otherwise leaks one
            # cached frame per retry in a long-running stream
            bb.unpersist()
            if counts is not None:
                counts.unpersist()

    return stream_df.writeStream.foreachBatch(process)


def cap_bucket_fanout_combined(bb: DataFrame, combined: DataFrame,
                               max_bucket_size: int,
                               batch_id: int = -1):
    """Streaming cap variant: size a bucket by the WHOLE corpus seen so far
    (store + batch), not just the batch — a degenerate bucket grows across
    micro-batches, and capping on batch-local size would let every batch
    re-join against a million-row store bucket. Same no-silent-caps
    contract as the batch ``cap_bucket_fanout``: a WARNING per micro-batch
    reports how many oversized buckets gated emission."""
    big = (combined.groupBy("band", "bucket")
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
