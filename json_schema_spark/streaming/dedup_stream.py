"""Streaming deduplication: exact-dup suppression over an unbounded
document stream.

The batch exact-dedup (pipeline/dedup.py) keys on the md5 fingerprint of
normalized text; the streaming analog keeps first-seen fingerprints as
watermark-bounded state via ``dropDuplicatesWithinWatermark`` — state for a
fingerprint is dropped once the watermark passes it, so state size is
bounded by (dup horizon × arrival rate), not the stream's full history.
That bound is the only semantic difference from batch dedup: a duplicate
arriving AFTER the watermark horizon is re-emitted (documented,
inherent to bounded-state streaming — the batch job is the backstop).

Everything is stateless projection except the keyed state store lookup;
the fingerprint column reuses the exact same Catalyst expression as the
batch path, so stream and batch agree on what "duplicate" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..pipeline.text import fingerprint


def dedup_stream(stream_df: DataFrame, text_col: str = "text",
                 ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """First-seen-wins exact dedup on a streaming DataFrame: emits each
    distinct document fingerprint once within the watermark horizon.
    Returns a streaming DataFrame (caller attaches the sink)."""
    return (
        stream_df
        .withColumn("__fp", fingerprint(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def dedup_stream_global(stream_df: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """Unbounded-state variant (``dropDuplicates``): exact batch parity —
    every duplicate ever seen is suppressed — at the cost of state that
    grows with the number of DISTINCT documents. Use only when the
    distinct-fingerprint cardinality fits executor state (or with RocksDB
    state store + TTL tuned off-path); prefer dedup_stream at 100 TB."""
    return (
        stream_df
        .withColumn("__fp", fingerprint(F.col(text_col)))
        .dropDuplicates(["__fp"])
        .drop("__fp")
    )
