"""Referential integrity: dangling ``media_ref`` detection.

Corpus generalization of ``$ref`` resolution (the reference resolves schema
refs against a DocumentStore, reference_expander.rb:236-272; the north_rule
lifts the idea to data space: every span's media_ref must resolve in the
media catalog).

Scale strategy (north_rule: "partitioning / shuffle / skew handled
explicitly"):

- The catalog side is dimension-like → ``broadcast()`` it under the
  threshold: the 100 TB fact side is scanned once, never shuffled.
- Above the threshold, Spark's runtime Bloom-filter injection
  (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default —
  the 10 GB ``applicationSideScanSizeThreshold`` is what keeps it out of
  test-scale plans; injection on the exercised join shape is
  plan-asserted in ``tests/test_plans.py``) prunes the fact side at the
  scan for the INNER/SEMI forms, and AQE skew-join splitting absorbs hot
  keys (the deliberately skewed generator mode exercises this). The
  LEFT ANTI form cannot take a Bloom filter — a false positive would
  wrongly DROP a non-matching row — which is exactly why this module
  aggregates to the key space first and broadcasts the catalog side for
  the anti-join itself.
- De-duplicate refs *before* the join (map-side combine on the distinct)
  so a hot key crosses the wire once per map partition, then join the
  dangling key set back to get violation rows if needed — the classic
  aggregate-then-join skew defeat.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def extract_refs(docs: DataFrame, id_col: str = "doc_id",
                 spans_col: str = "spans") -> DataFrame:
    """(doc_id, span_idx, media_ref) for every media-bearing span."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(
                F.filter(F.col(spans_col), lambda s: s.getField("media_ref").isNotNull())
            ).alias("span_idx", "span"),
        )
        .select(id_col, "span_idx", F.col("span.media_ref").alias("media_ref"))
    )


def dangling_refs(docs: DataFrame, media: DataFrame,
                  id_col: str = "doc_id", spans_col: str = "spans",
                  media_key: str = "media_ref",
                  broadcast_media: Optional[bool] = True) -> DataFrame:
    """Violation rows (doc_id, span_idx, media_ref) whose ref has no media
    row. ``broadcast_media=None`` lets AQE decide."""
    refs = extract_refs(docs, id_col, spans_col)
    dim = media.select(F.col(media_key).alias("__dim_key"))
    if broadcast_media:
        dim = F.broadcast(dim)
    return refs.join(dim, refs["media_ref"] == F.col("__dim_key"), "left_anti")


def dangling_ref_keys(docs: DataFrame, media: DataFrame,
                      spans_col: str = "spans",
                      media_key: str = "media_ref") -> DataFrame:
    """Distinct dangling keys with occurrence counts — the skew-safe form:
    aggregate to the key space first (hot key → one row per map partition),
    then anti-join the tiny distinct set against the catalog."""
    refs = (
        docs.select(F.explode(
            F.filter(F.col(spans_col), lambda s: s.getField("media_ref").isNotNull())
        ).alias("span"))
        .select(F.col("span.media_ref").alias("media_ref"))
        .groupBy("media_ref")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    dim = media.select(F.col(media_key).alias("__dim_key"))
    return refs.join(F.broadcast(dim), refs["media_ref"] == F.col("__dim_key"), "left_anti")
