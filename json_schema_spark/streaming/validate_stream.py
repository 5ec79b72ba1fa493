"""Structured Streaming validation.

The compiled constraint expressions are stateless Catalyst projections, so
the same compiled schema drives a ``readStream`` source unchanged: per-batch
validation is embarrassingly parallel, watermarked tumbling windows roll
verdict counts for late data, and the violations stream appends to any sink
(parquet/Kafka/foreachBatch).

Batch engine (engine.py) and this module share one compiler — there is no
separate streaming semantics to keep in sync.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, functions as F

from ..engine import ERRORS_COL, VALID_COL, ValidationEngine
from ..schema import SchemaNode


def validate_stream(engine: ValidationEngine, stream_df: DataFrame,
                    schema: Union[dict, SchemaNode],
                    doc_col: Optional[str] = None,
                    id_cols: Optional[List[str]] = None) -> DataFrame:
    """Annotate a streaming DataFrame with is_valid + violations columns.
    Returns a streaming DataFrame (caller attaches the sink)."""
    result = engine.validate_typed(stream_df, schema, doc_col=doc_col, id_cols=id_cols)
    return result.annotated


def streaming_verdicts(annotated: DataFrame, ts_col: str,
                       window_duration: str = "5 minutes",
                       watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window verdict rollup over an annotated stream."""
    return (
        annotated
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.col(VALID_COL).cast("long")).alias("valid_docs"),
            F.sum(F.size(ERRORS_COL).cast("long")).alias("violation_count"),
        )
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "docs", "valid_docs", "violation_count")
    )


def streaming_violations(annotated: DataFrame, id_cols: List[str]) -> DataFrame:
    """Append-mode violations stream: one row per violation."""
    return (
        annotated.where(F.size(ERRORS_COL) > 0)
        .select(*id_cols, F.explode(ERRORS_COL).alias("e"))
        .select(*id_cols, "e.path", "e.error_type", "e.message")
    )


def validate_stream_deep(spark, stream_df: DataFrame,
                         schema: Union[dict, SchemaNode],
                         json_col: str, id_col: str,
                         sink, store=None, max_depth: int = 64):
    """Deep (cyclic-exact) validation of a stream.

    The deep engine is a driver LOOP over frontier DataFrames — a shape one
    streaming plan cannot express — so it runs per micro-batch inside
    ``foreachBatch`` (the standard escape hatch for multi-pass batch logic
    in a stream). The validator compiles ONCE here; each batch pays only
    its own data passes.

    ``sink(annotated_df, batch_id)`` receives (id, is_valid, violations)
    per micro-batch. Returns the DataStreamWriter (caller adds checkpoint
    options and calls .start())."""
    from ..deep import DeepValidator

    dv = DeepValidator(spark, schema, store, max_depth=max_depth)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        out = dv.validate(
            batch_df.withColumn("__v", F.parse_json(F.col(json_col))),
            "__v", id_col)
        sink(out.withColumnRenamed("doc_id", id_col), batch_id)

    return stream_df.writeStream.foreachBatch(process)
