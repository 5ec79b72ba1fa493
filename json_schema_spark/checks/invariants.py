"""Per-row invariants.

``input_hint`` mandates span-sequence equality — (kind, text, media_ref,
order) — between engine input and output on every surviving row: validation
must never mutate, reorder or drop spans. The check canonicalizes each row's
span sequence to JSON and anti-joins both directions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(df: DataFrame, id_col: str, spans_col: str) -> DataFrame:
    seq = F.to_json(F.transform(
        F.col(spans_col),
        lambda s: F.struct(
            s.getField("kind").alias("kind"),
            s.getField("text").alias("text"),
            s.getField("media_ref").alias("media_ref"),
        ),
    ))
    return df.select(F.col(id_col).alias("id"), seq.alias("seq"))


def span_sequence_mismatches(before: DataFrame, after: DataFrame,
                             id_col: str = "doc_id",
                             spans_col: str = "spans") -> int:
    """Number of rows whose (id, span-sequence) pair does not survive
    exactly. 0 ⇔ the invariant holds."""
    b = _canon(before, id_col, spans_col)
    a = _canon(after, id_col, spans_col)
    missing = b.join(a, ["id", "seq"], "left_anti").count()
    extra = a.join(b, ["id", "seq"], "left_anti").count()
    return missing + extra
