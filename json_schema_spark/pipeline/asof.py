"""As-of (most-recent-at-or-before) join — the time-series join Spark SQL
lacks as a primitive.

A naive formulation is a range join (``l.ts >= r.ts`` + per-left-row
max-aggregation): Catalyst plans it as a broadcast-nested-loop or a
cartesian range join — O(|L|·|R|) per key at worst, the classic scale
killer. This implementation uses the union + running-``last`` trick
instead:

1. tag left rows side=1, right rows side=0, union on the join keys;
2. one window over ``partitionBy(keys).orderBy(ts, side)`` carries the
   most recent right ROW forward (``last(..., ignorenulls=True)`` of ONE
   struct holding all right value columns, with an unbounded-preceding
   frame — rank-based running state, no fan-out);
3. keep the left rows and project the struct's fields.

The carry is row-level on purpose: a per-column ``last(ignorenulls)``
cannot tell a left-row filler NULL from a genuine NULL inside a right
row — it would reach past the matched row and resurrect an older value
(and with several value columns, mix values from different right rows).
Wrapping the whole right row in a struct makes the filler NULL the only
NULL the carry ever skips; a matched row's NULL fields stay NULL, exactly
matching DuckDB's ASOF LEFT JOIN (ADVICE r3, medium).

Cost: ONE shuffle on the join keys (the window sort), zero join fan-out —
the same shape as a sessionization window, so it scales to arbitrarily
dense right sides. Ties at equal ts sort right-before-left (side 0 < 1),
giving "at or before" semantics identical to DuckDB's
``ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts``, which the entry
oracle uses as an independent recomputation.

Right rows should be unique per (keys, ts) — pre-aggregate if not, as the
canonical ASOF semantics for intra-timestamp duplicates are
engine-specific.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame, functions as F, types as T


def asof_join(left: DataFrame, right: DataFrame,
              on: Union[str, Sequence[str]], ts: str = "ts",
              right_value_cols: Optional[List[str]] = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the right-side value columns from the most
    recent right row with the same key(s) and ``right.ts <= left.ts``
    (NULLs when no such row). Left columns pass through unchanged; right
    value columns are appended with ``suffix``."""
    keys = [on] if isinstance(on, str) else list(on)
    rvals = right_value_cols or [c for c in right.columns
                                 if c not in keys and c != ts]
    if not rvals:
        return left
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    rrow_type = T.StructType([T.StructField(c, rtypes[c]) for c in rvals])
    lrow_type = T.StructType(left.schema.fields)

    lpart = left.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    rpart = right.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        F.struct(*[F.col(c) for c in rvals]).alias("__rrow"),
    )
    from pyspark.sql import Window

    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = lpart.unionByName(rpart)
    carried = u.withColumn(
        "__vrow", F.last(F.col("__rrow"), ignorenulls=True).over(w))
    return (carried.where(F.col("__side") == 1)
            .select(F.col("__lrow.*"),
                    *[F.col(f"__vrow.{c}").alias(c + suffix) for c in rvals]))
