"""As-of (most-recent-at-or-before) join — the time-series join Spark SQL
lacks as a primitive.

A naive formulation is a range join (``l.ts >= r.ts`` + per-left-row
max-aggregation): Catalyst plans it as a broadcast-nested-loop or a
cartesian range join — O(|L|·|R|) per key at worst, the classic scale
killer. This implementation uses the union + running-``last`` trick
instead:

1. tag left rows side=1, right rows side=0, union on the join keys;
2. one window over ``partitionBy(keys).orderBy(ts, side)`` carries the
   most recent right-side values forward (``last(..., ignorenulls=True)``
   with an unbounded-preceding frame — rank-based running state, no
   fan-out);
3. keep the left rows.

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
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    lrow_type = T.StructType(left.schema.fields)

    lpart = left.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in rvals],
    )
    rpart = right.select(
        *[F.col(k) for k in keys],
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lrow_type).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    from pyspark.sql import Window

    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = lpart.unionByName(rpart)
    carried = u.withColumns({
        f"__v_{c}": F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        for c in rvals
    })
    return (carried.where(F.col("__side") == 1)
            .select(F.col("__lrow.*"),
                    *[F.col(f"__v_{c}").alias(c + suffix) for c in rvals]))
