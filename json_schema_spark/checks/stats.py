"""Column statistics: one-pass moments + HyperLogLog distinct sketches.

Corpus-level generalization of the reference's per-document counting
keywords (SURVEY.md §2.3 "aggregations"). Everything here is a single
aggregation pass: Catalyst's avg/stddev are already streaming (Welford-style
merge in ImperativeAggregate), approx_count_distinct is HLL++ with
partial+final merge, so the shuffle carries one sketch per column per map
partition — constant traffic regardless of row count. That is what survives
a 100 TB scan: no second pass, no wide shuffle.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, functions as F


def column_stats(df: DataFrame, cols: Optional[List[str]] = None,
                 rsd: float = 0.02) -> DataFrame:
    """One row per column: count / nulls / mean / stddev / min / max /
    approx_distinct. Numeric moments are null for non-numeric columns."""
    numeric_kinds = ("int", "bigint", "double", "float", "smallint", "tinyint", "decimal")
    out = []
    cols = cols or [f.name for f in df.schema.fields]
    aggs = []
    for c in cols:
        dt = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[c]
        is_num = any(dt.startswith(k) for k in numeric_kinds)
        # mean = exact decimal sum / count: parallel double summation is
        # order-dependent (CORRECTNESS_r01 lineitem_stats hash fail vs the
        # DuckDB oracle); decimal accumulation is exact at any parallelism,
        # and the one final division is deterministic IEEE
        exact_mean = (F.sum(F.col(c).cast("decimal(38,12)")).cast("double")
                      / F.count(F.col(c)))
        aggs.extend([
            F.count(F.lit(1)).alias(f"{c}__count"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            (exact_mean if is_num else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (F.stddev_pop(c) if is_num else F.lit(None).cast("double")).alias(f"{c}__stddev"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__distinct"),
        ])
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    data = [
        (c, row[f"{c}__count"], row[f"{c}__nulls"], row[f"{c}__mean"],
         row[f"{c}__stddev"], row[f"{c}__min"], row[f"{c}__max"],
         row[f"{c}__distinct"])
        for c in cols
    ]
    return spark.createDataFrame(
        data,
        "column string, count long, nulls long, mean double, stddev double, "
        "min string, max string, approx_distinct long",
    )


def column_stats_sql(table: str, col: str) -> str:
    """The equivalent ANSI-SQL for one numeric column (DuckDB oracle)."""
    return f"""
        SELECT count(*) AS count,
               sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS nulls,
               avg({col}) AS mean,
               min({col}) AS min_v,
               max({col}) AS max_v
        FROM {table}
    """


def per_partition_stats(df: DataFrame, col: str) -> DataFrame:
    """Moments per input partition (feeds the run manifest's sketch digests).
    Map-side only: one output row per partition."""
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.avg(col).alias("mean"),
            F.stddev_pop(col).alias("stddev"),
            F.min(col).alias("min"),
            F.max(col).alias("max"),
            F.approx_count_distinct(col).alias("approx_distinct"),
        )
    )
