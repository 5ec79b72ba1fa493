"""Table IO: Iceberg-or-Parquet readers/writers (north_rule names
"Iceberg/Parquet tables of interleaved text+media documents").

Iceberg support is gated behind a runtime capability check — the sandbox
image carries no Iceberg jars, so everything falls back to plain parquet
paths with the same partitioning story:

- documents staged/partitioned by validation bucket → resume = partition
  pruning (manifest.ensure_bucketed_staging is the parquet stand-in for an
  Iceberg table with `bucket(n, doc_id)` partition transform);
- violations/verdicts appended per commit group (an Iceberg writer gets
  snapshot-atomic appends; the parquet fallback appends files and relies on
  _SUCCESS-per-commit semantics).

At cluster scale, pass ``spark.sql.catalog.<name>=org.apache.iceberg...``
configs and table identifiers like ``catalog.db.table``; everything here
routes through the same two functions.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when Iceberg classes are on the session's JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.catalog.Catalog")
        return True
    except Exception:
        return False


def _looks_like_table_ident(target: str) -> bool:
    """catalog.db.table identifiers vs filesystem paths."""
    return "/" not in target and not target.startswith(("s3:", "hdfs:", "file:"))


def read_table(spark: SparkSession, target: str, fmt: str = "auto") -> DataFrame:
    """Read a documents table. ``fmt``: 'auto' (iceberg when available and
    the target is a table identifier, else parquet), 'iceberg', 'parquet'."""
    if fmt == "iceberg" or (fmt == "auto" and _looks_like_table_ident(target)
                            and iceberg_available(spark)):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg requested but no Iceberg runtime on the classpath; "
                "add the iceberg-spark-runtime jar and a catalog config")
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, fmt: str = "auto",
                mode: str = "append",
                partition_by: Optional[list] = None) -> str:
    """Write violations/verdicts/staging output. Returns the format used.

    Iceberg writes are snapshot-atomic appends (``writeTo``); the parquet
    fallback is a plain path write with identical partition layout, so the
    partition-pruning story (bucket-partitioned resume, date-partitioned
    violation sinks) is the same either way.
    """
    spark = df.sparkSession
    use_iceberg = fmt == "iceberg" or (fmt == "auto"
                                       and _looks_like_table_ident(target)
                                       and iceberg_available(spark))
    if use_iceberg:
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg requested but no Iceberg runtime on the classpath")
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            try:
                writer.append()
            except Exception:
                writer.createOrReplace()
        else:
            writer.createOrReplace()
        return "iceberg"
    w = df.write.mode("overwrite" if mode == "overwrite" else "append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
    return "parquet"
