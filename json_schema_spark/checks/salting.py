"""Explicit skew handling: salted joins for hot keys.

The north_rule calls for partitioning/shuffle/skew handled explicitly. AQE's
skew-join splitting covers sort-merge joins at runtime; this module is the
*static* defense for the case AQE can't fix — a shuffled join whose build
side must replicate to meet the salted probe side.

Pattern (classic salt-and-replicate):

- probe side (big, skewed): add ``salt = pmod(xxhash64(row-entropy), S)``
- build side (small/medium): replicate every row S times with
  ``explode(sequence(0, S-1))``
- join on (key, salt): a key with 10^9 occurrences spreads over S reducer
  partitions instead of one.

Used by ``duplicate_key_rows_salted`` (violation-row extraction for
uniqueness over a hot duplicate key) and available for the media_ref join
when the catalog is too big to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salt_probe(df: DataFrame, salt_buckets: int, entropy_cols=None) -> DataFrame:
    """Add a deterministic salt column derived from row entropy (all columns
    by default) — no rand(): reproducible at any parallelism."""
    cols = entropy_cols or df.columns
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets)).cast("int"))


def replicate_build(df: DataFrame, salt_buckets: int) -> DataFrame:
    return (df.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
            .withColumn("__salt", F.col("__salt").cast("int")))


def salted_join(probe: DataFrame, build: DataFrame, on: list, how: str = "inner",
                salt_buckets: int = 16, probe_entropy=None) -> DataFrame:
    """Equi-join with the hot-key spread across ``salt_buckets`` reducers."""
    p = salt_probe(probe, salt_buckets, probe_entropy)
    b = replicate_build(build, salt_buckets)
    out = p.join(b, on + ["__salt"], how)
    return out.drop("__salt")


def duplicate_key_rows_salted(df: DataFrame, key: str,
                              salt_buckets: int = 16) -> DataFrame:
    """Violation rows for duplicated keys, skew-proof: the dup-key set is
    tiny (aggregated first), replicated ``salt_buckets`` times, and the big
    side salts on full-row entropy — a doc_id duplicated 10^9 times lands on
    ``salt_buckets`` reducers instead of one."""
    from .uniqueness import duplicate_keys

    dups = duplicate_keys(df, key).select(key)
    return salted_join(df, dups, [key], "left_semi", salt_buckets)
