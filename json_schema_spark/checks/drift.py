"""Distribution drift: KS statistic and PSI between two corpora (epochs,
partitions, or any two DataFrames of the same column).

Per north_rule/north_star: drift runs over *sketched per-partition
histograms merged centrally* — each side is one aggregation pass producing a
fixed-size histogram (map-side partial merge), the driver compares two small
arrays. No row ever crosses the wire.

- Histograms: fixed equi-width bins over the reference side's [min, max]
  (one extra underflow/overflow bin each side) via ``width_bucket``.
- KS: max |CDF_a - CDF_b| over the shared bin grid (exact as bins → ∞; with
  256 bins the error is bounded by the largest single-bin mass).
- PSI: Σ (p_i − q_i) · ln(p_i / q_i) with ε-clipping for empty bins.
"""

from __future__ import annotations

import math
from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F

EPS = 1e-6


def bucket_expr(v: F.Column, lo: float, hi: float, bins: int) -> F.Column:
    """Equi-width bucket 0..bins+1 via the explicit floor formula (the exact
    double-op sequence is reproducible in any engine, unlike width_bucket
    whose edge rounding is engine-specific): underflow → 0, overflow/at-hi
    → bins+1, else floor(((v - lo) / (hi - lo)) * bins) + 1."""
    return (
        F.when(v < lo, F.lit(0))
        .when(v >= hi, F.lit(bins + 1))
        .otherwise(F.floor(((v - F.lit(lo)) / F.lit(hi - lo)) * bins).cast("int") + 1)
    )


def _histogram(df: DataFrame, col: str, lo: float, hi: float, bins: int) -> List[int]:
    """Counts per bucket 0..bins+1 (0 = underflow, bins+1 = overflow).
    One groupBy over ≤ bins+2 keys — partial agg makes this a constant-size
    shuffle."""
    bucket = bucket_expr(F.col(col).cast("double"), lo, hi, bins)
    rows = (
        df.where(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counts = [0] * (bins + 2)
    for r in rows:
        counts[int(r["bucket"])] += int(r["n"])
    return counts


def _bounds(df: DataFrame, col: str) -> Tuple[float, float]:
    row = df.agg(F.min(F.col(col).cast("double")).alias("lo"),
                 F.max(F.col(col).cast("double")).alias("hi")).collect()[0]
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return 0.0, 1.0
    if lo == hi:
        hi = lo + 1.0
    return float(lo), float(hi)


def drift_report(reference: DataFrame, current: DataFrame, col: str,
                 bins: int = 256) -> dict:
    """KS + PSI of ``col`` between a reference corpus and a current one."""
    lo, hi = _bounds(reference, col)
    h_ref = _histogram(reference, col, lo, hi, bins)
    h_cur = _histogram(current, col, lo, hi, bins)
    n_ref = sum(h_ref) or 1
    n_cur = sum(h_cur) or 1

    # CDFs accumulate as exact integer counts (one double division per
    # bucket) — no float-summation-order sensitivity, so the KS statistic is
    # bit-reproducible in any engine (the DuckDB oracle recomputes it)
    ks = 0.0
    cum_r = cum_c = 0
    psi = 0.0
    for i in range(len(h_ref)):
        p = h_ref[i] / n_ref
        q = h_cur[i] / n_cur
        cum_r += h_ref[i]
        cum_c += h_cur[i]
        ks = max(ks, abs(cum_r / n_ref - cum_c / n_cur))
        p_c, q_c = max(p, EPS), max(q, EPS)
        psi += (p_c - q_c) * math.log(p_c / q_c)

    return {
        "column": col,
        "bins": bins,
        "lo": lo,
        "hi": hi,
        "n_reference": n_ref,
        "n_current": n_cur,
        "ks_statistic": ks,
        "psi": psi,
    }


def ks_critical_value(n_ref: int, n_cur: int, alpha: float = 0.05) -> float:
    """Two-sample KS critical value (asymptotic)."""
    c = math.sqrt(-0.5 * math.log(alpha / 2.0))
    return c * math.sqrt((n_ref + n_cur) / (n_ref * n_cur))


# --- TDigest path (north_star: per-partition sketches + treeAggregate) -------


def column_tdigest(df: DataFrame, col: str, compression: int = 100,
                   deterministic: bool = True,
                   num_sketch_partitions: int = 32) -> "TDigest":
    """One t-digest for ``col``: per-partition digests built inside
    ``mapInPandas`` (Arrow batches — no per-row Python), merged centrally.

    ``deterministic=True`` (default) makes the sketch a pure function of
    the VALUE MULTISET — invariant to input file layout, parallelism, task
    completion order, and Arrow batch segmentation (round-2 VERDICT #10):

    - values hash-repartition into a FIXED ``num_sketch_partitions`` bucket
      layout and sort within each bucket (ties are interchangeable — equal
      values produce identical buffer entries), so every bucket digests an
      identical value sequence on any cluster;
    - bucket digests merge driver-side in bucket order — a fixed fold
      schedule over O(num_sketch_partitions · compression) floats.

    The price is one shuffle of the value column. ``deterministic=False``
    keeps the shuffle-free original: one digest per INPUT partition merged
    with RDD ``treeAggregate`` (hierarchical, constant driver memory at any
    partition count) — preferable at extreme scale when bit-stability
    across runs is not required (results differ only within sketch error).
    """
    from .tdigest import TDigest

    src = df.select(F.col(col).cast("double").alias("v")) \
            .where(F.col("v").isNotNull())
    if deterministic:
        src = (src.repartition(num_sketch_partitions, F.col("v"))
               .withColumn("pid", F.spark_partition_id())
               .sortWithinPartitions("v"))

    def sketch(batches):
        import pandas as pd

        d = TDigest(compression)
        pid = None
        for pdf in batches:
            if pid is None and "pid" in pdf.columns and len(pdf):
                pid = int(pdf["pid"].iloc[0])
            d.add_many(pdf["v"].to_numpy())
        if d.count == 0:
            return  # empty partition contributes nothing
        row = d.to_row()
        row["pid"] = -1 if pid is None else pid
        yield pd.DataFrame({k: [row[k]] for k in
                            ("pid", "means", "weights", "count", "min", "max")})

    digest_rows = src.mapInPandas(
        sketch,
        "pid int, means array<double>, weights array<double>, count double, "
        "min double, max double",
    )

    if deterministic:
        # collect order is nondeterministic; sort by bucket id so the fold
        # schedule is fixed. O(num_sketch_partitions) rows.
        partials = [(row["pid"], TDigest.from_row(
            row["means"], row["weights"], row["count"], row["min"],
            row["max"], compression)) for row in digest_rows.collect()]
        acc = TDigest(compression)
        for _, d in sorted(partials, key=lambda t: t[0]):
            acc.merge(d)
        return acc

    def seq(acc: "TDigest", row) -> "TDigest":
        return acc.merge(TDigest.from_row(row["means"], row["weights"],
                                          row["count"], row["min"],
                                          row["max"], compression))

    # O(partitions) rows of O(compression) floats: treeAggregate merges them
    # hierarchically (depth 2 handles tens of thousands of partitions)
    return digest_rows.rdd.treeAggregate(
        TDigest(compression), seq, lambda a, b: a.merge(b), depth=2)


def drift_report_tdigest(reference: DataFrame, current: DataFrame, col: str,
                         compression: int = 100, psi_buckets: int = 10,
                         deterministic: bool = True) -> dict:
    """KS + PSI of ``col`` via t-digest sketches — adaptive resolution for
    long-tailed columns where equi-width buckets (drift_report) waste bins.
    With ``deterministic`` (default) the report is bit-reproducible across
    runs, parallelism levels, and input layouts (see column_tdigest);
    accuracy is cross-checked against the exact histogram path in tests."""
    from .tdigest import ks_statistic, psi

    d_ref = column_tdigest(reference, col, compression,
                           deterministic=deterministic)
    d_cur = column_tdigest(current, col, compression,
                           deterministic=deterministic)
    return {
        "column": col,
        "compression": compression,
        "n_reference": int(d_ref.count),
        "n_current": int(d_cur.count),
        "ks_statistic": ks_statistic(d_ref, d_cur),
        "psi": psi(d_ref, d_cur, psi_buckets),
        "quantiles_reference": {q: d_ref.quantile(q)
                                for q in (0.01, 0.25, 0.5, 0.75, 0.99)},
        "quantiles_current": {q: d_cur.quantile(q)
                              for q in (0.01, 0.25, 0.5, 0.75, 0.99)},
    }
