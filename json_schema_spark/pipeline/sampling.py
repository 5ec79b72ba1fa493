"""Deterministic sampling and dataset splitting.

Training pipelines need REPRODUCIBLE corpus splits: the same document must
land in the same split on every run, on any cluster size, after any
repartition — properties ``df.sample()``/``sampleBy()`` (seeded per
partition) do not have. Hash-based assignment gives them for free: bucket
= md5(seed, id) mod 10_000, split = cumulative-range lookup. md5 keeps it
engine-portable (the DuckDB oracle reproduces assignments bit-for-bit)
and row-local (no shuffle, pipelines inside the scan)."""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import md5_int

_BUCKETS = 10_000


def hash_bucket(id_col: Column, seed: int = 42,
                purpose: str = "split") -> Column:
    """Deterministic bucket in [0, 10000) from the md5 of
    (purpose, seed, id). ``purpose`` separates the hash DOMAINS of
    sampling and splitting: if both used the same buckets, composing
    ``hash_split(hash_sample(df, 0.1))`` would put every sampled row in
    'train' (sample keeps bucket < 1000, train is bucket < 9000) — val
    and test would contain ZERO sampled rows. Independent domains make
    the composition unbiased."""
    return F.pmod(
        md5_int(F.concat(F.lit(f"{purpose}_{seed}_"),
                         id_col.cast("string"))),
        F.lit(_BUCKETS))


def hash_sample(df: DataFrame, fraction: float, id_col: str = "doc_id",
                seed: int = 42) -> DataFrame:
    """Reproducible ~``fraction`` sample: keeps rows whose hash bucket
    falls below fraction·10000. Unlike df.sample(), membership is a pure
    function of the id — stable across runs, partitionings, and engines.
    Uses the 'sample' hash domain, independent of hash_split's buckets
    (see hash_bucket) so sample-then-split stays unbiased."""
    cut = int(round(fraction * _BUCKETS))
    return df.where(hash_bucket(F.col(id_col), seed, "sample") < cut)


def hash_split(df: DataFrame, splits: Optional[Dict[str, float]] = None,
               id_col: str = "doc_id", seed: int = 42,
               split_col: str = "split") -> DataFrame:
    """Append a deterministic split label ('train'/'val'/'test' by
    default). Split fractions must sum to 1; assignment is by cumulative
    bucket ranges in the given dict order."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bucket = hash_bucket(F.col(id_col), seed)
    expr = None
    cum = 0
    for name, frac in splits.items():
        cum += int(round(frac * _BUCKETS))
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # rounding can leave bucket 9999 past the last cumulative cut
    last = list(splits.keys())[-1]
    return df.withColumn(split_col, expr.otherwise(F.lit(last)))


def stratified_hash_sample(df: DataFrame, fractions: Dict[str, float],
                           strata_col: str, id_col: str = "doc_id",
                           seed: int = 42,
                           default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — domain mixing for training
    corpora (e.g. keep 100% of books, 30% of web, 5% of boilerplate).

    Same machinery as :func:`hash_sample` (md5 bucket of the id in the
    'sample' domain — independent of hash_split's buckets, so
    stratify-then-split stays unbiased; see hash_bucket) with the cut
    looked up per row from the stratum value, so membership stays a pure
    function of (id, stratum fraction): reproducible across runs,
    partitionings, and engines, and row-local (no shuffle, no sampleBy's
    per-partition RNG). Strata missing from ``fractions`` fall back to
    ``default_fraction`` (0.0 = drop — explicit allowlist semantics)."""
    for name, frac in list(fractions.items()) + [("default_fraction",
                                                  default_fraction)]:
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0,1]")
    cut = F.lit(int(round(default_fraction * _BUCKETS)))
    for name, frac in fractions.items():
        cut = F.when(F.col(strata_col) == name,
                     F.lit(int(round(frac * _BUCKETS)))).otherwise(cut)
    return df.where(hash_bucket(F.col(id_col), seed, "sample") < cut)


def domain_top_quality(df: DataFrame, budget: int,
                       score_col: str = "logit",
                       tokens_col: str = "n_tokens",
                       domain_col: str = "source",
                       id_col: str = "doc_id",
                       prefilter_shards: Optional[int] = None) -> DataFrame:
    """Per-domain budgeted best-first selection — the data-mixing step
    that picks each domain's highest-quality documents until a per-domain
    token budget is spent (e.g. 'up to 10B tokens per domain, best docs
    first'). A document is kept iff the running token total over
    strictly-better documents of its domain, including itself, fits the
    budget; ordering is (score DESC, id ASC) so ties are deterministic
    and the result is a pure function of the input on any engine.
    Adds ``cum_tokens`` (the inclusive running total) to the kept rows.

    Scale shape: one window per domain (single shuffle on the domain
    key). A hot domain serializes through one task — the same bound
    documented on pack_sequences/asof — so ``prefilter_shards=N`` adds a
    shard-local pre-prune: the same budgeted window inside
    (domain, md5-shard of id) first, then the exact global window over
    survivors. The prune is EXACT, never approximate: a shard sees a
    subset of its domain, so a doc's shard-local running total is ≤ its
    global running total — every globally-kept doc is shard-locally kept
    too, and the survivor set (≤ shards · budget/min_doc_tokens rows per
    domain) is a superset of the answer. The driver oracle compares this
    two-phase path against the plain single-window SQL, pinning the
    equivalence."""
    from pyspark.sql import Window

    from .dedup import md5_int

    if budget <= 0:
        raise ValueError("budget must be a positive token count")
    if "cum_tokens" in df.columns:
        raise ValueError(
            "domain_top_quality output column 'cum_tokens' already exists "
            "— rename or drop it first (silent overwrite would discard a "
            "previous selection's totals)")

    def budgeted(frame: DataFrame, extra_key) -> DataFrame:
        keys = [F.col(domain_col)] + ([extra_key] if extra_key is not None
                                      else [])
        w = (Window.partitionBy(*keys)
             .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        run = F.sum(F.col(tokens_col)).over(w)
        return (frame.withColumn("cum_tokens", run)
                .where(F.col("cum_tokens") <= F.lit(budget)))

    if prefilter_shards is not None:
        shard = F.pmod(md5_int(F.concat(F.lit("dtq_"),
                                        F.col(id_col).cast("string"))),
                       F.lit(int(prefilter_shards)))
        df = budgeted(df, shard).drop("cum_tokens")
    return budgeted(df, None)
