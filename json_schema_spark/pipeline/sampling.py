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


def _dsir_features(df: DataFrame, n_buckets: int, text_col: str,
                   id_col: str) -> DataFrame:
    """(id, bucket): hashed unigram + bigram feature occurrences (with
    multiplicity) per document. md5-derived buckets with per-order domain
    tags keep the hash engine-portable and unigrams independent of
    bigrams.

    r6 shape: ONE scan, zero interpreted lambdas. Each token is zipped
    with its successor (arrays_zip over a shifted slice — codegen),
    exploded, and the md5 bucket arithmetic runs as ordinary codegen
    expressions over the exploded rows; a second explode emits the
    unigram bucket plus (when a successor exists) the bigram bucket.
    The md5-inside-``transform`` build this replaces ran interpreted
    (HOFs never codegen) at 11x the cost — measured 6.3 s -> 0.6 s for
    536 k features at sf0.1. Bucket values are bit-identical: same
    domain-tagged strings, same md5/conv/pmod chain."""
    from .dedup import md5_int
    from .text import tokens as _tokens

    toks = _tokens(F.col(text_col))
    B = F.lit(n_buckets)
    nxt = F.concat(F.slice(toks, 2, F.size(toks) - 1),
                   F.array(F.lit(None).cast("string")))
    pairs = df.select(
        F.col(id_col),
        F.explode(F.arrays_zip(toks.alias("t"), nxt.alias("nx"))).alias("z"))
    uni_b = F.pmod(md5_int(F.concat(F.lit("dsir_u_"), F.col("z.t"))), B)
    bi_b = F.when(
        F.col("z.nx").isNotNull(),
        F.pmod(md5_int(F.concat(F.lit("dsir_b_"), F.col("z.t"), F.lit(" "),
                                F.col("z.nx"))), B))
    return pairs.select(
        F.col(id_col),
        F.explode(F.array_compact(F.array(uni_b, bi_b))).alias("bucket"))


def dsir_weights(df: DataFrame, target: DataFrame, n_buckets: int = 65536,
                 alpha: float = 1.0, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_feats, logw): DSIR importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling") — the
    log-likelihood ratio of each raw document under hashed-n-gram bag
    models of the TARGET distribution vs the RAW corpus distribution.
    Select by ``logw`` (top-k, or Gumbel-top-k resampling on
    ``logw + gumbel_noise``) to tilt a web-scale corpus toward a target
    domain without training a classifier.

    Model: unigram+bigram features hashed into ``n_buckets`` buckets;
    add-``alpha`` smoothed per-feature log-ratios
    ``lam_f = ln((ct_f+α)/(Dt+αB)) − ln((cr_f+α)/(Dr+αB))``;
    ``logw(doc) = Σ_f count_f(doc) · lam_f``.

    Determinism across engines (the oracle hash-matches bit-for-bit):
    ``lam_f`` is computed with glibc ``math.log`` — bit-identical to
    DuckDB ``ln`` (numpy's SIMD log is NOT) — and quantized to integer
    micro-nats (×1e9, round half away from zero), so the per-document
    aggregation is an EXACT integer sum: no float-summation-order
    dependence under any partitioning. The one float division back to
    nats happens once per output row.

    Scale shape: feature build is row-local in the scan; per-doc counts
    are one map-side-combined shuffle; corpus/target feature tables are
    bounded by ``n_buckets`` (the hashing trick's point), so the lambda
    table BROADCASTS to the scoring join — no shuffle touches the corpus
    a second time; the totals pass is two O(n_buckets) aggregates. The
    target side is a domain sample — typically tiny; at 100 TB only the
    raw-corpus count/score passes see the full data, each once."""
    import math

    import pandas as pd  # noqa: F401  (pandas_udf runtime dep)

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    docfeat = (_dsir_features(df, n_buckets, text_col, id_col)
               .groupBy(id_col, "bucket")
               .agg(F.count(F.lit(1)).alias("c"))
               .persist())
    cr = docfeat.groupBy("bucket").agg(F.sum("c").alias("cr"))
    # ct feeds both the totals pass and the lambda join — persist so the
    # target feature build runs once (registered on the result for release)
    ct = (_dsir_features(target, n_buckets, text_col, id_col)
          .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
          .persist())
    # ONE eager totals job instead of two sequential ones: the union's
    # branches materialize the two persisted feature tables CONCURRENTLY
    # inside the same job (Spark schedules independent stages of one job
    # in parallel — guide §2.6's overlap, without driver threads), halving
    # the fixed job round-trips this op pays before the lambda table can
    # be built. Totals are exact integer sums either way.
    totals = dict(
        docfeat.groupBy(F.lit("r").alias("side"))
        .agg(F.sum("c").alias("t"))
        .unionByName(ct.groupBy(F.lit("t").alias("side"))
                     .agg(F.sum("ct").alias("t")))
        .collect())
    d_raw = int(totals.get("r") or 0)
    d_tgt = int(totals.get("t") or 0)

    a, B = float(alpha), n_buckets
    log_tgt_denom = math.log(d_tgt + a * B)
    log_raw_denom = math.log(d_raw + a * B)

    from .dedup import round_half_away

    @F.pandas_udf("bigint")
    def lam_micro(ct_s, cr_s):
        return pd.Series([round_half_away(
            ((math.log(c_t + a) - log_tgt_denom)
             - (math.log(c_r + a) - log_raw_denom)) * 1e9)
            for c_t, c_r in zip(ct_s.tolist(), cr_s.tolist())])

    lam = (cr.join(ct, "bucket", "left")
           .select("bucket",
                   lam_micro(F.coalesce(F.col("ct"), F.lit(0)),
                             F.col("cr")).alias("lam")))
    out = (docfeat.join(F.broadcast(lam), "bucket")
           .groupBy(id_col)
           .agg(F.sum("c").alias("n_feats"),
                (F.sum(F.col("c") * F.col("lam")).cast("double")
                 / F.lit(1e9)).alias("logw")))
    from . import cache
    return cache.register(out, docfeat, ct)


def importance_sample(df: DataFrame, n: int, logw_col: str = "logw",
                      id_col: str = "doc_id", seed: int = 17) -> DataFrame:
    """Gumbel-top-k importance resampling — the selection half of DSIR
    (Xie et al. 2023): draw ``n`` rows WITHOUT replacement with
    probability proportional to ``exp(logw)`` by ranking on
    ``sample_key = logw + Gumbel(0,1)`` and keeping the top n (the
    Gumbel-max trick; feed it ``dsir_weights`` output). All input columns
    survive, plus ``sample_key``.

    Determinism across engines (the oracle hash-matches): the uniform is
    md5-derived — u = (h52 + 0.5) / 2^52 with h52 the md5-prefix integer
    reduced mod 2^52, so every float is EXACTLY representable and both
    engines compute bit-identical u from the same id; the Gumbel
    transform −ln(−ln(u)) uses scalar glibc ``math.log`` (bit-identical
    to DuckDB ``ln``; numpy's SIMD log is NOT) with the same expression
    shape; the single ``logw + g`` addition is IEEE-exact on equal
    operands. The hash domain is prefixed ``gumbel|seed|`` — independent
    of the split/sample/shard domains, so composing with ``hash_split``
    stays unbiased.

    Scale shape: the key is row-local (no shuffle before ranking) and the
    top-n runs as TakeOrdered — per-partition heaps of n, one O(n)
    driver merge, never a global sort. Driver memory bounds n (fine for
    the select-a-corpus-slice sizes DSIR targets); for n beyond driver
    memory, rank with a window over md5 shards instead."""
    if n < 1:
        raise ValueError("n must be >= 1")
    import math

    import pandas as pd  # noqa: F401

    h52 = F.pmod(
        md5_int(F.concat(F.lit(f"gumbel|{seed}|"), F.col(id_col)
                         .cast("string"))),
        F.lit(1 << 52))
    u = (h52.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))

    @F.pandas_udf("double")
    def gumbel(u_s):
        # scalar math.log per row: glibc log == DuckDB ln bit-for-bit;
        # np.log's SIMD path diverges in the last ulp on ~19% of inputs
        return pd.Series([-math.log(-math.log(v)) for v in u_s.tolist()])

    return (df.withColumn("sample_key", F.col(logw_col) + gumbel(u))
            .orderBy(F.col("sample_key").desc())
            .limit(n))


def split_leakage(df: DataFrame, splits: Optional[Dict[str, float]] = None,
                  text_col: str = "text", id_col: str = "doc_id",
                  seed: int = 42) -> DataFrame:
    """Exact-duplicate leakage across a ``hash_split``: one row per
    normalized fingerprint that lands in 'train' AND in at least one
    holdout split — (fingerprint, per-split counts, the smallest leaking
    holdout doc id as an exemplar). Empty result == the split is clean.

    This is the QA closure of the curation chain: exact dedup keeps one
    doc per fingerprint, the split then separates fingerprints — but a
    pipeline that splits WITHOUT deduplicating first (or dedups by a
    different key) silently evaluates on training data. Run this after
    any re-keying of the dedup or split stages.

    Scale shape: fingerprint + split label are both row-local in the scan
    (md5 expressions — no join against the split assignment); ONE
    map-side-combined groupBy on the fingerprint (uniform 32-byte md5
    key, skew-free) carries conditional counters per split; the leak
    filter is on the aggregated row. Nothing else touches the corpus."""
    from .text import fingerprint

    split_names = list((splits or {"train": 0.9, "val": 0.05,
                                   "test": 0.05}).keys())
    labeled = hash_split(df, splits, id_col=id_col, seed=seed)
    holdout = F.col("split") != split_names[0]
    agg = (labeled
           .select(fingerprint(F.col(text_col)).alias("fingerprint"),
                   F.col("split"), F.col(id_col))
           .where(F.col("fingerprint").isNotNull())
           .groupBy("fingerprint")
           .agg(*[F.sum(F.when(F.col("split") == s, 1).otherwise(0))
                  .alias(f"n_{s}") for s in split_names],
                F.min(F.when(holdout, F.col(id_col)))
                .alias("leaked_doc_id")))
    train_n = F.col(f"n_{split_names[0]}")
    holdout_n = sum((F.col(f"n_{s}") for s in split_names[1:]),
                    F.lit(0))
    return agg.where((train_n > 0) & (holdout_n > 0))


def temperature_mix(df: DataFrame, budget_docs: int, tau: float = 0.7,
                    source_col: str = "source", id_col: str = "doc_id",
                    seed: int = 42) -> DataFrame:
    """Temperature-scaled multi-source mixing (the T5/XLM sampling rule):
    sample ~``budget_docs`` rows so source s's share is proportional to
    ``n_s^tau`` — tau=1 keeps natural proportions, tau=0 equalizes
    sources, the usual 0.3–0.7 range up-samples small sources without
    drowning big ones. Per-source targets are capped at ``n_s`` (no
    replacement; the shortfall is NOT redistributed — stated contract).
    Rows with NULL source are dropped.

    Determinism across engines: the only float is one glibc ``pow`` per
    source (DuckDB pow is bit-identical — verified 0/3000 mismatches),
    quantized to integer milli-units; everything after — share, target,
    bucket cut — is integer arithmetic with explicit floor division, and
    row selection is the md5 bucket cut (domain-tagged ``mix``,
    independent of split/sample/shard domains).

    Scale shape: ONE eager O(#sources) count aggregate at plan build
    (collected — source vocabularies are bounded); cuts come back as a
    BROADCAST join (never a shuffle of the corpus); the bucket test is
    row-local in the scan. Selected counts are bucket-quantized (~1/10000
    granularity), the standard hash-sampling tradeoff for exact
    reproducibility at any parallelism."""
    import math

    if budget_docs < 1:
        raise ValueError("budget_docs must be >= 1")
    if tau < 0.0:
        raise ValueError("tau must be >= 0")
    counts = (df.where(F.col(source_col).isNotNull())
              .groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
              .collect())
    if not counts:
        return df.where(F.lit(False))
    tq = {r[source_col]: int(math.floor(float(r["n"]) ** tau * 1000 + 0.5))
          for r in counts}
    ns = {r[source_col]: r["n"] for r in counts}
    total = sum(tq.values())
    if budget_docs * max(tq.values()) >= (1 << 62):
        raise ValueError("budget * source-score overflows int64 — "
                         "rescale tau or budget")
    cuts = []
    for s in sorted(tq):
        target = min(ns[s], (budget_docs * tq[s] + total // 2) // total)
        cuts.append((s, (target * _BUCKETS + ns[s] // 2) // ns[s]))
    cuts_df = df.sparkSession.createDataFrame(
        cuts, f"{source_col} string, __mixcut long")
    bucket = hash_bucket(F.col(id_col), seed, purpose="mix")
    return (df.join(F.broadcast(cuts_df), source_col)
            .where(bucket < F.col("__mixcut"))
            .drop("__mixcut"))
