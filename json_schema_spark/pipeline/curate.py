"""End-to-end corpus curation: the composition a training-data pipeline
actually runs, wired from the individually-oracled operators.

Stage order is chosen for 100-TB cost, cheapest-first so each stage
shrinks the next one's input:

1. row-local annotation + filters (token count, duplicate-n-gram
   fraction, language) — pure Catalyst inside the scan, no shuffle;
2. exact dedup — one hash-groupBy on the md5 fingerprint;
3. near-dup removal — n-gram Jaccard pairs (frequency-cut shingle join)
   → connected components → drop every non-representative (cluster_id is
   the component min id, so the kept doc is deterministic);
4. deterministic hash split (train/val/test) — row-local.

The whole chain is engine-portable arithmetic (md5, exact integer
counts, one double division per ratio), so the driver's DuckDB oracle
recomputes the ENTIRE pipeline independently — including the recursive
connected-components closure — and the result hash-matches.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from . import cache
from .dedup import dedup_exact, duplicate_clusters, jaccard_pairs
from .sampling import hash_split
from .text import lang_id, ngram_structs, tokens


def annotate_and_filter(df: DataFrame, *, min_tokens: int = 10,
                        max_dup_frac: float = 0.2,
                        langs: Sequence[str] = ("en", "de", "es", "fr"),
                        jaccard_n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Stage 1 of curation: row-local annotation (token count, duplicate
    n-gram fraction, language) + quality filters — pure Catalyst inside
    the scan, no shuffle. Factored out so the BATCH pipeline and the
    STREAMING per-micro-batch pass (streaming/curate_stream.py) filter
    with the identical expressions: stream and batch agree on "kept" by
    construction (same seam as dedup.minhash_bands)."""
    # n_grams needs NO gram array — it's max(n_tokens − (n−1), 0); the
    # distinct count runs over the codegen struct-gram build
    # (text.ngram_structs — struct distinctness == joined-string
    # distinctness), so no interpreted HOF lambda remains in the scan.
    nt = F.size(tokens(F.col(text_col)))
    ng = F.when(nt >= jaccard_n, nt - (jaccard_n - 1)).otherwise(F.lit(0))
    nd = F.when(
        nt >= jaccard_n,
        F.size(F.array_distinct(ngram_structs(F.col(text_col), jaccard_n)))
    ).otherwise(F.lit(0))
    ann = df.select(
        F.col(id_col), F.col(text_col),
        lang_id(F.col(text_col)).alias("lang"),
        nt.alias("n_tokens"), ng.alias("__ng"), nd.alias("__nd"),
    ).withColumn(
        "__dup_frac",
        F.when(F.col("__ng") > 0,
               (F.col("__ng") - F.col("__nd")).cast("double") / F.col("__ng"))
        .otherwise(F.lit(0.0)))
    return ann.where((F.col("n_tokens") >= min_tokens)
                     & (F.col("__dup_frac") <= max_dup_frac)
                     & F.col("lang").isin(list(langs)))


def curate_corpus(df: DataFrame, *, min_tokens: int = 10,
                  max_dup_frac: float = 0.2,
                  langs: Sequence[str] = ("en", "de", "es", "fr"),
                  jaccard_n: int = 3, jaccard_threshold: float = 0.5,
                  max_shingle_freq: Optional[int] = 1000,
                  splits: Optional[Dict[str, float]] = None, seed: int = 42,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang, n_tokens, dup_frac_r6, split) for every surviving
    document. Persisted intermediates (the filtered corpus + the shingle
    table inside jaccard_pairs) are registered on the result — release
    with ``cache.release`` after materializing.

    ``dup_frac`` here is the ROW-LOCAL duplicate-n-gram fraction
    (size − distinct size of the gram array — no shuffle); the
    shuffle-bearing top-gram share lives in ``text.ngram_repetition`` for
    when the extra signal is worth the pass."""
    # row-local filters first: everything downstream (fingerprint groupBy,
    # shingle join, clustering) runs on the shrunk corpus. Persisted: the
    # filtered table feeds exact dedup, the pair join, AND the final
    # projection — three consumers of one expensive annotate+filter pass.
    kept = annotate_and_filter(df, min_tokens=min_tokens,
                               max_dup_frac=max_dup_frac, langs=langs,
                               jaccard_n=jaccard_n, text_col=text_col,
                               id_col=id_col).persist()
    # deduped feeds three consumers (the pair join's shingle pass, the
    # survivors anti-join, the final projection): persist so the
    # fingerprint groupBy runs once
    deduped = dedup_exact(kept, text_col, id_col).persist()
    pairs = jaccard_pairs(deduped, jaccard_n, jaccard_threshold,
                          text_col, id_col, max_shingle_freq)
    clusters = duplicate_clusters(pairs, "id_a", "id_b")
    non_reps = (clusters.where(F.col("doc_id") != F.col("cluster_id"))
                .select(F.col("doc_id").alias(id_col)))
    survivors = deduped.join(non_reps, id_col, "left_anti")
    out = (hash_split(survivors, splits, id_col, seed)
           .select(F.col(id_col), "lang", "n_tokens",
                   F.round("__dup_frac", 6).alias("dup_frac_r6"), "split"))
    return cache.register(out, kept, deduped, *cache.deps_of(pairs))
