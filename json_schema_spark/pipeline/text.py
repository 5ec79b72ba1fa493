"""Text analysis operators for training-data pipelines: token counting,
quality scoring, n-gram language ID, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate/md5) — these run
inside whole-stage codegen over 100 TB of text without touching Python.
Formulas are deliberately expressible in portable SQL so the DuckDB oracle
can replicate them exactly (integer counts and exact rational ratios; no
engine-specific hashing).
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame, functions as F

# tiny characteristic-word profiles for the n-gram/stopword language-ID
# heuristic (public-knowledge stopword lists, truncated)
LANG_PROFILES: Dict[str, List[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def avg_token_length(col: Column) -> Column:
    """Exact rational (sum of lengths / count) — deterministic across engines."""
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"),
                        lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks).cast("double")


def stopword_ratio(col: Column, stopwords: List[str] = None) -> Column:
    toks = tokens(col)
    sw = stopwords or STOPWORDS
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(sw)))
    return n_stop.cast("double") / F.size(toks).cast("double")


def punct_ratio(col: Column) -> Column:
    no_punct = F.regexp_replace(col, r"[^\w\s]", "")
    return (F.length(col) - F.length(no_punct)).cast("double") / F.length(col).cast("double")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features (length/punct/stopword ratios)."""
    c = F.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(c),
        "avg_token_len": avg_token_length(c),
        "stopword_ratio": stopword_ratio(c),
        "punct_ratio": punct_ratio(c),
    })


def lang_scores(col: Column) -> Dict[str, Column]:
    """Characteristic-word hit ratio per language."""
    toks = tokens(col)
    out = {}
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(words)))
        out[lang] = hits.cast("double") / F.size(toks).cast("double")
    return out


def lang_id(col: Column) -> Column:
    """Argmax language by profile score; 'und' when no profile hits.
    Deterministic tie-break: higher score wins, then lexicographic lang."""
    scores = lang_scores(col)
    pairs = F.array(*[
        F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(scores)
    ])
    best = F.array_max(F.filter(pairs, lambda p: p.getField("score") > 0))
    return F.coalesce(best.getField("lang"), F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    (md5 is identical across engines — usable as a portable dedup key.)"""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(normalized)
