"""Deterministic synthetic data: the interleaved text+media documents table.

Shape per BASELINE.json ``input_hint``:

    doc_id  string
    spans   array<struct<kind:string, text:string, media_ref:string, offset:int>>

plus the ``media`` referential-target catalog (FIXTURES.md §2).

Everything is generated *distributed and seed-deterministic*: every value is
a pure function of ``xxhash64(doc_index, salt, seed)``, so the same
(n_docs, seed, knobs) produce identical tables at any parallelism, any
partition count, and any scale — no driver-side materialization, no
``rand()`` (whose draw order depends on partitioning). Violation injections
happen at seeded rates so expected verdict counts are known a priori
(FIXTURES.md §6).

Injected violations (each gated by its own knob, disjoint doc ranges so
expected counts are exact):

- ``dup_rate``: duplicate ``doc_id`` (corpus-level uniqueness check)
- ``dangling_rate``: ``media_ref`` beyond the media catalog (referential)
- ``bad_kind_rate``: span kind ``'blob'`` ∉ enum
- ``neg_offset_rate``: first span offset −1 (minimum violation)
- ``long_text_rate``: text span longer than max_text_len (maxLength)
- ``skew``: fraction of media refs collapsed onto ONE hot key (salted-join
  test mode)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


@dataclass
class DocGenConfig:
    n_docs: int = 10_000
    seed: int = 42
    max_spans: int = 8          # spans per doc in [1, max_spans]
    n_media: int = 1_000        # media catalog size
    media_coverage: float = 0.9  # fraction of referenced keys present in catalog
    max_text_len: int = 200
    dup_rate: float = 0.0
    dangling_rate: float = 0.0
    bad_kind_rate: float = 0.0
    neg_offset_rate: float = 0.0
    long_text_rate: float = 0.0
    skew: float = 0.0           # fraction of media spans pointing at one hot key
    partitions: Optional[int] = None


_WORDS = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
          "tempor incididunt ut labore et dolore magna aliqua enim minim veniam").split()

KINDS = ["text", "image", "audio", "video"]


def _h(*cols) -> str:
    return f"xxhash64({', '.join(str(c) for c in cols)})"


def _u(expr: str, mod: int) -> str:
    """uniform integer in [0, mod) from a hash expression"""
    return f"pmod({expr}, {mod})"


def generate_documents(spark: SparkSession, cfg: DocGenConfig) -> DataFrame:
    """The documents table, distributed-deterministic."""
    parts = cfg.partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, cfg.n_docs, 1, parts).withColumnRenamed("id", "i")

    seed = cfg.seed
    n_spans = f"(1 + {_u(_h('i', 11, seed), cfg.max_spans)})"

    # violation windows: disjoint slices of the hash space so rates compose
    r = f"pmod({_h('i', 13, seed)}, 1000000)"
    dup_hi = int(cfg.dup_rate * 1_000_000)
    dangling_hi = dup_hi + int(cfg.dangling_rate * 1_000_000)
    badkind_hi = dangling_hi + int(cfg.bad_kind_rate * 1_000_000)
    negoff_hi = badkind_hi + int(cfg.neg_offset_rate * 1_000_000)
    longtext_hi = negoff_hi + int(cfg.long_text_rate * 1_000_000)

    is_dup = f"({r} < {dup_hi} AND i > 0)"
    is_dangling = f"({r} >= {dup_hi} AND {r} < {dangling_hi})"
    is_badkind = f"({r} >= {dangling_hi} AND {r} < {badkind_hi})"
    is_negoff = f"({r} >= {badkind_hi} AND {r} < {negoff_hi})"
    is_longtext = f"({r} >= {negoff_hi} AND {r} < {longtext_hi})"

    doc_id = (f"CASE WHEN {is_dup} THEN format_string('doc_%012d', i - 1) "
              f"ELSE format_string('doc_%012d', i) END")

    # per-span fields, all pure functions of (i, span index s)
    kind_pick = _u(_h("i", "s", 17, seed), 10)
    kind = (f"CASE WHEN {is_badkind} AND s = 0 THEN 'blob' "
            f"WHEN {kind_pick} < 7 THEN 'text' "
            f"WHEN {kind_pick} < 8 THEN 'image' "
            f"WHEN {kind_pick} < 9 THEN 'audio' ELSE 'video' END")

    words_sql = "array(" + ", ".join(f"'{w}'" for w in _WORDS) + ")"
    n_words = f"(1 + {_u(_h('i', 's', 19, seed), max(1, cfg.max_text_len // 8))})"
    base_text = (f"array_join(transform(sequence(1, {n_words}), "
                 f"w -> element_at({words_sql}, cast(1 + {_u(_h('i', 's', 'w', 23, seed), len(_WORDS))} as int))), ' ')")
    long_text = f"repeat('x', {cfg.max_text_len + 10})"
    text = (f"CASE WHEN ({kind}) <> 'text' THEN cast(null as string) "
            f"WHEN {is_longtext} AND s = 0 THEN {long_text} "
            f"ELSE substring({base_text}, 1, {cfg.max_text_len}) END")

    hot_key = 0
    media_idx = (f"CASE WHEN {is_dangling} AND s <= 1 THEN {cfg.n_media} + {_u(_h('i', 's', 29, seed), cfg.n_media)} "
                 + (f"WHEN {_u(_h('i', 's', 31, seed), 1000)} < {int(cfg.skew * 1000)} THEN {hot_key} "
                    if cfg.skew > 0 else "")
                 + f"ELSE {_u(_h('i', 's', 37, seed), cfg.n_media)} END")
    media_ref = (f"CASE WHEN ({kind}) = 'text' THEN cast(null as string) "
                 f"ELSE format_string('media_%08d', {media_idx}) END")

    # offsets: strictly increasing char positions; negative-offset injection
    offset = (f"CASE WHEN {is_negoff} AND s = 0 THEN -1 "
              f"ELSE cast(s * 101 + {_u(_h('i', 's', 41, seed), 100)} as int) END")

    spans = (f"transform(sequence(0, {n_spans} - 1), s -> named_struct("
             f"'kind', {kind}, 'text', {text}, 'media_ref', {media_ref}, "
             f"'offset', cast({offset} as int)))")

    return df.select(
        F.expr(doc_id).alias("doc_id"),
        F.expr(spans).alias("spans"),
    )


def generate_media(spark: SparkSession, cfg: DocGenConfig) -> DataFrame:
    """The media catalog: covers media_coverage of the non-dangling key
    space (keys hashing above the coverage cut are intentionally absent →
    known dangling-ref population even without dangling_rate)."""
    parts = cfg.partitions or spark.sparkContext.defaultParallelism
    df = spark.range(0, cfg.n_media, 1, parts).withColumnRenamed("id", "i")
    keep = f"pmod({_h('i', 43, cfg.seed)}, 1000) < {int(cfg.media_coverage * 1000)}"
    mime = ("element_at(array('image/png','image/jpeg','audio/wav','video/mp4'), "
            f"cast(1 + {_u(_h('i', 47, cfg.seed), 4)} as int))")
    size = f"(1024 + {_u(_h('i', 53, cfg.seed), 10_000_000)})"
    return (df.where(F.expr(keep))
            .select(
                F.expr("format_string('media_%08d', i)").alias("media_ref"),
                F.expr(mime).alias("mime"),
                F.expr(f"cast({size} as bigint)").alias("bytes"),
            ))


def documents_json_schema(cfg: DocGenConfig) -> dict:
    """The validation schema for the documents table — the engine's flagship
    input. Draft-4 keywords only, so the reference could validate the same
    documents row-by-row."""
    return {
        "$schema": "http://json-schema.org/draft-04/schema#",
        "title": "Interleaved document",
        "type": ["object"],
        "required": ["doc_id", "spans"],
        "properties": {
            "doc_id": {
                "type": ["string"],
                "pattern": "^doc_[0-9]{12}$",
            },
            "spans": {
                "type": ["array"],
                "minItems": 1,
                "items": {
                    "type": ["object"],
                    "required": ["kind", "offset"],
                    "properties": {
                        "kind": {
                            "type": ["string"],
                            "enum": ["text", "image", "audio", "video"],
                        },
                        "text": {
                            "type": ["string", "null"],
                            "minLength": 1,
                            "maxLength": cfg.max_text_len,
                        },
                        "media_ref": {
                            "type": ["string", "null"],
                            "pattern": "^media_[0-9]{8}$",
                        },
                        "offset": {
                            "type": ["integer"],
                            "minimum": 0,
                        },
                    },
                },
            },
        },
    }
