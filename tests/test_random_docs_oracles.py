"""Run the driver-contract oracles on a RANDOMIZED documents table.

The driver's correctness gate compares each entry query against its
DuckDB oracle on the fixed sf0.01 corpus — one instance. This harness
regenerates `documents` with a seeded random generator (variable lengths
1..60 tokens including sub-shingle shorties, stopword-rich and
stopword-free docs, punctuation, multi-space runs, planted duplicates)
and replays query-vs-oracle on it: the SAME contract, hundreds of new
shapes, catching parity bugs the one corpus can't (short-doc guards,
division edges, tie-breaks).

Only queries whose inputs are wholly derived from `documents` run here.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from tests.test_entry_oracle import canon, duck_rows, spark_rows

SEED = 77_001

DOC_QUERIES = [
    "token_counts", "bpe_token_counts", "quality_scores", "lang_id",
    "lang_distribution", "doc_fingerprints", "ngram_repetition",
    "doc_chunks", "jaccard_pairs", "minhash_signatures",
    "minhash_lsh_candidates", "simhash", "exact_dup_clusters",
    "duplicate_clusters", "contamination", "stratified_sample",
    "packed_sequences", "curated_corpus", "pii_redaction",
    "token_heavy_hitters", "winnow_fingerprints",
    # round-5 ops (documents-derived). temperature_mix is EXCLUDED: its
    # oracle re-tiers via CAST(substr(source, 4) AS INT), which DuckDB
    # hard-errors on for this corpus's non-srcN sources (Spark yields
    # NULL) — the query contract assumes the sf tables' source domain.
    "dedup_lines", "dedup_lines_keep_first",
    "substring_dedup", "substring_dedup_keep_first",
    "gopher_rules", "classifier_scores", "domain_budget_sample",
    "dsir_weights", "dsir_sample", "dedup_against", "dedup_against_bloom",
    "split_leakage", "token_stats",
]

_VOCAB = ("table scan filter join agg window sort hash batch vector row "
          "column key value query part stream group order data small big "
          "fast slow line customer spark merge the a of and to der die und "
          "el la de le et des in is alpha beta gamma delta").split()
_PUNCT = ["", ",", ".", "!", "?:"]


def _random_docs(rng, n=150):
    rows = []
    for i in range(n):
        ln = rng.choice([1, 2, 2, 3, 5] + list(range(8, 61, 4)))
        words = [rng.choice(_VOCAB) + (rng.choice(_PUNCT)
                                       if rng.random() < 0.15 else "")
                 for _ in range(ln)]
        sep = "  " if rng.random() < 0.1 else " "
        text = sep.join(words)
        if rng.random() < 0.05:
            text = " " + text + "  "
        rows.append((i, text, rng.choice(["en", "de", "es", "fr", "zh"]),
                     rng.choice(["web", "books", "code"]), len(text)))
    # planted duplicates: clusters for the dedup/cluster queries
    for j in range(12):
        src = rows[j]
        rows.append((1000 + j, src[1], src[2], src[3], src[4]))
    return rows


@pytest.fixture(scope="module")
def random_sf_dir(spark, tmp_path_factory):
    rng = random.Random(SEED)
    rows = _random_docs(rng)
    d = tmp_path_factory.mktemp("random_sf")
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint") \
        .repartition(4).write.parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def random_duck(random_sf_dir):
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part-file glob
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{random_sf_dir}/documents.parquet/*.parquet')")
    return con


@pytest.mark.parametrize("name", DOC_QUERIES)
def test_oracle_holds_on_random_corpus(spark, random_sf_dir, random_duck,
                                       name):
    df = entry_mod.queries()[name](spark, random_sf_dir)
    expected, oracle_cols = duck_rows(random_duck,
                                      entry_mod.oracle_sql()[name])
    assert sorted(df.columns) == oracle_cols
    actual = spark_rows(df)
    assert len(actual) == len(expected), \
        f"{name}: rows {len(actual)} != {len(expected)}"
    mism = [i for i, (a, e) in enumerate(zip(actual, expected)) if a != e]
    assert not mism, (f"{name}: {len(mism)} mismatched rows; "
                      f"first: {actual[mism[0]]} != {expected[mism[0]]}")
