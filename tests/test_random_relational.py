"""Randomized cross-checks for the relational pipeline ops, mirroring
test_random_crosscheck's strategy for the validator: a seeded random
input (deterministic per run) is evaluated by BOTH the Spark operator and
an independent DuckDB recomputation — coverage far beyond the single
fixed corpus the driver oracle pins, same reproducibility.

Oracle parity notes baked into the generators: right-side (key, ts)
uniqueness for the as-of join (intra-timestamp duplicate semantics are
engine-specific — both engines get pre-aggregated rows), and planted
NULL values to exercise the row-level carry.
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from json_schema_spark.pipeline import dedup
from json_schema_spark.pipeline.asof import asof_join

SEED = 20260817


def test_random_asof_matches_duckdb(spark):
    rng = random.Random(SEED)
    base = datetime.datetime(2026, 1, 1)
    users = [f"u{i}" for i in range(15)]

    lrows, seen = [], set()
    for eid in range(400):
        lrows.append((eid, rng.choice(users),
                      base + datetime.timedelta(seconds=rng.randrange(50_000))))
    rrows = []
    for _ in range(600):
        key = (rng.choice(users),
               base + datetime.timedelta(seconds=rng.randrange(50_000)))
        if key in seen:        # enforce (key, ts) uniqueness on the right
            continue
        seen.add(key)
        val = None if rng.random() < 0.2 else round(rng.uniform(0, 100), 3)
        rrows.append((*key, val))

    left = spark.createDataFrame(lrows, "event_id bigint, user_id string, ts timestamp")
    right = spark.createDataFrame(rrows, "user_id string, ts timestamp, v double")
    got = {r.event_id: r.v_asof
           for r in asof_join(left, right, on="user_id", ts="ts").collect()}

    con = duckdb.connect()
    con.register("l", pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]))
    con.register("r", pd.DataFrame(rrows, columns=["user_id", "ts", "v"]))
    want = {int(eid): (None if pd.isna(v) else round(float(v), 9))
            for eid, v in con.execute(
                "SELECT l.event_id, r.v FROM l ASOF LEFT JOIN r "
                "ON l.user_id = r.user_id AND l.ts >= r.ts").fetchall()}
    got_r = {k: (None if v is None else round(v, 9)) for k, v in got.items()}
    assert got_r == want and len(want) == 400


def test_random_components_match_duckdb_closure(spark):
    rng = random.Random(SEED + 1)
    edges = sorted({tuple(sorted((rng.randrange(150), rng.randrange(150))))
                    for _ in range(260) if True})
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {(r.doc_id, r.cluster_id)
           for r in dedup.duplicate_clusters(pairs).collect()}

    con = duckdb.connect()
    con.register("p", pd.DataFrame(edges, columns=["id_a", "id_b"]))
    want = {(int(a), int(b)) for a, b in con.execute("""
        WITH RECURSIVE
        verts AS (SELECT id_a AS id FROM p UNION SELECT id_b FROM p),
        e AS (SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p),
        reach AS (SELECT id, id AS label FROM verts
                  UNION SELECT e.dst, r.label FROM e JOIN reach r ON r.id = e.src)
        SELECT id, min(label) FROM reach GROUP BY id""").fetchall()}
    assert got == want and len(want) >= 100
