"""Simulate the driver's correctness gate: run each __spark_entry__ query
at sf0.01 and compare row count + order-insensitive values against its
DuckDB oracle (columns sorted by name, like the driver)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def canon(value):
    if value is None:
        return "∅"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return f"{value:.9g}"
    return str(value)


def spark_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(canon(r[c]) for c in cols) for r in df.collect())


def duck_rows(con, sql):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    return sorted(tuple(canon(row[i]) for i in order) for row in res.fetchall()), sorted(names)


ORACLED = sorted(entry_mod.oracle_sql().keys())


def pandas_dtypes(duck_con, sql, spark_df):
    """dtype-KIND comparison (int vs float vs object): round 2's three red
    driver rows were bit-identical VALUES whose DuckDB sum() came back
    HUGEINT→float64/decimal-object vs Spark int64 — a kind-level mismatch
    the value-only pytest couldn't see. Width differences (int32 vs int64)
    are NOT flagged: the driver's canonical form doesn't distinguish them
    (int32 and int64 rows were green in CORRECTNESS_r02)."""
    ddf = duck_con.execute(sql).df()
    sdf = spark_df.toPandas()
    kind = lambda t: {"i": "int", "u": "int", "f": "float"}.get(t.kind, t.kind)
    d = {c: kind(t) for c, t in ddf.dtypes.items()}
    s = {c: kind(t) for c, t in sdf.dtypes.items()}
    return d, s


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    expected, oracle_cols = duck_rows(duck, entry_mod.oracle_sql()[name])
    assert sorted(df.columns) == oracle_cols, f"column mismatch: {sorted(df.columns)} vs {oracle_cols}"
    ddt, sdt = pandas_dtypes(duck, entry_mod.oracle_sql()[name], df)
    assert ddt == sdt, f"pandas dtype mismatch (driver hash carries dtype): duckdb={ddt} spark={sdt}"
    actual = spark_rows(df)
    assert len(actual) == len(expected), f"row count {len(actual)} != {len(expected)}"
    mism = [i for i, (a, e) in enumerate(zip(actual, expected)) if a != e]
    assert not mism, f"{len(mism)} mismatched rows; first: {actual[mism[0]]} != {expected[mism[0]]}"


def test_rows_only_queries_run(spark):
    only = set(entry_mod.queries()) - set(entry_mod.oracle_sql())
    for name in sorted(only):
        df = entry_mod.queries()[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) >= {"doc_id", "path", "error_type", "message"}


def test_anti_join_oracle_nonvacuous(spark, duck):
    """r3 VERDICT "What's missing" #1: customers_without_orders was the
    last 0-row green (consistency-of-emptiness). The query now re-keys a
    deterministic customer subset out of the orders key space; the planted
    orphan count is pinned so the left_anti path is actually exercised."""
    name = "customers_without_orders"
    df = entry_mod.queries()[name](spark, SF_DIR)
    expected, _ = duck_rows(duck, entry_mod.oracle_sql()[name])
    assert df.count() == len(expected) == 16
