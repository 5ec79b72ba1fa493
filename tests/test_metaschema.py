"""Detect mode: schema-validates-schema with the cyclic draft-4 meta-schema
(reference analog: validate_schema.rb:39-49).

The meta-schema's dereferenced clones branch into each other, so static
compilation bounds the total $ref hops per path (max_ref_depth). At depth 1
the compiled plan stays small (~0.8 MB SQL) and catches all top-level
keyword violations; keyword violations nested inside sub-schemas validate
vacuously true (the documented static-compilation tradeoff — the planned
iterative "deep mode" lifts it). All cases run batched in one job: the
compile/codegen cost is paid once, like a real corpus scan.
"""

import json
import time

import pytest

from json_schema_spark.engine import ValidationEngine
from json_schema_spark.metaschema import DRAFT4_META_SCHEMA
from tests.data_scaffold import schema_sample

CASES = [
    # (doc, expect_valid, expected error types at depth 1)
    ({"type": "object", "properties": {"a": {"type": "string"}}}, True, set()),
    ({"type": 42}, False, {"any_of_failed"}),
    ({"type": "everything"}, False, {"any_of_failed"}),
    ({"required": []}, False, {"min_items_failed"}),
    ({"required": ["a", "a"]}, False, {"unique_items_failed"}),
    ({"enum": []}, False, {"min_items_failed"}),
    ({"maxLength": -1}, False, {"min_failed"}),
    ({"multipleOf": 0}, False, {"min_failed"}),
    ({"exclusiveMaximum": True}, False, {"required_failed"}),  # dependency on maximum
    ({"pattern": 42}, False, {"invalid_type"}),
    (schema_sample(), True, set()),
    ({"allOf": []}, False, {"min_items_failed"}),
]


def test_detect_mode_batched(spark):
    df = spark.createDataFrame(
        [(i, json.dumps(doc)) for i, (doc, _, _) in enumerate(CASES)],
        "i int, doc string",
    )
    engine = ValidationEngine(spark, max_ref_depth=1)
    t0 = time.time()
    res = engine.validate_json(df, "doc", DRAFT4_META_SCHEMA, id_cols=["i"])
    rows = {r["i"]: r for r in res.annotated.select("i", "is_valid", "violations").collect()}
    elapsed = time.time() - t0
    assert elapsed < 300, f"detect mode took {elapsed:.0f}s"

    for i, (doc, expect_valid, expect_types) in enumerate(CASES):
        row = rows[i]
        types = {e["error_type"] for e in (row["violations"] or [])}
        assert row["is_valid"] == expect_valid, (i, doc, sorted(types))
        assert expect_types <= types, (i, doc, sorted(types), expect_types)
