"""CLI smoke tests (in-process main(), reusing the session fixture's JVM)."""

import json

import pytest

from json_schema_spark.cli import main
from json_schema_spark.datagen import (DocGenConfig, documents_json_schema,
                                       generate_documents)

CFG = DocGenConfig(n_docs=300, seed=13, bad_kind_rate=0.05, partitions=4)


@pytest.fixture()
def paths(spark, tmp_path):
    data = str(tmp_path / "docs")
    generate_documents(spark, CFG).write.parquet(data)
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps(documents_json_schema(CFG)))
    return data, str(schema), tmp_path


def test_cli_typed_run(spark, capsys, paths):
    data, schema, tmp = paths
    rc = main(["--schema", schema, "--data", data,
               "--violations", str(tmp / "viols"),
               "--verdicts", str(tmp / "verd")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1  # invalid docs exist
    assert out["docs"] == CFG.n_docs
    assert out["valid_docs"] < CFG.n_docs
    viols = spark.read.parquet(str(tmp / "viols"))
    assert viols.count() > 0


def test_cli_fail_fast_clean(spark, capsys, tmp_path):
    clean_cfg = DocGenConfig(n_docs=200, seed=14, partitions=2)
    data = str(tmp_path / "clean")
    generate_documents(spark, clean_cfg).write.parquet(data)
    schema_path = tmp_path / "s.json"
    schema_path.write_text(json.dumps(documents_json_schema(clean_cfg)))
    rc = main(["--schema", str(schema_path), "--data", data, "--fail-fast"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["valid_docs"] == out["docs"] == 200


def test_cli_resumable(spark, capsys, paths):
    data, schema, tmp = paths
    rc = main(["--schema", schema, "--data", data,
               "--manifest", str(tmp / "manifest"), "--n-buckets", "4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["processed_buckets"] == 4
    rc = main(["--schema", schema, "--data", data,
               "--manifest", str(tmp / "manifest"), "--n-buckets", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["processed_buckets"] == 0 and out["skipped_buckets"] == 4
