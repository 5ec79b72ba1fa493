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


def test_cli_docs_files_json_and_yaml(spark, capsys, tmp_path):
    """Single-file front door (validate_schema.rb:101-127): JSON and YAML
    documents, reference message wording, exit codes."""
    schema_path = tmp_path / "s.json"
    schema_path.write_text(json.dumps({
        "type": ["object"],
        "required": ["name"],
        "properties": {"name": {"type": ["string"], "minLength": 3}},
    }))
    good = tmp_path / "good.json"
    good.write_text(json.dumps({"name": "alice"}))
    good_yaml = tmp_path / "good.yaml"
    good_yaml.write_text("name: bobby\n")
    rc = main(["--schema", str(schema_path), "--docs", str(good), str(good_yaml)])
    out = capsys.readouterr().out
    assert rc == 0
    assert f"{good} is valid." in out
    assert f"{good_yaml} is valid." in out

    bad = tmp_path / "bad.yaml"
    bad.write_text("name: ab\n")
    rc = main(["--schema", str(schema_path), "--docs", str(bad)])
    err = capsys.readouterr().err
    assert rc == 1
    assert f"{bad}#/name: failed schema #/properties/name:" in err
    assert "At least 3 characters are required" in err


def test_cli_docs_file_errors(spark, capsys, tmp_path):
    schema_path = tmp_path / "s.json"
    schema_path.write_text(json.dumps({"type": ["object"]}))
    empty = tmp_path / "empty.json"
    empty.write_text("")
    rc = main(["--schema", str(schema_path), "--docs", str(empty)])
    assert rc == 2
    assert "File is empty." in capsys.readouterr().err

    broken = tmp_path / "broken.json"
    broken.write_text("{nope")
    rc = main(["--schema", str(schema_path), "--docs", str(broken)])
    assert rc == 2
    assert "Invalid JSON. Try to validate using `jsonlint`." in capsys.readouterr().err

    rc = main(["--schema", str(schema_path), "--docs", str(tmp_path / "missing.json")])
    assert rc == 2
    assert "No such file or directory." in capsys.readouterr().err


def test_cli_yaml_schema(spark, capsys, tmp_path):
    """Schemas may be YAML too (reference parse() goes through read_file)."""
    schema_path = tmp_path / "s.yaml"
    schema_path.write_text("type: [object]\nrequired: [k]\n")
    doc = tmp_path / "d.json"
    doc.write_text(json.dumps({"k": 1}))
    rc = main(["--schema", str(schema_path), "--docs", str(doc)])
    assert rc == 0
    assert "is valid." in capsys.readouterr().out


def test_cli_docs_detect_mode(spark, capsys, tmp_path):
    """--detect + --docs resolves each file's own $schema from the store
    (validate_schema_test.rb:28-37 analog; draft-4 meta pre-registered like
    bin/validate-schema:17-20)."""
    doc = tmp_path / "s.json"
    doc.write_text(json.dumps({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": "object",
        "properties": {"a": {"type": "integer"}},
    }))
    rc = main(["--detect", "--docs", str(doc)])
    out = capsys.readouterr().out
    assert rc == 0
    assert f"{doc} is valid." in out

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({
        "$schema": "http://json-schema.org/draft-04/schema#",
        "type": 12,
    }))
    rc = main(["--detect", "--docs", str(bad)])
    assert rc == 1
    assert "failed schema" in capsys.readouterr().err


def test_cli_docs_detect_errors(spark, capsys, tmp_path):
    """Reference wording for missing/unknown $schema
    (validate_schema.rb:39-49)."""
    no_tag = tmp_path / "no_tag.json"
    no_tag.write_text(json.dumps({"type": "object"}))
    rc = main(["--detect", "--docs", str(no_tag)])
    assert rc == 2
    assert f"{no_tag}: No $schema tag for detection." in capsys.readouterr().err

    unknown = tmp_path / "unknown.json"
    unknown.write_text(json.dumps({"$schema": "http://example.com/nope#"}))
    rc = main(["--detect", "--docs", str(unknown)])
    assert rc == 2
    assert ("Unknown $schema, try specifying one with -s."
            in capsys.readouterr().err)


def test_cli_docs_detect_extra_schema(spark, capsys, tmp_path):
    """--extra-schemas registers a custom $schema target for detection
    (validate_schema_test.rb:49-58 analog)."""
    custom = tmp_path / "custom_schema.json"
    custom.write_text(json.dumps({
        "id": "http://example.com/custom#",
        "type": ["object"],
        "required": ["k"],
    }))
    doc = tmp_path / "d.json"
    doc.write_text(json.dumps({"$schema": "http://example.com/custom#", "k": 1}))
    rc = main(["--detect", "--extra-schemas", str(custom), "--docs", str(doc)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert f"{doc} is valid." in out
