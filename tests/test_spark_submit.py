"""End-to-end spark-submit --py-files packaging test: the north rule's
deployment shape. The package is zipped, the driver script runs from a
DIRECTORY OUTSIDE the repo with a scrubbed PYTHONPATH, so every
`json_schema_spark` import on the driver AND the executors must resolve
from the zip shipped via --py-files — exactly what a multi-executor
cluster submission exercises. (cf. reference bin/validate-schema: the
reference ships a Ruby CLI; ours must survive Spark's code-shipping
path too.)"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit"
    if os.path.exists("/opt/spark/bin/spark-submit") else None)


@pytest.mark.skipif(_SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from json_schema_spark.datagen import (DocGenConfig,
                                           documents_json_schema,
                                           generate_documents)

    cfg = DocGenConfig(n_docs=300, seed=13, bad_kind_rate=0.05, partitions=4)
    data = str(tmp_path / "docs")
    generate_documents(spark, cfg).write.parquet(data)
    schema = tmp_path / "schema.json"
    schema.write_text(json.dumps(documents_json_schema(cfg)))

    # package exactly as README documents
    zip_path = str(tmp_path / "json_schema_spark.zip")
    subprocess.run([sys.executable, "-m", "zipfile", "-c", zip_path,
                    "json_schema_spark"], cwd=REPO, check=True)

    # driver script outside the repo; imports must come from the zip
    driver = tmp_path / "run_validate.py"
    driver.write_text("import sys\n"
                      "from json_schema_spark.cli import main\n"
                      "sys.exit(main(sys.argv[1:]))\n")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out_v = str(tmp_path / "viol")
    out_d = str(tmp_path / "verd")
    proc = subprocess.run(
        [_SPARK_SUBMIT, "--master", "local[2]",
         "--py-files", zip_path, str(driver),
         "--schema", str(schema), "--data", data,
         "--violations", out_v, "--verdicts", out_d],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env)
    assert proc.returncode == 1, proc.stderr[-3000:]  # invalid docs found
    assert os.path.exists(os.path.join(out_v, "_SUCCESS")), proc.stderr[-2000:]

    rows = spark.read.parquet(out_v)
    n = rows.count()
    assert n > 0
    assert {"doc_id", "error_type", "path", "message"} <= set(rows.columns)
    # the run summary line is the CLI contract
    summary = [ln for ln in proc.stdout.splitlines()
               if ln.startswith('{"docs"')]
    assert summary, proc.stdout[-2000:]
    assert json.loads(summary[-1])["docs"] == 300
