import os
import tempfile

import pytest

# Hermetic disk compile cache: without this, a stale ~/.cache entry written
# by an OLDER working copy (same package version, different emitted SQL)
# could leak into test runs. Tests that want the disk path exercise it via
# an explicit disk_cache_dir.
os.environ.setdefault(
    "JSS_COMPILE_CACHE_DIR",
    tempfile.mkdtemp(prefix="jss_test_compile_cache_"))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    session = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("json_schema_spark-tests")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session
