#!/usr/bin/env python
"""Diagnostic bench (guide §1): per-query phase breakdown.

NOT the frozen driver bench — bench.py is the measurement contract. This
harness answers "where does the time go" per query: DataFrame build time
(driver-side Python), plan time (explain = analysis+optimization), execution
time (noop sink), and the number of Spark jobs the query launches (sequential
jobs = persist materializations / collects / iterative rounds — the fixed-
cost multiplier at any scale).

Usage:
    python bench_extra.py --queries a,b,c [--plans-dir plans/r06 --suffix before]
    python bench_extra.py --all
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

import bench as B


def run(names, plans_dir=None, suffix="before"):
    spark = B.build_spark(B.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as the bench cohort child
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{B.SF_DIR}/documents.parquet").limit(100).count()
    from pyspark.sql import functions as SF

    @SF.pandas_udf("long")
    def _warm(s):
        return s

    (spark.range(320_000).repartition(B.CPUS).select(_warm(SF.col("id")))
     .write.format("noop").mode("overwrite").save())

    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    st = spark.sparkContext.statusTracker()
    for name in names:
        spark.sparkContext.setJobGroup(name, name)
        jobs0 = set(st.getJobIdsForGroup(name))
        t0 = time.time()
        df = qs[name](spark, B.SF_DIR)
        t1 = time.time()
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        t2 = time.time()
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as fh:
                fh.write(plan)
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        jobs = len(set(st.getJobIdsForGroup(name))) - len(jobs0)
        spark.catalog.clearCache()
        spark.sparkContext.setJobGroup("gc", "gc")
        print(json.dumps({
            "name": name,
            "build_s": round(t1 - t0, 3),
            "plan_s": round(t2 - t1, 3),
            "exec_s": round(t3 - t2, 3),
            "total_s": round(t3 - t0, 3),
            "n_jobs": jobs,
            "exchanges": plan.count("Exchange"),
            "batch_py": plan.count("BatchEvalPython"),
            "arrow_py": plan.count("ArrowEvalPython"),
        }), flush=True)
    spark.stop()


def _flag_value(flag):
    if flag not in sys.argv:
        return None
    idx = sys.argv.index(flag) + 1
    if idx >= len(sys.argv):
        sys.exit(f"bench_extra: {flag} needs a value\n{__doc__}")
    return sys.argv[idx]


if __name__ == "__main__":
    names = B.BENCH_QUERIES if "--all" in sys.argv else None
    qarg = _flag_value("--queries")
    if qarg:
        names = qarg.split(",")
    if not names:
        sys.exit(f"bench_extra: pass --all or --queries a,b,c\n{__doc__}")
    run(names, _flag_value("--plans-dir"), _flag_value("--suffix") or "before")
