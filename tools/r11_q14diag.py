"""Diagnose q14's bench-context slowdown at sf10: run it exactly as
bench does (warm, clearCache+remark between runs) and print executed
plans + times for each run."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.queries import (QUERIES,
                                                  remark_session_caches)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r11_q14diag")
spark.sparkContext.setLogLevel("ERROR")


def consume(df):
    cols = [F.col(c) for c in df.columns]
    df.select(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()


fn = QUERIES["q14_mart_cte_cascade"]
# bench-style: warm-up (builds staging), then timed runs with
# clearCache + remark between them
consume(QUERIES["q18_hash_aggregate"](spark, sf_dir))
t0 = time.monotonic(); consume(fn(spark, sf_dir))
print(f"warm(+staging): {time.monotonic()-t0:.2f}s", flush=True)
for i in range(4):
    t0 = time.monotonic()
    df = fn(spark, sf_dir)
    consume(df)
    dt = time.monotonic() - t0
    print(f"run{i}: {dt:.3f}s load={os.getloadavg()[0]:.1f}", flush=True)
    if i == 0:
        plan = df._jdf.queryExecution().executedPlan().toString()
        with open("/tmp/r11_q14_plan_a.txt", "w") as fh:
            fh.write(plan)
    if i == 1:
        spark.catalog.clearCache()
        remark_session_caches(spark)
        print("-- clearCache + remark --", flush=True)
# after clearCache: plan again
df = fn(spark, sf_dir)
t0 = time.monotonic(); consume(df)
print(f"post-clear run: {time.monotonic()-t0:.3f}s", flush=True)
with open("/tmp/r11_q14_plan_b.txt", "w") as fh:
    fh.write(df._jdf.queryExecution().executedPlan().toString())
spark.stop()
