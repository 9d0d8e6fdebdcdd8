"""Round-11 probe: q47_lateral_topk plan diff + A/B vs a window
rewrite (VERDICT r10 item 1).  Runs the CURRENT decorrelated-LATERAL
form against a limit_by-then-join rewrite, interleaved, same session,
at the SF given by SPARK_GRAFT_SF_DIR.  Prints timings + executed
plans (truncated)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401 (registers queries)
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import windows as win_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("r11_q47")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    df.select(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64(*cols)).alias("digest")).collect()


def cur(spark, sf_dir):
    return QUERIES["q47_lateral_topk"](spark, sf_dir)


def rewrite(spark, sf_dir):
    top = win_ops.limit_by(
        cat.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], 2)
    c = cat.customer.select("c_custkey")
    return (top.join(c, top["o_custkey"] == c["c_custkey"])
            .select("c_custkey", "o_orderkey", "o_totalprice")
            .orderBy("c_custkey", "o_orderkey"))


variants = {"lateral_sql": cur, "window_join": rewrite}

# sanity: same digest
for name, fn in variants.items():
    df = fn(spark, sf_dir)
    cols = [F.col(c) for c in df.columns]
    row = df.select(F.count(F.lit(1)).alias("n"),
                    F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]
    print(f"{name}: n={row['n']} digest={row['d']}", flush=True)

# warm both, then interleave 3 rounds
for fn in variants.values():
    consume(fn(spark, sf_dir))
times = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
for name, ts in times.items():
    print(f"{name}: min={min(ts)} samples={ts} load={os.getloadavg()[0]:.1f}",
          flush=True)

if os.environ.get("R11_PLANS") == "1":
    for name, fn in variants.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        print(f"\n===== {name} plan =====")
        print("\n".join(plan.splitlines()[:80]))
spark.stop()
