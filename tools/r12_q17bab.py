"""q17b A/B at $SPARK_GRAFT_SF_DIR: r11 plan (groupBy pre-reduction,
inlined) vs r12 (right_order window tie-break), interleaved min-of-N."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import relational as rel_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r12_q17bab")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def q17b_old(spark, sf_dir):
    ord_ = (cat.orders
            .groupBy(F.col("o_custkey").alias("user_id"),
                     F.col("o_orderdate").cast("date").alias("od"))
            .agg(F.max("o_orderkey").alias("o_orderkey")))
    ev = cat.events.select("event_id", "user_id",
                           F.col("ts").cast("date").alias("ed"))
    j = rel_ops.asof_join(ev, ord_, "user_id", "ed", "od",
                          direction="backward")
    return (j.select("event_id", F.col("o_orderkey").alias("matched_order"))
            .orderBy("event_id"))


variants = {"q17b_old": q17b_old, "q17b_new": QUERIES["q17b_asof_join"]}
dig = {}
for n, f in variants.items():
    r = consume(f(spark, sf_dir))
    dig[n] = (r["n"], r["d"])
times = {k: [] for k in variants}
for _ in range(int(os.environ.get("R12_ROUNDS", "4"))):
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"ab {name}")
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
out = [f"sf_dir={sf_dir} load={os.getloadavg()[0]:.1f}"]
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts} n={dig[name][0]} "
               f"digest={dig[name][1]}")
out.append(f"digests match: {dig['q17b_old'] == dig['q17b_new']}")
print("\n".join(out))
with open(os.environ.get("R12_OUT", "/tmp/r12_q17bab.out"), "w") as fh:
    fh.write("\n".join(out) + "\n")
spark.stop()
