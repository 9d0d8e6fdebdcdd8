"""q47 sf10 leg decomposition round 2: scan baseline, window leg,
and a custkey-bucketed staged variant (exchange-free window)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.queries import QUERIES, _catalog
from bi_etl_and_integration_spark.sources.writers import write_bucketed

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r11_q47c")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    df.select(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64(*cols)).alias("digest")).collect()


# stage orders bucketed+sorted by o_custkey once (cost reported)
t0 = time.monotonic()
if not spark.catalog.tableExists("r11_bf_orders_ck"):
    write_bucketed(cat.orders.select("o_custkey", "o_orderkey",
                                     "o_totalprice"),
                   "r11_bf_orders_ck", buckets=32, by=["o_custkey"],
                   sort_by=["o_custkey"], single_file_buckets=True)
print(f"stage build: {time.monotonic()-t0:.1f}s", flush=True)
ock = spark.table("r11_bf_orders_ck")


def scan_only(spark, sf_dir):
    return cat.orders.select("o_custkey", "o_orderkey", "o_totalprice")


def window_leg(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (cat.orders.select("o_custkey", "o_orderkey", "o_totalprice")
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= 2).drop("__rn"))


def window_staged(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (ock.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= 2).drop("__rn"))


def full_staged(spark, sf_dir):
    top = window_staged(spark, sf_dir)
    c = cat.customer.select("c_custkey")
    return (top.join(c, top["o_custkey"] == c["c_custkey"])
            .select("c_custkey", "o_orderkey", "o_totalprice")
            .orderBy("c_custkey", "o_orderkey"))


def current(spark, sf_dir):
    return QUERIES["q47_lateral_topk"](spark, sf_dir)


variants = {
    "scan_only": scan_only,
    "window_leg": window_leg,
    "window_staged": window_staged,
    "full_staged": full_staged,
    "current_lateral": current,
}
for fn in variants.values():
    consume(fn(spark, sf_dir))
times = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
with open("/tmp/r11_q47c.out", "w") as fh:
    for name, ts in times.items():
        fh.write(f"{name}: min={min(ts)} samples={ts}\n")
    fh.write(f"load={os.getloadavg()[0]:.1f}\n")
    # digest check current vs full_staged
    for name in ("current_lateral", "full_staged"):
        df = variants[name](spark, sf_dir)
        cols = [F.col(c) for c in df.columns]
        r = df.select(F.count(F.lit(1)).alias("n"),
                      F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]
        fh.write(f"{name}: n={r['n']} digest={r['d']}\n")
print(open("/tmp/r11_q47c.out").read())
spark.sql("DROP TABLE IF EXISTS r11_bf_orders_ck")
spark.stop()
