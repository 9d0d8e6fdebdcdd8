"""q47 sf10 decomposition: window leg alone, +join, +final sort, and
the full current form — interleaved min-of-3."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import windows as win_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r11_q47b")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    df.select(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64(*cols)).alias("digest")).collect()


def window_leg(spark, sf_dir):
    return win_ops.limit_by(
        cat.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], 2)


def window_join(spark, sf_dir):
    top = window_leg(spark, sf_dir)
    c = cat.customer.select("c_custkey")
    return (top.join(c, top["o_custkey"] == c["c_custkey"])
            .select("c_custkey", "o_orderkey", "o_totalprice"))


def window_join_sort(spark, sf_dir):
    return window_join(spark, sf_dir).orderBy("c_custkey", "o_orderkey")


def current(spark, sf_dir):
    return QUERIES["q47_lateral_topk"](spark, sf_dir)


variants = {
    "window_leg": window_leg,
    "window_join": window_join,
    "window_join_sort": window_join_sort,
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
for name, ts in times.items():
    print(f"{name}: min={min(ts)} samples={ts}", flush=True)
print(f"load={os.getloadavg()[0]:.1f}")
spark.stop()
