"""Round-11 A/B: NEW q14/q47 (custgrain staging) vs their r10 forms,
interleaved min-of-3 in one session, plus DuckDB side for ratio."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import aggregate as agg_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog, dec_round

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r11_q14q47")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def q14_old(spark, sf_dir):
    return agg_ops.pre_aggregate_then_join(
        cat.customer.select("c_custkey"), "c_custkey",
        [(cat.orders, "o_custkey",
          {"n_ord": F.count(F.lit(1)),
           "sum_p": dec_round(F.sum("o_totalprice"))}),
         (cat.events, "user_id",
          {"n_ev": F.count(F.lit(1))})]).orderBy("c_custkey")


def q47_old(spark, sf_dir):
    cat.customer.createOrReplaceTempView("customer")
    cat.orders.createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice "
        "FROM customer c JOIN LATERAL ("
        "SELECT o_orderkey, o_totalprice FROM orders o "
        "WHERE o.o_custkey = c.c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t "
        "ORDER BY c.c_custkey, t.o_orderkey")


variants = {
    "q14_old": q14_old,
    "q14_new": QUERIES["q14_mart_cte_cascade"],
    "q47_old": q47_old,
    "q47_new": QUERIES["q47_lateral_topk"],
}
t0 = time.monotonic()
dig = {}
for name, fn in variants.items():
    dig[name] = consume(fn(spark, sf_dir))   # warm (builds staging once)
build_note = time.monotonic() - t0
times = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
with open("/tmp/r11_q14q47.out", "w") as fh:
    fh.write(f"warm+staging pass: {build_note:.1f}s\n")
    for name, ts in times.items():
        fh.write(f"{name}: min={min(ts)} samples={ts} "
                 f"n={dig[name]['n']} d={dig[name]['d']}\n")
    fh.write(f"digest q14 match: {dig['q14_old']['d'] == dig['q14_new']['d']}\n")
    fh.write(f"digest q47 match: {dig['q47_old']['d'] == dig['q47_new']['d']}\n")
    fh.write(f"load={os.getloadavg()[0]:.1f}\n")
print(open("/tmp/r11_q14q47.out").read())
spark.stop()
