"""Round-11 leg decomposition for the two remaining sf10 >2x rows:
q43 (scan vs SMJ vs broadcast vs agg vs TakeOrdered) and q44 (prefilter
scans vs fact exchange vs agg).  Interleaved min-of-3, one session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.queries import (QUERIES, _bucketed_facts,
                                                  _catalog, dec_round)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r11_q4344")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)
o_t, l_t = _bucketed_facts(spark, cat)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    df.select(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()


def q43_scan_o(spark, sf_dir):
    return (o_t.where(F.col("o_orderdate").cast("date")
                      < F.lit("1995-03-15").cast("date"))
            .select("o_orderkey", "o_custkey", "o_orderdate"))


def q43_scan_l(spark, sf_dir):
    return (l_t.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
            .select("l_orderkey", "l_extendedprice", "l_discount"))


def q43_o_bcast_c(spark, sf_dir):
    c = cat.customer.where(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    o = q43_scan_o(spark, sf_dir)
    return o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])


def q43_smj(spark, sf_dir):
    j = q43_o_bcast_c(spark, sf_dir)
    li = q43_scan_l(spark, sf_dir)
    return j.join(li.hint("MERGE"), li["l_orderkey"] == j["o_orderkey"])


def q43_agg(spark, sf_dir):
    return (q43_smj(spark, sf_dir).groupBy("l_orderkey", "o_orderdate")
            .agg(dec_round(F.sum(F.col("l_extendedprice")
                                 * (1 - F.col("l_discount"))))
                 .alias("revenue")))


def q44_li_prefilter(spark, sf_dir):
    r = cat.region.where(F.col("r_name") == "ASIA")
    nat = (cat.nation.join(F.broadcast(r),
                           F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    sup = (cat.supplier.join(F.broadcast(nat),
                             F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_nationkey", "n_name"))
    return cat.lineitem.join(F.broadcast(sup),
                             F.col("l_suppkey") == F.col("s_suppkey"))


def q44_o_prefilter(spark, sf_dir):
    r = cat.region.where(F.col("r_name") == "ASIA")
    nat = (cat.nation.join(F.broadcast(r),
                           F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey"))
    cust = (cat.customer.join(F.broadcast(nat),
                              F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_nationkey"))
    return (cat.orders.join(F.broadcast(cust),
                            F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "c_nationkey"))


def q44_join(spark, sf_dir):
    li = q44_li_prefilter(spark, sf_dir)
    o = q44_o_prefilter(spark, sf_dir).hint("SHUFFLE_HASH")
    return li.join(o, (F.col("l_orderkey") == F.col("o_orderkey"))
                   & (F.col("s_nationkey") == F.col("c_nationkey")))


variants = {
    "q43_scan_o": q43_scan_o,
    "q43_scan_l": q43_scan_l,
    "q43_o_bcast_c": q43_o_bcast_c,
    "q43_smj": q43_smj,
    "q43_agg": q43_agg,
    "q43_full": QUERIES["q43_shipping_topk"],
    "q44_li_prefilter": q44_li_prefilter,
    "q44_o_prefilter": q44_o_prefilter,
    "q44_join": q44_join,
    "q44_full": QUERIES["q44_regional_revenue"],
}
for fn in variants.values():
    consume(fn(spark, sf_dir))
times = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
with open("/tmp/r11_q4344.out", "w") as fh:
    for name, ts in times.items():
        fh.write(f"{name}: min={min(ts)} samples={ts}\n")
    fh.write(f"load={os.getloadavg()[0]:.1f}\n")
print(open("/tmp/r11_q4344.out").read())
spark.stop()
