"""Round-11 probe 3: q43 broadcast-the-filtered-orders variant vs the
pinned SMJ; q44 broadcast-the-prefiltered-orders variant vs the
SHUFFLE_HASH exchange.  Interleaved min-of-3 + digest equality."""

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
spark = get_session("r11_q4344c")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)
o_t, l_t = _bucketed_facts(spark, cat)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def q43_bcast(spark, sf_dir):
    c = cat.customer.where(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    o = (o_t.where(F.col("o_orderdate").cast("date")
                   < F.lit("1995-03-15").cast("date"))
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (l_t.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    small = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
             .select("o_orderkey", "o_orderdate"))
    j = li.join(F.broadcast(small), li["l_orderkey"] == small["o_orderkey"])
    agg = (j.groupBy("l_orderkey", "o_orderdate")
           .agg(dec_round(F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))))
                .alias("revenue")))
    return (agg.select("l_orderkey", "revenue",
                       F.col("o_orderdate").cast("date").alias("od"))
            .orderBy(F.col("revenue").desc(), "l_orderkey").limit(10))


def q44_bcast(spark, sf_dir):
    r = cat.region.where(F.col("r_name") == "ASIA")
    nat = (cat.nation.join(F.broadcast(r),
                           F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    sup = (cat.supplier.join(F.broadcast(nat),
                             F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_nationkey", "n_name"))
    li = cat.lineitem.join(F.broadcast(sup),
                           F.col("l_suppkey") == F.col("s_suppkey"))
    cust = (cat.customer.join(F.broadcast(nat.select("n_nationkey")),
                              F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "c_nationkey"))
    o = (cat.orders.join(F.broadcast(cust),
                         F.col("o_custkey") == F.col("c_custkey"))
         .select("o_orderkey", "c_nationkey"))
    j = li.join(F.broadcast(o), (F.col("l_orderkey") == F.col("o_orderkey"))
                & (F.col("s_nationkey") == F.col("c_nationkey")))
    return (j.groupBy("n_name")
            .agg(dec_round(F.sum(F.col("l_extendedprice")
                                 * (1 - F.col("l_discount"))))
                 .alias("revenue"))
            .orderBy("n_name"))


variants = {
    "q43_cur": QUERIES["q43_shipping_topk"],
    "q43_bcast": q43_bcast,
    "q44_cur": QUERIES["q44_regional_revenue"],
    "q44_bcast": q44_bcast,
}
dig = {}
for name, fn in variants.items():
    dig[name] = consume(fn(spark, sf_dir))
times = {k: [] for k in variants}
for _ in range(3):
    for name, fn in variants.items():
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
out = []
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts} "
               f"n={dig[name]['n']} d={dig[name]['d']}")
out.append(f"q43 match: {dig['q43_cur']['d'] == dig['q43_bcast']['d']}")
out.append(f"q44 match: {dig['q44_cur']['d'] == dig['q44_bcast']['d']}")
out.append(f"load={os.getloadavg()[0]:.1f}")
with open("/tmp/r11_q4344c.out", "w") as fh:
    fh.write("\n".join(out) + "\n")
print("\n".join(out))
spark.stop()
