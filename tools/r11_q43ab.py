"""q43 focused A/B: pinned co-located SMJ vs explicit small-side
broadcast, at the SF in SPARK_GRAFT_SF_DIR, 5 interleaved rounds."""

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
spark = get_session("r11_q43ab")
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


variants = {"q43_smj": QUERIES["q43_shipping_topk"], "q43_bcast": q43_bcast}
dig = {n: consume(f(spark, sf_dir)) for n, f in variants.items()}
times = {k: [] for k in variants}
for _ in range(5):
    for name, fn in variants.items():
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
out = [f"sf_dir={sf_dir}"]
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts}")
out.append(f"match: {dig['q43_smj']['d'] == dig['q43_bcast']['d']}")
out.append(f"load={os.getloadavg()[0]:.1f}")
print("\n".join(out))
with open(os.environ.get("R11_OUT", "/tmp/r11_q43ab.out"), "w") as fh:
    fh.write("\n".join(out) + "\n")
spark.stop()
