"""Round-11 q43/q44 decomposition, take 2: narrow consumes (only the
columns the downstream agg needs), plus a q43 runtime-bloom probe
(lineitem semi-reduction by the filtered orders side)."""

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
spark = get_session("r11_q4344b")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)
o_t, l_t = _bucketed_facts(spark, cat)


def consume(df, cols=None):
    cs = [F.col(c) for c in (cols or df.columns)]
    df.select(F.count(F.lit(1)).alias("n"),
              F.bit_xor(F.xxhash64(*cs)).alias("d")).collect()


def q43_scans(spark, sf_dir):
    o = (o_t.where(F.col("o_orderdate").cast("date")
                   < F.lit("1995-03-15").cast("date"))
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (l_t.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("date"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return o, li


def mk_q43_smj():
    o, li = q43_scans(None, None)
    c = cat.customer.where(F.col("c_mktsegment") == "BUILDING") \
        .select("c_custkey")
    j = (o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
         .join(li.hint("MERGE"), li["l_orderkey"] == o["o_orderkey"]))
    return j.select("l_orderkey", "o_orderdate",
                    "l_extendedprice", "l_discount")


def mk_q44_li():
    r = cat.region.where(F.col("r_name") == "ASIA")
    nat = (cat.nation.join(F.broadcast(r),
                           F.col("n_regionkey") == F.col("r_regionkey"))
           .select("n_nationkey", "n_name"))
    sup = (cat.supplier.join(F.broadcast(nat),
                             F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey", "s_nationkey", "n_name"))
    return (cat.lineitem.join(F.broadcast(sup),
                              F.col("l_suppkey") == F.col("s_suppkey"))
            .select("l_orderkey", "s_nationkey", "n_name",
                    "l_extendedprice", "l_discount"))


def mk_q44_o():
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


def mk_q44_join():
    li = mk_q44_li()
    o = mk_q44_o().hint("SHUFFLE_HASH")
    return (li.join(o, (F.col("l_orderkey") == F.col("o_orderkey"))
                    & (F.col("s_nationkey") == F.col("c_nationkey")))
            .select("n_name", "l_extendedprice", "l_discount"))


o_s, l_s = q43_scans(None, None)
variants = {
    "q43_scan_o": lambda s, d: o_s,
    "q43_scan_l": lambda s, d: l_s,
    "q43_smj_narrow": lambda s, d: mk_q43_smj(),
    "q43_full": QUERIES["q43_shipping_topk"],
    "q44_li_narrow": lambda s, d: mk_q44_li(),
    "q44_o_narrow": lambda s, d: mk_q44_o(),
    "q44_join_narrow": lambda s, d: mk_q44_join(),
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
out = []
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts}")

# q43 bloom probe: does a runtime bloom (orders->lineitem) change plan?
full = QUERIES["q43_shipping_topk"]
plan = full(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
out.append(f"q43 bloom in plan: {'bloom' in plan.lower()}")
# count rows surviving each q43 side + the join
o, li = q43_scans(None, None)
out.append(f"q43 rows: orders_filt={o.count()} li_filt={li.count()} "
           f"smj_out={mk_q43_smj().count()}")
out.append(f"q44 rows: li_pref={mk_q44_li().count()} "
           f"o_pref={mk_q44_o().count()} join={mk_q44_join().count()}")
out.append(f"load={os.getloadavg()[0]:.1f}")
with open("/tmp/r11_q4344b.out", "w") as fh:
    fh.write("\n".join(out) + "\n")
print("\n".join(out))
spark.stop()
