"""Emit plans/r11/<query>_{before,after}.txt — `.explain("formatted")`
for every query whose plan round 11 changed.

"before" = the r10 form of the query (raw-parquet inputs, same logical
shape, reconstructed here exactly as tools/r11_q14q47.py measured it);
"after" = the declared HEAD query.  Judge checks plan claims (Exchange
counts, join strategies, PushedFilters) against these files.

Usage: python tools/r11_plans.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import aggregate as agg_ops
from bi_etl_and_integration_spark.operators import windows as win_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog, dec_round

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r11")
os.makedirs(out_dir, exist_ok=True)

spark = get_session("r11_plans")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def q14_before(spark, sf_dir):
    """r10 form: pre-aggregate-then-join over RAW parquet facts."""
    return agg_ops.pre_aggregate_then_join(
        cat.customer.select("c_custkey"), "c_custkey",
        [(cat.orders, "o_custkey",
          {"n_ord": F.count(F.lit(1)),
           "sum_p": dec_round(F.sum("o_totalprice"))}),
         (cat.events, "user_id",
          {"n_ev": F.count(F.lit(1))})]).orderBy("c_custkey")


def q47_before(spark, sf_dir):
    """r10 form: window limit_by over RAW parquet orders (identical
    shape to the decorrelated LATERAL — plan-diffed in SCALE.md)."""
    top = win_ops.limit_by(
        cat.orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], 2)
    c = cat.customer.select("c_custkey")
    return (top.join(F.broadcast(c), top["o_custkey"] == c["c_custkey"])
            .select("c_custkey", "o_orderkey", "o_totalprice")
            .orderBy("c_custkey", "o_orderkey"))


PAIRS = {
    "q14_mart_cte_cascade": q14_before,
    "q47_lateral_topk": q47_before,
}


def dump(df, path: str, header: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as fh:
        fh.write(f"-- {header}\n-- sf_dir: {sf_dir}\n\n")
        fh.write(buf.getvalue())
    print("wrote", path)


for name, before_fn in PAIRS.items():
    dump(before_fn(spark, sf_dir),
         os.path.join(out_dir, f"{name}_before.txt"),
         f"{name} BEFORE (r10 form: raw-parquet inputs)")
    dump(QUERIES[name](spark, sf_dir),
         os.path.join(out_dir, f"{name}_after.txt"),
         f"{name} AFTER (r11: _custgrain_facts bucketed staging)")

spark.stop()
