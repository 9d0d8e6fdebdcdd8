"""bm25 per-doc pass variants at $SPARK_GRAFT_SF_DIR: where is the
floor?  (a) tokenize+size only (dl floor), (b) current r12 (3 full
ArrayFilters), (c) one-pass isin prefilter array then tiny counts,
(d) contains-prefiltered tf pass + dl-only full pass."""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.queries import _catalog

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r12_bmv")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)
TERMS = ["spark", "merge", "window"]


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def _toks():
    return F.filter(F.split(F.lower(F.col("text")), " "),
                    lambda t: t != "")


def v_dl_only(spark, sf_dir):
    return (cat.documents.select("doc_id", _toks().alias("__toks"))
            .select("doc_id", F.size("__toks").alias("__dl")))


def v_filters3(spark, sf_dir):
    def cnt(term):
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(term)))
    return (cat.documents.select("doc_id", _toks().alias("__toks"))
            .select("doc_id", F.size("__toks").alias("__dl"),
                    *[cnt(t).alias(f"__tf{i}")
                      for i, t in enumerate(TERMS)]))


def v_qt(spark, sf_dir):
    qt = F.filter(F.col("__toks"), lambda x: x.isin(TERMS))

    def cnt(term):
        return F.size(F.filter(F.col("__qt"), lambda x: x == F.lit(term)))
    return (cat.documents.select("doc_id", _toks().alias("__toks"))
            .select("doc_id", F.size("__toks").alias("__dl"),
                    qt.alias("__qt"))
            .select("doc_id", "__dl",
                    *[cnt(t).alias(f"__tf{i}")
                      for i, t in enumerate(TERMS)]))


def v_contains(spark, sf_dir):
    # full dl pass (agg only) + contains-prefiltered tf pass
    def cnt(term):
        return F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(term)))
    pre = reduce(lambda a, c: a | c,
                 [F.lower(F.col("text")).contains(t) for t in TERMS])
    matched = (cat.documents.where(pre)
               .select("doc_id", _toks().alias("__toks"))
               .select("doc_id", F.size("__toks").alias("__dl"),
                       *[cnt(t).alias(f"__tf{i}")
                         for i, t in enumerate(TERMS)]))
    stats = (cat.documents.select(_toks().alias("__toks"))
             .select(F.size("__toks").alias("__dl"))
             .agg(F.count(F.lit(1)).alias("n"), F.avg("__dl").alias("a")))
    return matched.crossJoin(F.broadcast(stats))


variants = {"dl_only": v_dl_only, "filters3": v_filters3,
            "qt": v_qt, "contains": v_contains}
for n, f in variants.items():
    consume(f(spark, sf_dir))
times = {k: [] for k in variants}
for _ in range(int(os.environ.get("R12_ROUNDS", "4"))):
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"bmv {name}")
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
out = [f"sf_dir={sf_dir} load={os.getloadavg()[0]:.1f}"]
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts}")
print("\n".join(out))
spark.stop()
