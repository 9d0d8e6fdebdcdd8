"""x33/x26 A/B at $SPARK_GRAFT_SF_DIR: r11 bm25 plan (inlined) vs the
r12 rewrite, interleaved min-of-N in one session, digest-compared."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import text as tx_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog, dec_round

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r12_x33ab")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def bm25_rank_r11(docs, query_terms, *, id_col="doc_id",
                  text_col="text", k1=1.2, b=0.75, topk=None):
    """Verbatim r11 implementation (explode -> tf groupBy -> df join)."""
    terms = [t.lower() for t in query_terms]
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t != "")
    with_len = (docs.select(F.col(id_col), toks.alias("__toks"))
                .select(F.col(id_col), F.col("__toks"),
                        F.size("__toks").alias("__dl")))
    stats = with_len.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"))
    term_arr = F.array(*[F.lit(t) for t in terms])
    exploded = (with_len.where(F.arrays_overlap(F.col("__toks"), term_arr))
                .select(F.col(id_col), F.col("__dl"),
                        F.explode("__toks").alias("__term"))
                .where(F.col("__term").isin(terms)))
    tf = (exploded.groupBy(id_col, "__dl", "__term")
          .agg(F.count(F.lit(1)).alias("__tf")))
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5))
    denom = (F.col("__tf")
             + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
    contrib = idf * F.col("__tf") * (k1 + 1.0) / denom
    scored = (tf.join(F.broadcast(dfreq), "__term")
              .crossJoin(F.broadcast(stats))
              .groupBy(id_col)
              .agg(F.sum(contrib).alias("bm25_score")))
    if topk is not None:
        return scored.orderBy(F.col("bm25_score").desc(),
                              F.col(id_col)).limit(topk)
    return scored


def bm_old(spark, sf_dir):
    bm = bm25_rank_r11(cat.documents, ["spark", "merge", "window"])
    return (bm.select("doc_id", dec_round("bm25_score", 6).alias("s"))
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(1000))


def bm_new(spark, sf_dir):
    bm = tx_ops.bm25_rank(cat.documents, ["spark", "merge", "window"])
    return (bm.select("doc_id", dec_round("bm25_score", 6).alias("s"))
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(1000))


def x26_old(spark, sf_dir):
    out = bm25_rank_r11(cat.documents, ["spark", "merge", "window"])
    return (out.select("doc_id",
                       dec_round("bm25_score").alias("bm25_score"))
            .orderBy("doc_id"))


variants = {
    "bm_old": bm_old, "bm_new": bm_new,
    "x26_old": x26_old, "x26_new": QUERIES["x26_bm25_search"],
    "x33_new": QUERIES["x33_hybrid_rrf"],
}
dig = {}
for n, f in variants.items():
    r = consume(f(spark, sf_dir))
    dig[n] = (r["n"], r["d"])
times = {k: [] for k in variants}
for _ in range(int(os.environ.get("R12_ROUNDS", "3"))):
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"ab {name}")
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
    spark.catalog.clearCache()
out = [f"sf_dir={sf_dir} load={os.getloadavg()[0]:.1f}"]
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts} n={dig[name][0]} "
               f"digest={dig[name][1]}")
out.append(f"bm digests match: {dig['bm_old'] == dig['bm_new']}")
out.append(f"x26 digests match: {dig['x26_old'] == dig['x26_new']}")
print("\n".join(out))
with open(os.environ.get("R12_OUT", "/tmp/r12_x33ab.out"), "w") as fh:
    fh.write("\n".join(out) + "\n")
spark.stop()
