"""x33_hybrid_rrf leg decomposition (VERDICT r11 item 1): time the
BM25 leg, the cosine leg, and the full query separately at
$SPARK_GRAFT_SF_DIR, interleaved min-of-N."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import similarity as sim_ops
from bi_etl_and_integration_spark.operators import text as tx_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog, dec_round

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
spark = get_session("r12_x33legs")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def bm_leg(spark, sf_dir):
    bm = tx_ops.bm25_rank(cat.documents, ["spark", "merge", "window"])
    return (bm.select("doc_id", dec_round("bm25_score", 6).alias("s"))
            .orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(1000))


def cos_leg(spark, sf_dir):
    overfetch = 1100
    qvec = (cat.embeddings.where(F.col("vec_id") == 0)
            .select(F.lit(0).alias("query_id"), "embedding"))
    fetched = (sim_ops.brute_force_topk(cat.embeddings, qvec, k=overfetch)
               .select(F.col("vec_id").alias("doc_id"),
                       dec_round("cosine_sim", 6).alias("s")))
    return (fetched.orderBy(F.col("s").desc(), F.col("doc_id").asc())
            .limit(1000))


variants = {"bm_leg": bm_leg, "cos_leg": cos_leg,
            "x33_full": QUERIES["x33_hybrid_rrf"]}
for n, f in variants.items():            # warm
    consume(f(spark, sf_dir))
times = {k: [] for k in variants}
for _ in range(int(os.environ.get("R12_ROUNDS", "3"))):
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"x33leg {name}")
        t0 = time.monotonic()
        consume(fn(spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
out = [f"sf_dir={sf_dir} load={os.getloadavg()[0]:.1f}"]
for name, ts in times.items():
    out.append(f"{name}: min={min(ts)} samples={ts}")
print("\n".join(out))
with open(os.environ.get("R12_OUT", "/tmp/r12_x33legs.out"), "w") as fh:
    fh.write("\n".join(out) + "\n")
spark.stop()
