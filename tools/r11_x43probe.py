"""Round-11 x43 decomposition at a given SF (guide §1: measure first).

Legs, timed separately with the bench's digest consume (min-of-n after
an untimed warm run, mirroring bench methodology):

  exact   — exact_jaccard_join(batch, other=corpus)  [warm-run leg:
            persisted by the query, so it is NOT in the bench's
            measured samples — timed here to know the warm cost]
  index   — minhash_index banding of the corpus (buckets table)
  lookup  — minhash_lookup against a prebuilt index (batch banding +
            (band,bucket) join + shingle verify)  [measured leg]
  full    — the declared x43 exactly as the bench times it

Also prints the verify-leg A/B for the union-by-sizes change when run
on a tree that has it (the current operator code is whatever HEAD is).

Usage: python tools/r11_x43probe.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators import dedup as dd_ops
from bi_etl_and_integration_spark.queries import QUERIES, _catalog

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bench_data/sf1"
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_session("r11_x43probe")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)
docs = cat.documents
print("documents rows:", docs.count())


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def timed(name, fn):
    spark.sparkContext.setJobDescription(f"x43probe:{name}")
    out = consume(fn())                      # warm (codegen)
    best = None
    for _ in range(n_runs):
        t0 = time.monotonic()
        consume(fn())
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best:8.3f}s  rows={out['n']}  digest={out['d']}")
    spark.sparkContext.setJobDescription(None)
    return best


corpus = docs.where(F.col("doc_id") % 2 == 0)
batch = docs.where(F.col("doc_id") % 2 == 1)

# -- leg: exact certification join (persisted by the query => warm-only)
timed("exact_jaccard_join", lambda: dd_ops.exact_jaccard_join(
    batch, "text", "doc_id", n=3, threshold=0.5, other=corpus))

# -- leg: corpus banding (index build)
timed("index_buckets", lambda: dd_ops.minhash_index(
    corpus, "text", "doc_id", num_hashes=32, bands=16).buckets)

# -- leg: lookup against a prebuilt (lazy) index
idx = dd_ops.minhash_index(corpus, "text", "doc_id",
                           num_hashes=32, bands=16)
timed("lookup_vs_index", lambda: dd_ops.minhash_lookup(
    batch, idx, "text", "doc_id", num_hashes=32, bands=16,
    jaccard_threshold=0.5))

# -- full declared query, bench-style (warm run materializes the
#    persisted exact frame; measured runs then see the bench shape)
spark.catalog.clearCache()
timed("x43_full_bench_shape", lambda: QUERIES["x43_incremental_dedup"](
    spark, sf_dir))

spark.stop()
