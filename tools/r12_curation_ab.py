"""Curation regex family per-op A/B (VERDICT r11 item 9): declared
plan vs a forced catalog-level spread of `documents`, at
$SPARK_GRAFT_SF_DIR, interleaved min-of-N in one session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod  # noqa: F401
from bi_etl_and_integration_spark import get_session
from bi_etl_and_integration_spark.operators.relational import (
    spread_for_compute)
from bi_etl_and_integration_spark.queries import QUERIES, _catalog

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OPS = (sys.argv[1:] or
       ["x17_pii_redaction", "x18_quality_filter",
        "x19_repetition_features", "x20_contamination_check",
        "x23_segment_dedup", "x24_boilerplate_removal", "x28_lm_score",
        "x39_curation_pipeline", "x40_standardize"])

spark = get_session("r12_curab")
spark.sparkContext.setLogLevel("ERROR")
cat = _catalog(spark, sf_dir)
plain_docs = cat.table("documents")
spread_docs = spread_for_compute(plain_docs, "doc_id", min_bytes=0)


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


def run(name, spread):
    cat._cache["documents"] = spread_docs if spread else plain_docs
    return consume(QUERIES[name](spark, sf_dir))


dig = {}
for name in OPS:            # warm both variants
    dig[(name, False)] = run(name, False)
    dig[(name, True)] = run(name, True)
times: dict[tuple, list] = {(n, s): [] for n in OPS for s in (False, True)}
for rnd in range(int(os.environ.get("R12_ROUNDS", "4"))):
    for name in OPS:
        # alternate variant order per round: running B right after A of
        # the SAME query leaves B warmer (page cache/JIT) — a fixed
        # order biased no-op rows (x17/x40 read customer/events, not
        # documents) 0.05-0.16 s toward the second variant
        order = (False, True) if rnd % 2 == 0 else (True, False)
        for spread in order:
            spark.sparkContext.setJobDescription(
                f"cur {name} spread={spread}")
            t0 = time.monotonic()
            run(name, spread)
            times[(name, spread)].append(round(time.monotonic() - t0, 3))
cat._cache["documents"] = plain_docs
out = [f"sf_dir={sf_dir} load={os.getloadavg()[0]:.1f}"]
for name in OPS:
    a = min(times[(name, False)])
    b = min(times[(name, True)])
    same = (dig[(name, False)]["n"] == dig[(name, True)]["n"]
            and dig[(name, False)]["d"] == dig[(name, True)]["d"])
    out.append(f"{name}: plain={a} spread={b} delta={round(b - a, 3)} "
               f"digest_same={same} "
               f"samples_plain={times[(name, False)]} "
               f"samples_spread={times[(name, True)]}")
print("\n".join(out))
with open(os.environ.get("R12_OUT", "/tmp/r12_curation_ab.out"), "w") as fh:
    fh.write("\n".join(out) + "\n")
spark.stop()
