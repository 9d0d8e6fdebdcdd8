"""Round-12 targeted probe: time a set of declared queries at
$SPARK_GRAFT_SF_DIR with the bench's consume() shape (count + xxhash64
digest), N interleaved rounds, min kept.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r12_probe.py q1 q2 ...
Env: R12_ROUNDS (default 3), R12_OUT (default /tmp/r12_probe.out)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bi_etl_and_integration_spark import get_session

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.bench_data/sf10")
names = sys.argv[1:]
rounds = int(os.environ.get("R12_ROUNDS", "3"))

spark = get_session("r12_probe")
spark.sparkContext.setLogLevel("ERROR")
queries = entrymod.queries()


def consume(df):
    cols = [F.col(c) for c in df.columns]
    return df.select(F.count(F.lit(1)).alias("n"),
                     F.bit_xor(F.xxhash64(*cols)).alias("d")).collect()[0]


from bi_etl_and_integration_spark.queries import prepare_session
prepare_session(spark, sf_dir)

times: dict[str, list[float]] = {n: [] for n in names}
digests: dict[str, tuple] = {}
for name in names:                       # warm (codegen+JIT), untimed
    spark.sparkContext.setJobDescription(f"warm {name}")
    r = consume(queries[name](spark, sf_dir))
    digests[name] = (r["n"], r["d"])
for i in range(rounds):
    for name in names:
        spark.sparkContext.setJobDescription(f"probe {name} r{i}")
        t0 = time.monotonic()
        consume(queries[name](spark, sf_dir))
        times[name].append(round(time.monotonic() - t0, 3))
    from bi_etl_and_integration_spark.queries import remark_session_caches
    spark.catalog.clearCache()
    remark_session_caches(spark)

out = [f"sf_dir={sf_dir} load={os.getloadavg()[0]:.1f}"]
for name in names:
    ts = times[name]
    out.append(f"{name}: min={min(ts)} samples={ts} "
               f"n={digests[name][0]} digest={digests[name][1]}")
print("\n".join(out))
with open(os.environ.get("R12_OUT", "/tmp/r12_probe.out"), "w") as fh:
    fh.write("\n".join(out) + "\n")
spark.stop()
