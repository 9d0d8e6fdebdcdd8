"""Dump `.explain("formatted")` for a set of declared queries into
plans/r11/<query>_<suffix>.txt.

Run once from the round-10 worktree (suffix `before`) and once from
HEAD (suffix `after`) so the judge can diff the claimed plan changes:

  cd /tmp/r10tree  && python /root/repo/tools/r11_dump_plans.py before
  cd /root/repo    && python /root/repo/tools/r11_dump_plans.py after

Always writes into the MAIN repo's plans/r11/ regardless of cwd.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

import __spark_entry__ as entrymod  # noqa: E402
from bi_etl_and_integration_spark import get_session  # noqa: E402

suffix = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
names = sys.argv[3:] or [
    "q14_mart_cte_cascade", "q47_lateral_topk",
    "x43_incremental_dedup", "x02_dedup_minhash",
    "x42_substring_dedup", "x34_semantic_dedup",
]
out_dir = "/root/repo/plans/r11"
os.makedirs(out_dir, exist_ok=True)

spark = get_session(f"r11_plans_{suffix}")
spark.sparkContext.setLogLevel("ERROR")
queries = entrymod.queries()

for name in names:
    df = queries[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(f"-- {name} ({suffix}: "
                 f"{'round-10 code' if suffix == 'before' else 'round-11 HEAD'})"
                 f"\n-- sf_dir: {sf_dir}\n\n")
        fh.write(buf.getvalue())
    print("wrote", path)

spark.stop()
