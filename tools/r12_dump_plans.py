"""Dump `.explain("formatted")` for declared queries into
plans/r12/<query>_<suffix>.txt.

Run once from the round-11 code (suffix `before`) and once from HEAD
(suffix `after`) so the judge can diff the claimed plan changes:

  cd /tmp/r11tree && python /root/repo/tools/r12_dump_plans.py before sf_dir q...
  cd /root/repo   && python /root/repo/tools/r12_dump_plans.py after  sf_dir q...

Always writes into the MAIN repo's plans/r12/ regardless of cwd.
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
names = sys.argv[3:]
out_dir = "/root/repo/plans/r12"
os.makedirs(out_dir, exist_ok=True)

spark = get_session(f"r12_plans_{suffix}")
spark.sparkContext.setLogLevel("ERROR")
queries = entrymod.queries()

sfx = f"_{os.path.basename(os.path.normpath(sf_dir))}" \
    if "testdata" not in sf_dir else ""

for name in names:
    df = queries[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}{sfx}.txt")
    with open(path, "w") as fh:
        fh.write(f"-- {name} ({suffix}: "
                 f"{'round-11 code' if suffix == 'before' else 'round-12 HEAD'})"
                 f"\n-- sf_dir: {sf_dir}\n\n")
        fh.write(buf.getvalue())
    print("wrote", path)

spark.stop()
