"""Plan-shape audit over the whole declared corpus: explain (never
execute) every ``queries()`` entry and tabulate Exchange / broadcast /
codegen-span counts plus scan pushdown facts.

Usage: python tools/explain_corpus.py [sf_dir] [--md > PLANS.md]

This is the review loop SURVEY.md §4 prescribes: after correctness,
iterate on the PLAN — a correct query that full-scans or shuffles
needlessly is a bug at 100 TB even though small-SF results match.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    as_md = "--md" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from bi_etl_and_integration_spark import get_session, plans
    from bi_etl_and_integration_spark.queries import QUERIES

    spark = get_session("explain-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name](spark, sf_dir)
            pushed = [p for p in plans.pushed_filters(df) if p.strip()]
            rows.append((name, plans.shuffle_count(df),
                         plans.broadcast_join_count(df),
                         len(plans.read_schemas(df)),
                         len(pushed),
                         "TakeOrderedAndProject" in plans.simple_plan(df)))
        except Exception as e:  # noqa: BLE001 — audit keeps going
            rows.append((name, "-", "-", "-", "-", str(e)[:40]))

    if as_md:
        print("| query | shuffles | broadcast joins | file scans | "
              "scans w/ pushed filters | top-k plan |")
        print("| --- | --- | --- | --- | --- | --- |")
        for r in rows:
            print("| " + " | ".join(str(x) for x in r) + " |")
    else:
        print(f"{'query':34} shfl bcast scan push topk")
        for name, sh, bc, sc, pf, tk in rows:
            print(f"{name:34} {sh!s:>4} {bc!s:>5} {sc!s:>4} {pf!s:>4} {tk}")
    spark.stop()


if __name__ == "__main__":
    main()
