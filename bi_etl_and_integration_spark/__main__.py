"""CLI entry point — the ``DTExec`` analog (PRO/Глава 21:8-16):
execute a declarative pipeline spec from the command line with
parameter overrides, printing per-stage metrics as one JSON line.

    python -m bi_etl_and_integration_spark run-pipeline spec.json \
        --param rate=0.2 --resume-from publish
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bi_etl_and_integration_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser(
        "run-pipeline",
        help="execute a JSON pipeline spec (packages are data — "
             "load/parametrize/execute programmatically)")
    runp.add_argument("spec", help="path to the JSON spec (pipeline.from_spec shape)")
    runp.add_argument("--param", action="append", default=[], metavar="K=V",
                      help="pipeline variable override (repeatable)")
    runp.add_argument("--resume-from", default=None, metavar="STAGE",
                      help="phase-level restart: skip stages before STAGE")
    bf = sub.add_parser(
        "backfill",
        help="Airflow-style catch-up: run the spec once per period "
             "over [start, end), skipping marker-completed periods")
    bf.add_argument("spec", help="path to the JSON spec")
    bf.add_argument("--start", required=True, help="ISO start (inclusive)")
    bf.add_argument("--end", required=True, help="ISO end (exclusive)")
    bf.add_argument("--state-dir", required=True,
                    help="completion-marker directory")
    bf.add_argument("--grain", default="day",
                    choices=["hour", "day", "week"])
    bf.add_argument("--param", action="append", default=[], metavar="K=V")
    bf.add_argument("--keep-going", action="store_true",
                    help="continue past failed periods (they retry on "
                         "the next catch-up either way)")
    args = ap.parse_args(argv)

    from bi_etl_and_integration_spark import get_session
    from bi_etl_and_integration_spark.pipeline import backfill, from_spec

    with open(args.spec) as fh:
        spec = json.load(fh)
    params = dict(kv.split("=", 1) for kv in args.param)
    pipe = from_spec(spec)
    spark = get_session(f"cli-{pipe.name}")
    if args.cmd == "backfill":
        res = backfill(pipe, spark, start=args.start, end=args.end,
                       state_dir=args.state_dir, grain=args.grain,
                       params=params,
                       stop_on_failure=not args.keep_going)
        print(json.dumps({"pipeline": pipe.name, "periods": res}))
        return 0 if all(r["status"] != "failed" for r in res) else 1
    ctx = pipe.run(spark, params=params, resume_from=args.resume_from)
    status = ctx.metrics.get("__status", {})
    print(json.dumps({"pipeline": pipe.name, "status": status,
                      "metrics": {k: v for k, v in ctx.metrics.items()
                                  if k != "__status"}}, default=str))
    return 0 if all(s in ("ok", "skipped", "not_run")
                    for s in status.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
