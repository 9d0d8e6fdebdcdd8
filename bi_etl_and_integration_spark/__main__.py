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
    args = ap.parse_args(argv)

    from bi_etl_and_integration_spark import get_session
    from bi_etl_and_integration_spark.pipeline import from_spec

    with open(args.spec) as fh:
        spec = json.load(fh)
    params = dict(kv.split("=", 1) for kv in args.param)
    pipe = from_spec(spec)
    spark = get_session(f"cli-{pipe.name}")
    ctx = pipe.run(spark, params=params, resume_from=args.resume_from)
    status = ctx.metrics.get("__status", {})
    print(json.dumps({"pipeline": pipe.name, "status": status,
                      "metrics": {k: v for k, v in ctx.metrics.items()
                                  if k != "__status"}}, default=str))
    return 0 if all(s in ("ok", "skipped", "not_run")
                    for s in status.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
